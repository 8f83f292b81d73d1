"""ANN recall@10 at sf10 — the last approximate family without a
scale-measured curve (round-10 verdict #4: IVF/PQ/IVF-PQ recall was
tested at unit scale while the three near-dup families carry sf10
planted-pair curves).

Method: Q seeded query ids from the sf10 embedding corpus (200k vectors,
dim 64); ground truth = exact :func:`~esop_spark.operators.similarity.
ann_topk` top-10 per query (broadcast query × one corpus scan — cheap at
this scale, which is exactly why brute force is the baseline and the
index variants are the 100 TB path). Then each index family runs at its
DEFAULTS plus a sweep of its accuracy dial, and recall@10 = mean over
queries of |approx∩exact|/10:

- ``ivf_ann_topk``: n_probe ∈ {1, 2, 4, 8} at n_centroids=16 — the
  fraction-of-corpus-touched dial (sample centroids, the operator
  default; one kmeans-trained row shows what training buys).
- ``pq_ann_topk``: m ∈ {8, 16} codebooks (k=16, trained at max_iter=4) —
  the bytes-per-vector dial. PQ scans the WHOLE code relation (no cell
  pruning), so its recall ceiling is the code quantization alone.
- ``ivfpq_ann_topk``: n_probe ∈ {2, 4, 8} at the composed defaults —
  both dials at once, the FAISS-style deployment shape.

Seeded end-to-end; each row reports wall seconds for the approximate
query leg (index/codebook training reported separately — at 100 TB
training amortizes across every query, so conflating the two would
misprice the per-query cost).

Usage: python tools/ann_recall_probe.py [/root/repo/.scratch/sf10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esop_spark.operators import similarity
from esop_spark.session import get_spark

Q = 500
K = 10
SEED_STRIDE = 397  # co-prime stride over vec_ids: deterministic spread


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(exact: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    per_q = [
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ]
    return 100.0 * sum(per_q) / len(per_q)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    spark = get_spark("ann-recall-probe", console_progress=False)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    ids.sort()
    qids = [ids[(i * SEED_STRIDE) % len(ids)] for i in range(Q)]
    qids = sorted(set(qids))
    print(f"corpus {len(ids)} vectors; {len(qids)} queries; k={K}")

    t0 = time.perf_counter()
    exact = _topk_sets(similarity.ann_topk(emb, qids, k=K))
    t_exact = time.perf_counter() - t0
    print(f"exact ann_topk ground truth: {t_exact:.1f} s")

    print("| index | config | train (s) | query (s) | recall@10 |")
    print("|---|---|---|---|---|")

    def row(name, cfg, t_train, fn):
        t0 = time.perf_counter()
        got = _topk_sets(fn())
        wall = time.perf_counter() - t0
        print(f"| {name} | {cfg} | {t_train:.1f} | {wall:.1f} "
              f"| {_recall(exact, got):.1f}% |", flush=True)

    # IVF: sample centroids (operator default) across the n_probe dial
    for n_probe in (1, 2, 4, 8):
        row(
            "ivf", f"n_centroids=16 n_probe={n_probe} (sample)", 0.0,
            lambda np=n_probe: similarity.ivf_ann_topk(
                emb, qids, k=K, n_centroids=16, n_probe=np
            ),
        )
    # one trained row: what Lloyd's buys over the sample init
    t0 = time.perf_counter()
    cents = similarity.kmeans_centroids(emb, 16, max_iter=10)
    t_kmeans = time.perf_counter() - t0
    row(
        "ivf", "n_centroids=16 n_probe=4 (kmeans)", t_kmeans,
        lambda: similarity.ivf_ann_topk(
            emb, qids, k=K, n_centroids=16, n_probe=4, centroids=cents
        ),
    )

    # PQ: the bytes-per-vector dial (scans all codes; quantization-only)
    for m in (8, 16):
        t0 = time.perf_counter()
        books = similarity.pq_train(emb, m=m, k=16, max_iter=4)
        t_train = time.perf_counter() - t0
        row(
            "pq", f"m={m} k=16", t_train,
            lambda b=books: similarity.pq_ann_topk(emb, b, qids, k=K),
        )

    # IVF+PQ composed at defaults across n_probe
    t0 = time.perf_counter()
    books16 = similarity.pq_train(emb, m=16, k=16, max_iter=4)
    t_books = time.perf_counter() - t0
    for n_probe in (2, 4, 8):
        row(
            "ivfpq", f"n_centroids=16 n_probe={n_probe} m=16", t_books,
            lambda np=n_probe: similarity.ivfpq_ann_topk(
                emb, qids, k=K, n_centroids=16, n_probe=np, books=books16,
                m=16, pq_k=16,
            ),
        )


if __name__ == "__main__":
    main()
