"""Planted near-dup RECALL under hot-bucket splitting (round-9 verdict #1).

The q301 redesign's survival claim — true near-duplicates (cosine ≥ 0.8)
survive deep bucket splits at high probability while weak pairs wash out —
was per-plane math (1 − θ/π multiplicative per extra plane) plus
small-scale unit tests. This probe MEASURES it at the scale that forces
deep splits: the .scratch/sf10 embedding corpus (200k vectors, every 8×3
band-bucket ~25k members → ~7 split levels to reach max_bucket=200).

Method: plant K perturbed copies of existing sf10 vectors (new ids at
+PLANT_STRIDE, perturbation σ swept so true cosines spread over
[~0.8, ~0.98]), run ``cosine_pairs_lsh`` at DEFAULTS (the exact q301
configuration), and report recall of the planted (base, copy) pairs whose
exact cosine ≥ 0.8, bucketed by cosine bin. Also reports the split
convergence depth the corpus actually induced (len(parts) − 1 from
``_split_hot_buckets``).

Seeded end-to-end — same plant set every run. Wall time ~4 min at sf10:
the split-depth diagnostic runs the banding+split pipeline once, then
``cosine_pairs_lsh`` re-runs it internally for the recall leg (the
operator does not expose its convergence depth); the diagnostic's
shared DISK_ONLY checkpoints are released before the second run.

``--bands-sweep`` (round-10 verdict #3) turns the documented remedy for
the [0.80, 0.85) recall floor — "more bands (linear cost), not a bigger
cap (quadratic)" — from formula into a measured curve: the SAME planted
corpus through ``cosine_pairs_lsh`` at bands ∈ {8, 12, 16} (band_planes
3), reporting per-point recall-by-bin, wall time, the candidate join
volume Σ C(bucket, 2) + star edges (the quantity that actually scales
the equi-join), and the induced split depth — so the recall payoff and
the claimed-linear cost land in one table.

Usage: python tools/recall_probe.py [/root/repo/.scratch/sf10] [--bands-sweep]
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esop_spark.operators import similarity
from esop_spark.session import get_spark

PLANT_STRIDE = 10**12  # clear of sf10 (1e8-stride) and sf100emb (1e10) ids
K = 500
SEED = 20260816


def _plant(emb, dim):
    """Seeded planted copies: (corpus, truth) — shared by both modes."""
    bases = (
        emb.orderBy("vec_id").limit(K).select("vec_id", "embedding").collect()
    )
    rnd = random.Random(SEED)
    planted_rows = []
    truth = []  # (base_id, copy_id, exact_cosine)
    for row in bases:
        v = [float(x) for x in row["embedding"]]
        nv = math.sqrt(sum(x * x for x in v))
        sigma = rnd.uniform(0.15, 0.75)  # cos ≈ 1/sqrt(1+σ²): ~0.80–0.99
        g = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
        w = [x + sigma * nv / math.sqrt(dim) * gj for x, gj in zip(v, g)]
        nw = math.sqrt(sum(x * x for x in w))
        cos = sum(a * b for a, b in zip(v, w)) / (nv * nw)
        cid = row["vec_id"] + PLANT_STRIDE
        planted_rows.append((cid, w))
        truth.append((row["vec_id"], cid, cos))
    return planted_rows, truth


BINS = [(0.80, 0.85), (0.85, 0.90), (0.90, 0.95), (0.95, 1.01)]


def _recall_by_bin(truth, got) -> list[str]:
    cells = []
    tot_n = tot_hit = 0
    for lo, hi in BINS:
        sel = [(a, b) for a, b, c in truth if lo <= c < hi]
        hit = sum(1 for p in sel if p in got)
        tot_n += len(sel)
        tot_hit += hit
        pct = 100.0 * hit / len(sel) if sel else float("nan")
        cells.append(f"{pct:.1f}% ({hit}/{len(sel)})")
    cells.append(f"{100.0 * tot_hit / tot_n:.1f}% ({tot_hit}/{tot_n})")
    return cells


def _bands_sweep(spark, corpus, truth, dim) -> None:
    """Measure the bands-vs-recall/cost curve on the planted corpus."""
    import time

    from esop_spark.operators.dedup import release_shared_relations

    print("| bands | split depth | join volume | wall (s) | "
          + " | ".join(f"[{lo:.2f},{hi:.2f})" for lo, hi in BINS)
          + " | overall ≥0.8 |")
    print("|" + "---|" * (4 + len(BINS) + 1))
    for bands in (8, 12, 16):
        bb = similarity.banded_semantic_buckets(
            corpus, bands, 3, dim, "hp", "embedding", "vec_id"
        )
        parts, residual = similarity._split_hot_buckets(
            bb, corpus, bands, 3, dim, "hp", "embedding", "vec_id", 200, 16
        )
        depth = len(parts) - 1
        # candidate join volume: Σ C(n,2) over every exit-level bucket,
        # plus n−1 anchor-star edges per residual blob group
        vol = 0
        for p in parts:
            row = (
                p.groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("v"))
                .first()
            )
            vol += int(row["v"] or 0)
        if residual is not None:
            row = (
                residual.groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.sum(F.expr("n - 1")).alias("v"))
                .first()
            )
            vol += int(row["v"] or 0)
        release_shared_relations()
        t0 = time.perf_counter()
        pairs = similarity.cosine_pairs_lsh(
            corpus, threshold=0.8, bands=bands, dim=dim
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in pairs.select("id_a", "id_b").collect()
        }
        wall = time.perf_counter() - t0
        release_shared_relations()
        cells = _recall_by_bin(truth, got)
        print(f"| {bands} | {depth} | {vol} | {wall:.1f} | "
              + " | ".join(cells) + " |", flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sweep = "--bands-sweep" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/repo/.scratch/sf10"
    spark = get_spark("recall-probe", console_progress=False)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])

    planted_rows, truth = _plant(emb, dim)
    plant_df = spark.createDataFrame(
        [(c, [float(x) for x in w]) for c, w in planted_rows],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(plant_df)

    if sweep:
        _bands_sweep(spark, corpus, truth, dim)
        return
    _single(spark, corpus, truth, dim)


def _single(spark, corpus, truth, dim) -> None:
    # diagnostic: the split depth this corpus actually induces
    bb = similarity.banded_semantic_buckets(
        corpus, 8, 3, dim, "hp", "embedding", "vec_id"
    )
    parts, residual = similarity._split_hot_buckets(
        bb, corpus, 8, 3, dim, "hp", "embedding", "vec_id", 200, 16
    )
    depth = len(parts) - 1
    print(f"split convergence depth: {depth} (residual={'yes' if residual is not None else 'no'})")
    from esop_spark.operators.dedup import release_shared_relations

    release_shared_relations()  # drop the diagnostic's DISK_ONLY checkpoints

    pairs = similarity.cosine_pairs_lsh(corpus, threshold=0.8, dim=dim)
    got = {
        (r["id_a"], r["id_b"])
        for r in pairs.select("id_a", "id_b").collect()
    }
    print(f"planted pairs with exact cosine >= 0.8: "
          f"{sum(1 for _, _, c in truth if c >= 0.8)} of {K}")
    tot_n = tot_hit = 0
    for lo, hi in BINS:
        sel = [(a, b) for a, b, c in truth if lo <= c < hi]
        hit = sum(1 for p in sel if p in got)
        tot_n += len(sel)
        tot_hit += hit
        pct = 100.0 * hit / len(sel) if sel else float("nan")
        print(f"  cosine [{lo:.2f},{hi:.2f}): {hit}/{len(sel)} = {pct:.1f}%")
    print(f"overall recall at cosine >= 0.8: {tot_hit}/{tot_n} = "
          f"{100.0 * tot_hit / tot_n:.1f}%")
    print(f"total output pairs at tau=0.8: {len(got)}")


if __name__ == "__main__":
    main()
