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

Usage: python tools/recall_probe.py [/root/repo/.scratch/sf10]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    spark = get_spark("recall-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])

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
    plant_df = spark.createDataFrame(
        [(c, [float(x) for x in w]) for c, w in planted_rows],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(plant_df)

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
    bins = [(0.80, 0.85), (0.85, 0.90), (0.90, 0.95), (0.95, 1.01)]
    print(f"planted pairs with exact cosine >= 0.8: "
          f"{sum(1 for _, _, c in truth if c >= 0.8)} of {K}")
    tot_n = tot_hit = 0
    for lo, hi in bins:
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
