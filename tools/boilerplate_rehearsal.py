"""Capped-Jaccard rehearsal on a BOILERPLATE-BEARING corpus — measures the
`max_df` branch in its intended regime, closing the round-8 verdict's note
that the committed q302 sf10 row (max_df=5, below the whole organic df range)
was the branch's degenerate WORST case, not its reason to exist.

Corpus: .scratch/sf10's 500k documents plus injected boilerplate blocks —
the license-header/template-footer shape of a real crawl:

- 3 HOT blocks (12 fresh words each → 10 block-internal 3-gram shingles),
  each appended to doc_id % 40 ∈ {0,1,2} → df ≈ 12,500, ABOVE the cap.
- 4 MILD blocks, appended to doc_id % 250 ∈ {11,12,13,14} (minus the docs
  already claimed by a hot block) → df ≈ 1,850, BELOW the cap — realistic
  mid-frequency boilerplate the cap must NOT touch.

Rehearsal: ngram_jaccard_pairs exact (max_df=None) vs capped (max_df=10⁴,
SCALE.md's documented safe ceiling) on that corpus. The candidate join costs
Σ_shingle df·(df−1)/2 rows; each hot block alone contributes 10 × 12.5k²/2
≈ 7.8e8, so the exact branch pays ~2.3e9 boilerplate candidate rows the cap
removes while every organic and mild shingle still enters the rare join
(opposite of the q302 max_df=5 regime, where 90% of mass went hot).
Candidate volumes are computed exactly by a cheap df aggregation — the same
arithmetic either branch's join performs — and printed next to the times.

Protocol: capped branch 1 untimed warmup + best-of-3 (the rehearse.py
protocol); exact branch a SINGLE timed trial (it is the multi-minute
quadratic demonstration — re-running it twice more buys no precision the
conclusion needs), flagged in the output.

Usage:
  python tools/boilerplate_rehearsal.py [gen|run|all]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esop_spark.operators.dedup import (
    ngram_jaccard_pairs,
    release_shared_relations,
    shingles,
)
from esop_spark.session import get_spark

SRC = "/root/repo/.scratch/sf10/documents.parquet"
OUT = "/root/repo/.scratch/sf10bp/documents.parquet"
MAX_DF = 10_000
TAU = 0.5  # JACCARD_TAU — same threshold as q23/q302

HOT_RESIDUES = (0, 1, 2)      # % 40  → df ≈ 12,500 each at 500k docs
MILD_RESIDUES = (11, 12, 13, 14)  # % 250 → df ≈ 1,850 each (hot wins ties)


def _block(tag: str) -> str:
    return " ".join(f"bp_{tag}_w{i:02d}" for i in range(12))


def generate(spark) -> None:
    docs = spark.read.parquet(SRC)
    suffix = F.lit(None).cast("string")
    for j, r in enumerate(MILD_RESIDUES):
        suffix = F.when(F.col("doc_id") % 250 == r, F.lit(_block(f"m{j}"))).otherwise(suffix)
    for j, r in enumerate(HOT_RESIDUES):  # hot wins: applied last, checked first
        suffix = F.when(F.col("doc_id") % 40 == r, F.lit(_block(f"h{j}"))).otherwise(suffix)
    out = docs.withColumn(
        "text",
        F.when(suffix.isNull(), F.col("text")).otherwise(
            F.concat_ws(" ", F.col("text"), suffix)
        ),
    ).withColumn("n_chars", F.length("text").cast(docs.schema["n_chars"].dataType))
    out.repartition(16).write.mode("overwrite").parquet(OUT)
    print(f"WROTE {OUT}")


def candidate_volume(spark, docs, max_df: int | None):
    """Σ_shingle df·(df−1)/2 over the shingles that enter the candidate
    join — exactly the join's row count, from one cheap aggregation."""
    df = (
        shingles(docs, 3, "text", "doc_id")
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if max_df is not None:
        df = df.filter(F.col("df") <= max_df)
    row = df.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("bigint").alias("cand"),
        F.count(F.lit(1)).alias("shingles"),
        F.max("df").alias("max_df"),
    ).first()
    return row["cand"], row["shingles"], row["max_df"]


def run(spark) -> None:
    docs = spark.read.parquet(OUT)
    n_docs = docs.count()
    vol_exact, sh_exact, peak = candidate_volume(spark, docs, None)
    vol_capped, sh_capped, _ = candidate_volume(spark, docs, MAX_DF)
    print(f"docs={n_docs}  peak_df={peak}")
    print(
        f"candidate join rows: exact={vol_exact:,} ({sh_exact:,} shingles) "
        f"capped(max_df={MAX_DF})={vol_capped:,} ({sh_capped:,} shingles) "
        f"shrink={vol_exact / vol_capped:.1f}x"
    )

    def reset():
        # bench.py's per-trial cache isolation: the capped branch's
        # shared_checkpoint relations must not leak across trials
        release_shared_relations()
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist(False)

    def timed(max_df, trials, warmup):
        q = lambda: ngram_jaccard_pairs(
            docs, n=3, threshold=TAU, max_df=max_df
        ).write.format("noop").mode("overwrite").save()
        if warmup:
            reset()
            q()
        ts = []
        for _ in range(trials):
            reset()
            t0 = time.perf_counter()
            q()
            ts.append(round(time.perf_counter() - t0, 1))
        return ts

    capped_ts = timed(MAX_DF, trials=3, warmup=True)
    print(f"capped(max_df={MAX_DF}): best-of-3 {min(capped_ts)}s trials={capped_ts}")
    exact_ts = timed(None, trials=1, warmup=False)
    print(f"exact(max_df=None): single trial {exact_ts[0]}s")
    print(
        f"| corpus | exact cand rows | capped cand rows | shrink | "
        f"exact (s) | capped best-of-3 (s) | speedup |"
    )
    print(
        f"| sf10+boilerplate | {vol_exact:,} | {vol_capped:,} | "
        f"{vol_exact / vol_capped:.1f}x | {exact_ts[0]} (1 trial) | "
        f"{min(capped_ts)} | {exact_ts[0] / min(capped_ts):.1f}x |"
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("boilerplate-rehearsal")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    if mode in ("gen", "all"):
        generate(spark)
    if mode in ("run", "all"):
        run(spark)


if __name__ == "__main__":
    main()
