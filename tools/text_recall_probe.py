"""Planted near-dup RECALL for the TEXT MinHash-LSH family at sf10 —
the q22 analogue of tools/recall_probe.py (which measures the cosine
family). The operator's recall claim (false-negative rate set by
bands/rows-per-band: 1 − (1 − j^rows)^bands, ≈0.40 at j = 0.5 rising to
≈0.99+ at j ≥ 0.8 with the 8×4 default) plus the hot-bucket anchor-star
cap are otherwise math + small-scale tests; this measures them on the
real 500k-doc corpus.

Method: take K well-formed base documents from .scratch/sf10, build one
perturbed copy each (seeded per-word replacement at rates swept over
[2%, 30%], spreading exact 3-gram-shingle Jaccard across ~[0.4, 0.97]),
union at ids +PLANT_STRIDE, run ``dedup.minhash_lsh_pairs`` at the q22
defaults (xxhash64 family, threshold 0.5), and report planted-pair
recall by EXACT-Jaccard bin (ground truth computed from the shingle
relation restricted to the planted ids). Pairs below the 0.5 threshold
are excluded from recall (the operator's contract filters them).

Seeded end-to-end. Wall ~2-4 min at sf10.

``--streamed`` (round-10 verdict #5) closes the loop on "the streaming
surface has batch semantics" with the same evidence standard: the SAME
planted corpus is replayed through ``lsh_compacted_query`` (8 parquet
files → 8 micro-batches via maxFilesPerTrigger=1), the emitted candidate
pair log is exact-Jaccard-verified with the operator's own
``_verify_jaccard`` tail, and the recall-by-bin table prints for BOTH
legs. Candidate-set equality with the batch operator is already
parity-tested; this makes the end-to-end recall a measurement, not an
inference.

Usage: python tools/text_recall_probe.py [/root/repo/.scratch/sf10] [--streamed]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esop_spark.operators import dedup
from esop_spark.session import get_spark

PLANT_STRIDE = 10**12
K = 400
SEED = 20260817
TAU = 0.5  # q22's JACCARD_TAU


def _streamed_verified_pairs(spark, corpus) -> set[tuple[int, int]]:
    """Replay the corpus through the compacted LSH stream, then verify
    the candidate log with the batch operator's own exact-Jaccard tail."""
    import tempfile

    from esop_spark.streaming.dedup_stream import lsh_compacted_query

    tmp = tempfile.mkdtemp(prefix="text-recall-stream-")
    src = os.path.join(tmp, "src")
    corpus.repartition(8).write.parquet(src)
    pairs_dir = os.path.join(tmp, "pairs")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = lsh_compacted_query(
        stream, pairs_dir, os.path.join(tmp, "state"), os.path.join(tmp, "ckpt")
    )
    assert q.awaitTermination(1800), "compacted stream did not terminate"
    cands = (
        spark.read.parquet(pairs_dir).select("id_a", "id_b").distinct()
    )
    sh = dedup.shingles(corpus, 3).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    counts = dedup.doc_shingle_counts(corpus, 3)
    return {
        (r["id_a"], r["id_b"])
        for r in dedup._verify_jaccard(cands, sh, counts, TAU, "doc_id")
        .select("id_a", "id_b")
        .collect()
    }


def _report(leg: str, eligible, got) -> None:
    bins = [(0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 1.01)]
    tot_n = tot_hit = 0
    for lo, hi in bins:
        sel = [p for p, j in eligible.items() if lo <= j < hi]
        hit = sum(1 for p in sel if p in got)
        tot_n += len(sel)
        tot_hit += hit
        pct = 100.0 * hit / len(sel) if sel else float("nan")
        print(f"  [{leg}] jaccard [{lo:.1f},{hi:.1f}): {hit}/{len(sel)} = {pct:.1f}%")
    print(f"[{leg}] overall recall at jaccard >= {TAU}: {tot_hit}/{tot_n} = "
          f"{100.0 * tot_hit / tot_n:.1f}%")
    nd = [p for p, j in eligible.items() if j >= 0.8]
    nd_hit = sum(1 for p in nd if p in got)
    print(f"[{leg}] near-dup regime (jaccard >= 0.8): {nd_hit}/{len(nd)} = "
          f"{100.0 * nd_hit / len(nd):.1f}%")
    print(f"[{leg}] total verified output pairs at tau={TAU}: {len(got)}")


def main() -> None:
    streamed = "--streamed" in sys.argv[1:]
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/repo/.scratch/sf10"
    spark = get_spark("text-recall-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    bases = (
        docs.filter(F.size(F.split("text", " ")) >= 30)
        .orderBy("doc_id")
        .limit(K)
        .select("doc_id", "text")
        .collect()
    )
    rnd = random.Random(SEED)
    planted = []
    for i, row in enumerate(bases):
        words = row["text"].split(" ")
        rate = rnd.uniform(0.02, 0.30)
        mutated = [
            f"zq{i}x{j}" if rnd.random() < rate else w
            for j, w in enumerate(words)
        ]
        planted.append((row["doc_id"] + PLANT_STRIDE, " ".join(mutated)))
    plant_df = spark.createDataFrame(planted, "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(plant_df)

    # ground truth: exact 3-gram Jaccard of each (base, copy) pair from
    # the shingle relation restricted to the 2K involved ids
    ids = [r["doc_id"] for r in bases]
    sub = corpus.filter(
        F.col("doc_id").isin(ids + [i + PLANT_STRIDE for i in ids])
    )
    sh = dedup.shingles(sub, 3).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(
        (F.col("doc_id") - PLANT_STRIDE).alias("id_a"),
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("shb"),
    )
    shared = (
        a.join(b.select("id_a", "id_b").distinct(), "id_a")
        .join(
            b.select("id_b", "shb"),
            "id_b",
        )
        .filter(F.col("sh") == F.col("shb"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("sh").alias("inter"))
    )
    counts = dedup.doc_shingle_counts(sub, 3).select(
        "doc_id", F.col("n_sh")
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    truth = {
        (r["id_a"], r["id_b"]): r["inter"] / (r["na"] + r["nb"] - r["inter"])
        for r in shared.join(ca, "id_a").join(cb, "id_b").collect()
    }

    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(corpus, threshold=TAU)
        .select("id_a", "id_b")
        .collect()
    }
    eligible = {p: j for p, j in truth.items() if j >= TAU}
    print(f"planted pairs: {len(truth)}; exact jaccard >= {TAU}: {len(eligible)}")
    _report("batch", eligible, got)
    if streamed:
        got_s = _streamed_verified_pairs(spark, corpus)
        _report("streamed", eligible, got_s)
        same = got == got_s
        print(f"streamed verified set == batch verified set: {same}")


if __name__ == "__main__":
    main()
