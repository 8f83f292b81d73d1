"""Streaming MinHash-LSH candidates: projection signature == batch
aggregation, replay == batch candidate set, hot-bucket cap bounds state and
output, checkpoint restart resumes bucket membership."""

import os

from pyspark.sql import functions as F

from esop_spark.operators import dedup
from esop_spark.operators.dedup import _lsh_candidates, with_minhash_signature
from esop_spark.streaming.dedup_stream import lsh_candidate_stream

SCHEMA = "doc_id long, text string"


def _corpus(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(59)) + " zzz"
    near2 = " ".join(f"w{i}" for i in range(58)) + " yyy xxx"
    far = " ".join(f"v{i}" for i in range(60))
    tiny = "one two"  # < n words -> no shingles -> no buckets
    return spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, near2), (4, tiny)], SCHEMA
    )


def test_projection_signature_equals_batch_aggregation(spark):
    docs = _corpus(spark)
    for family in ("xxhash64", "md5"):
        agg = {
            r["doc_id"]: r
            for r in dedup.minhash_signatures(
                docs, num_hashes=16, hash_family=family
            ).collect()
        }
        proj = {
            r["doc_id"]: r
            for r in with_minhash_signature(
                docs, num_hashes=16, hash_family=family
            ).collect()
        }
        assert set(agg) == set(proj)  # tiny doc absent from both
        for did, row in agg.items():
            for i in range(16):
                assert row[f"h{i}"] == proj[did][f"h{i}"], (family, did, i)


def _drain(spark, src, ckpt, **kw):
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        lsh_candidate_stream(stream, **kw)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def _batch_pairs(docs, **kw):
    cands, base = _lsh_candidates(
        docs,
        num_hashes=kw.get("num_hashes", 32),
        bands=kw.get("bands", 8),
        n=kw.get("n", 3),
        text_col="text",
        id_col="doc_id",
        hash_family=kw.get("hash_family", "xxhash64"),
        max_bucket=kw.get("max_bucket", 100),
    )
    out = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    base.unpersist()
    return out


def test_replay_equals_batch_candidates(spark, tmp_path):
    docs = _corpus(spark)
    expect = _batch_pairs(docs)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    rows = _drain(spark, src, ckpt)
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == expect
    assert expect  # the planted near-dups produced at least one candidate


def test_incremental_arrival_and_restart(spark, tmp_path):
    docs = _corpus(spark)
    expect = _batch_pairs(docs)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    docs.filter(F.col("doc_id") <= 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    first = _drain(spark, src, ckpt)
    # restart: the remaining docs arrive; bucket membership must resume
    # from the checkpoint (doc 3's pairs against docs 0/1 only exist if
    # the state survived)
    docs.filter(F.col("doc_id") >= 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = _drain(spark, src, ckpt)
    got = {(r["id_a"], r["id_b"]) for r in first + second}
    assert got == expect
    assert any(a in (0, 1) and b == 3 for a, b in got)


def test_hot_bucket_caps_state_and_output(spark, tmp_path):
    text = " ".join(f"b{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, text) for i in range(12)], SCHEMA
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    rows = _drain(spark, src, ckpt, max_bucket=5)
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    # star pairing: one anchor edge per non-anchor member, NOT 12·11/2
    assert pairs == {(0, i) for i in range(1, 12)}
    # arrivals after the cap still attach to the cluster through the anchor
    late = spark.createDataFrame([(99, text)], SCHEMA)
    late.coalesce(1).write.mode("append").parquet(src)
    rows2 = _drain(spark, src, ckpt, max_bucket=5)
    assert {(r["id_a"], r["id_b"]) for r in rows2} == {(0, 99)}
