"""Streaming shard packer: checkpoint-restart must reproduce the batch
packer's shard ids exactly (splits.pack_shards is the oracle)."""

import os

from pyspark.sql import functions as F

from esop_spark.operators import splits
from esop_spark.streaming.shard_stream import pack_shards_stream

BUDGET = 100


def _docs(i0, i1):
    # token counts 1..60 cycling — several docs straddle the 100 grid
    return [(i, 1 + (i * 37) % 60) for i in range(i0, i1)]


def _run_stream(spark, src, ckpt):
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema("doc_id bigint, n_tokens bigint").parquet(src)
    q = (
        pack_shards_stream(stream, BUDGET)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    return {r["doc_id"]: r["shard_id"] for r in rows}


def test_stream_matches_batch_across_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: docs 0..39 (one file)
    spark.createDataFrame(_docs(0, 40), "doc_id bigint, n_tokens bigint").coalesce(
        1
    ).write.mode("append").parquet(src)
    got = _run_stream(spark, src, ckpt)
    assert len(got) == 40

    # restart with docs 40..80 appended: the cursor resumes from checkpoint
    spark.createDataFrame(_docs(40, 80), "doc_id bigint, n_tokens bigint").coalesce(
        1
    ).write.mode("append").parquet(src)
    got.update(_run_stream(spark, src, ckpt))
    assert len(got) == 80

    batch = spark.createDataFrame(_docs(0, 80), "doc_id bigint, n_tokens bigint")
    want = {
        r["doc_id"]: r["shard_id"]
        for r in splits.pack_shards(batch, "doc_id", "n_tokens", BUDGET).collect()
    }
    assert got == want


def test_stream_lanes_pack_independently(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = [("en", i, 60) for i in range(4)] + [("fr", i, 60) for i in range(4)]
    spark.createDataFrame(
        rows, "lang string, doc_id bigint, n_tokens bigint"
    ).coalesce(1).write.mode("append").parquet(src)

    out: list = []

    def sink(batch_df, _bid):
        out.extend(batch_df.collect())

    stream = spark.readStream.schema(
        "lang string, doc_id bigint, n_tokens bigint"
    ).parquet(src)
    q = (
        pack_shards_stream(stream, BUDGET, group_col="lang")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    got = {(r["lang"], r["doc_id"]): r["shard_id"] for r in out}
    # 60-token docs on a 100 budget: cum 0,60,120,180 → shards 0,0,1,1 per lane
    for lang in ("en", "fr"):
        assert [got[(lang, i)] for i in range(4)] == [0, 0, 1, 1]
