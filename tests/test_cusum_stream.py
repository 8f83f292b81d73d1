"""Streaming CUSUM: two-bigint state reproduces the batch recursion and
survives checkpoint restarts."""

import os

from esop_spark.streaming.stateful import cusum_stream


SCHEMA = "series_key string, value_milli bigint"


def _run(spark, src_dir, ckpt, baseline, threshold):
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        cusum_stream(stream, baseline, threshold)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    return {r["series_key"]: r for r in rows}


def test_cusum_stream_matches_batch_recursion(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    # series: values 1000,1000,5000,5000 with baseline 2000:
    # P: -1000,-2000,+1000,+4000 ; minP=-2000 -> S=6000
    spark.createDataFrame(
        [("a", 1000), ("a", 1000), ("a", 5000), ("a", 5000)], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    out = _run(spark, src, ckpt, baseline=2000, threshold=5000)
    assert out["a"]["s_milli"] == 6000
    assert out["a"]["flagged"] == 1


def test_cusum_stream_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [("a", 3000), ("a", 3000)], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    out1 = _run(spark, src, ckpt, baseline=2000, threshold=99_000)
    assert out1["a"]["s_milli"] == 2000
    # second file arrives; restarted query must resume, not recount
    spark.createDataFrame(
        [("a", 3000)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    out2 = _run(spark, src, ckpt, baseline=2000, threshold=99_000)
    assert out2["a"]["n_obs"] == 3
    assert out2["a"]["s_milli"] == 3000
    assert out2["a"]["flagged"] == 0
