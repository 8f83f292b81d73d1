"""applyInPandasWithState: per-key state survives micro-batches AND query
restarts (checkpoint-backed)."""

import os

from esop_spark.streaming.stateful import running_user_counts


def _run_batch(spark, src_dir, ckpt):
    # foreachBatch sink (memory sink can't recover from a checkpoint)
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema("user_id bigint, value double").parquet(src_dir)
    q = (
        running_user_counts(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["user_id"]: (r["total_events"], r["total_value"]) for r in rows}


def test_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 5.0)], "user_id bigint, value double"
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _run_batch(spark, src, ckpt)
    assert got1 == {1: (2, 3.0), 2: (1, 5.0)}

    # restart with new data: accumulators resume from checkpointed state
    spark.createDataFrame(
        [(1, 4.0), (3, 9.0)], "user_id bigint, value double"
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _run_batch(spark, src, ckpt)
    assert got2[1] == (3, 7.0)  # 2 prior events + 1 new, state carried over
    assert got2[3] == (1, 9.0)
