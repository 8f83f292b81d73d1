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
    assert q.awaitTermination(120), "stream did not terminate"
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


def _run_funnel(spark, src_dir, ckpt, stages):
    from esop_spark.streaming.stateful import funnel_stages_stream

    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).parquet(src_dir)
    q = (
        funnel_stages_stream(stream, stages)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    return {r["user_id"]: r["stage_reached"] for r in rows}


def test_streaming_funnel_advances_across_restarts(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "fsrc")
    ckpt = str(tmp_path / "fckpt")
    os.makedirs(src)

    def ts(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    # batch 1: user 1 does a; user 2 does b (out of order -> no advance)
    spark.createDataFrame(
        [(0, ts(0), 1, "a"), (1, ts(0), 2, "b")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _run_funnel(spark, src, ckpt, ("a", "b"))
    assert got1 == {1: 1, 2: 0}

    # restart: user 1 completes b (state resumed from checkpoint); user 2's
    # a starts their funnel
    spark.createDataFrame(
        [(2, ts(5), 1, "b"), (3, ts(5), 2, "a")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _run_funnel(spark, src, ckpt, ("a", "b"))
    assert got2[1] == 2
    assert got2[2] == 1


def test_streaming_pmc_matches_batch_semantics(spark, tmp_path):
    import datetime as dt

    from esop_spark.streaming.stateful import pmc_segments_stream

    src = str(tmp_path / "psrc")
    ckpt = str(tmp_path / "pckpt")
    os.makedirs(src)

    def ts(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    schema = "event_id bigint, ts timestamp, user_id bigint, value double"
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            pmc_segments_stream(stream, eps=2.0)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"

    # batch 1: values 0,1,2 -> one segment
    spark.createDataFrame(
        [(i, ts(i), 1, float(i)) for i in range(3)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    assert {(r["user_id"], r["n_points"], r["n_segments"]) for r in rows} == {(1, 3, 1)}

    # restart: jump to 100 then 101 -> second segment, state carried over
    rows.clear()
    spark.createDataFrame(
        [(3, ts(10), 1, 100.0), (4, ts(11), 1, 101.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    assert {(r["user_id"], r["n_points"], r["n_segments"]) for r in rows} == {(1, 5, 2)}


def _run_hh(spark, src_dir, ckpt):
    from esop_spark.streaming.stateful import heavy_hitter_alerts

    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema("event_id bigint, event_type string").parquet(
        src_dir
    )
    q = (
        heavy_hitter_alerts(stream, min_emit=4)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    return [(r["event_type"], r["threshold"]) for r in rows]


def test_heavy_hitter_alerts_fire_once_across_restart(spark, tmp_path):
    src = str(tmp_path / "hh_src")
    ckpt = str(tmp_path / "hh_ckpt")
    os.makedirs(src)

    # batch 1: 5 'a' events (crosses 4), 2 'b' events (no alert)
    spark.createDataFrame(
        [(i, "a") for i in range(5)] + [(10, "b"), (11, "b")],
        "event_id bigint, event_type string",
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _run_hh(spark, src, ckpt)
    assert got1 == [("a", 4)]

    # restart: +6 'a' (total 11 -> crosses 8), +3 'b' (total 5 -> crosses 4);
    # the 4-threshold for 'a' must NOT re-fire
    spark.createDataFrame(
        [(20 + i, "a") for i in range(6)] + [(30 + i, "b") for i in range(3)],
        "event_id bigint, event_type string",
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = sorted(_run_hh(spark, src, ckpt))
    assert got2 == [("a", 8), ("b", 4)]
