"""Streaming twins of the mergeable-sketch window monitors: q287's HLL
window merge and q290's histogram window percentile. Both keep bounded
per-key state (registers / bucket counts), survive checkpoint restarts, and
a full replay's final emission equals the batch operator's answer."""

import os

from pyspark.sql import functions as F

from esop_spark.operators import analytics
from esop_spark.streaming.stateful import (
    histogram_window_stream,
    hll_window_stream,
)

WINDOW_DAYS = 7
DAY0 = 20_000  # epoch day


def _events(spark, rows):
    """rows: (day_offset, user_id, value)"""
    return spark.createDataFrame(
        [(DAY0 + d, str(u), float(v)) for d, u, v in rows],
        "day bigint, user_id string, value double",
    ).select(
        F.timestamp_seconds(F.col("day") * 86400 + 3600).alias("ts"),
        "user_id",
        "value",
    )


def _expand_hll(events):
    """The batch leg's cover-explode, applied stream-side: each (day, user)
    observation serves WINDOW_DAYS trailing windows."""
    day = F.expr("unix_timestamp(ts) div 86400").cast("bigint")
    return events.select(
        F.explode(
            F.sequence(day, day + (WINDOW_DAYS - 1))
        ).alias("wd"),
        F.col("user_id").cast("string").alias("u"),
    )


def _expand_hist(events, bucket_cents=500):
    day = F.expr("unix_timestamp(ts) div 86400").cast("bigint")
    return events.select(
        F.explode(
            F.sequence(day, day + (WINDOW_DAYS - 1))
        ).alias("wd"),
        F.expr(
            f"cast(round(value * 100) as bigint) div {bucket_cents}"
        ).alias("b"),
    )


def _drain(spark, make_stream, src, ckpt, schema):
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        make_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    return rows


ROWS = [
    # (day_offset, user, value): overlapping users across days, a skewed
    # value mix so p50 and p95 land in different buckets
    (0, 1, 3.0), (0, 2, 7.5), (0, 3, 12.0),
    (1, 1, 4.0), (1, 4, 55.0), (1, 5, 9.9),
    (2, 2, 6.1), (2, 6, 88.0), (2, 7, 14.2),
    (3, 1, 5.0), (3, 8, 33.3),
    (5, 9, 61.0), (5, 1, 2.2), (5, 10, 18.0),
    (8, 11, 41.0), (8, 2, 3.3),
]


def test_hll_window_stream_replay_equals_batch(spark, tmp_path):
    events = _events(spark, ROWS)
    batch = {
        r["day"]: r
        for r in analytics.hll_window_merge(events, WINDOW_DAYS).collect()
    }
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _expand_hll(events).coalesce(1).write.mode("overwrite").parquet(src)
    out = _drain(
        spark, hll_window_stream, src, ckpt, "wd bigint, u string"
    )
    last = {r["wd"]: r for r in out}  # update mode: keep final emission
    for day, b in batch.items():
        assert day in last
        # registers are integer-identical; only the final 6dp rounding mode
        # can differ between engines
        assert abs(last[day]["hll_est"] - b["hll_est"]) <= 2e-6


def test_hll_window_stream_state_survives_restart(spark, tmp_path):
    events = _events(spark, ROWS)
    batch = {
        r["day"]: r
        for r in analytics.hll_window_merge(events, WINDOW_DAYS).collect()
    }
    first = _events(spark, ROWS[:8])
    second = _events(spark, ROWS[8:])
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _expand_hll(first).coalesce(1).write.mode("overwrite").parquet(src)
    _drain(spark, hll_window_stream, src, ckpt, "wd bigint, u string")
    # restart with the remainder: registers must resume, not rebuild
    _expand_hll(second).coalesce(1).write.mode("append").parquet(src)
    out = _drain(
        spark, hll_window_stream, src, ckpt, "wd bigint, u string"
    )
    last = {r["wd"]: r for r in out}
    for day, b in batch.items():
        # days whose registers changed in the second half re-emit; days
        # fully covered by the first half don't (update mode) — check the
        # re-emitted ones against batch
        if day in last:
            assert abs(last[day]["hll_est"] - b["hll_est"]) <= 2e-6
    # the state-survival proof: wd DAY0+5 is served by BOTH halves (day-0..3
    # observations cover it forward; day-5 observations land on it), and the
    # day-5 arrivals force it to re-emit in the second drain. Its estimate
    # can only equal the full-data batch value if the first half's
    # registers were resumed from the checkpoint, not rebuilt.
    assert DAY0 + 5 in last
    assert abs(last[DAY0 + 5]["hll_est"] - batch[DAY0 + 5]["hll_est"]) <= 2e-6
    second_only = {
        r["day"]: r
        for r in analytics.hll_window_merge(second, WINDOW_DAYS).collect()
    }
    # guard the proof itself: the second half ALONE estimates wd+5
    # differently, so the equality above cannot hold without carried state
    assert (
        abs(second_only[DAY0 + 5]["hll_est"] - batch[DAY0 + 5]["hll_est"])
        > 2e-6
    )


def test_histogram_window_stream_replay_equals_batch(spark, tmp_path):
    events = _events(spark, ROWS)
    batch = {
        (r["day"], r["q_milli"]): r
        for r in analytics.histogram_window_pctile(
            events, WINDOW_DAYS, bucket_cents=500, q_millis=(500, 950)
        ).collect()
    }
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _expand_hist(events).coalesce(1).write.mode("overwrite").parquet(src)
    out = _drain(
        spark,
        lambda s: histogram_window_stream(
            s, bucket_cents=500, q_millis=(500, 950)
        ),
        src,
        ckpt,
        "wd bigint, b bigint",
    )
    last = {(r["wd"], r["q_milli"]): r for r in out}
    for key, b in batch.items():
        assert key in last
        assert last[key]["pctile_cents"] == b["pctile_cents"]  # exact ints
        assert last[key]["n_rows"] == b["n_rows"]


def test_histogram_window_stream_state_survives_restart(spark, tmp_path):
    events = _events(spark, ROWS)
    batch = {
        (r["day"], r["q_milli"]): r
        for r in analytics.histogram_window_pctile(
            events, WINDOW_DAYS, bucket_cents=500, q_millis=(500, 950)
        ).collect()
    }
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _expand_hist(_events(spark, ROWS[:8])).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    mk = lambda s: histogram_window_stream(  # noqa: E731
        s, bucket_cents=500, q_millis=(500, 950)
    )
    _drain(spark, mk, src, ckpt, "wd bigint, b bigint")
    _expand_hist(_events(spark, ROWS[8:])).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out = _drain(spark, mk, src, ckpt, "wd bigint, b bigint")
    last = {(r["wd"], r["q_milli"]): r for r in out}
    assert last  # the second half re-emitted its window keys
    for key, r in last.items():
        if key in batch:  # replayed keys must equal the full-data batch
            assert r["pctile_cents"] == batch[key]["pctile_cents"]
            assert r["n_rows"] == batch[key]["n_rows"]
    # state-survival proof: wd DAY0+5 receives bucket counts from BOTH
    # halves and re-emits in the second drain; n_rows equal to the
    # full-data batch total is only possible if the first half's histogram
    # was resumed from the checkpoint (the second half alone contributes
    # strictly fewer observations to that window)
    key5 = (DAY0 + 5, 500)
    assert key5 in last
    assert last[key5]["n_rows"] == batch[key5]["n_rows"]
    second_only = {
        (r["day"], r["q_milli"]): r
        for r in analytics.histogram_window_pctile(
            _events(spark, ROWS[8:]), WINDOW_DAYS, bucket_cents=500,
            q_millis=(500, 950),
        ).collect()
    }
    assert second_only[key5]["n_rows"] < batch[key5]["n_rows"]
