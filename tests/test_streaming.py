"""Structured Streaming tests: commit-log archiving exactly-once behavior and
event-time windows through a memory sink."""

import os

from pyspark.sql import functions as F

from esop_spark.operators.commitlog import commitlog_window
from esop_spark.streaming import commitlog_stream, event_stream


def _write_segment(d, name, content, mtime_s):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write(content)
    os.utime(p, (mtime_s, mtime_s))
    return p


def test_commitlog_archive_stream_and_pit_window(spark, tmp_path):
    src = tmp_path / "cl"
    bucket = tmp_path / "bucket"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    for i in range(5):
        _write_segment(str(src), f"CommitLog-7-{100 + i}.log", f"seg{i}", 1000 + i)

    q = commitlog_stream.archive_commitlogs(
        spark, str(src), str(bucket), str(ckpt), available_now=True
    )
    assert q.awaitTermination(120), "stream did not terminate"
    archived = commitlog_stream.archived_commitlogs(spark, str(bucket))
    assert archived.count() == 5

    # restart with two NEW segments: only the new ones processed (checkpoint)
    for i in range(5, 7):
        _write_segment(str(src), f"CommitLog-7-{100 + i}.log", f"seg{i}", 1000 + i)
    q = commitlog_stream.archive_commitlogs(
        spark, str(src), str(bucket), str(ckpt), available_now=True
    )
    assert q.awaitTermination(120), "stream did not terminate"
    archived = commitlog_stream.archived_commitlogs(spark, str(bucket))
    assert archived.count() == 7

    # PIT window over the archived inventory: [1001s, 1003s] + overhang 1004s
    got = sorted(
        r["ts"] for r in commitlog_window(archived, 1001000, 1003000).collect()
    )
    assert got == [1001000, 1002000, 1003000, 1004000]


def test_session_windows_stream(spark, tmp_path):
    src_dir = str(tmp_path / "sess_in")
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
         (1, "2024-01-01 12:00:00"), (2, "2024-01-01 10:00:00")],
        "user_id bigint, ts_s string",
    ).selectExpr("user_id", "cast(ts_s as timestamp) as ts").coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src_dir)
    q = (
        event_stream.session_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    got = {
        (r["user_id"], r["session_start"].minute, r["events"])
        for r in spark.sql("select * from sess_test").collect()
    }
    # user 1: one session (10:00+10:10), one singleton at 12:00; user 2: one
    assert got == {(1, 0, 2), (1, 0, 1), (2, 0, 1)}


def test_event_windows_streaming_matches_batch(spark, tmp_path):
    # stream the events fixture through a file source → memory sink, compare
    # against the same aggregation computed in batch
    src_dir = str(tmp_path / "events_in")
    # the fixture loader handles both the NANOS and MICROS(NTZ) driver
    # encodings of events.ts — go through it rather than re-reading raw
    from esop_spark.sources.fixtures import load_base_tables

    events = load_base_tables(spark, "/root/testdata/sf0.001")["events"]
    events.write.mode("overwrite").parquet(src_dir)
    schema = events.schema

    stream = spark.readStream.schema(schema).parquet(src_dir)
    windowed = event_stream.tumbling_counts(stream, width="1 hour")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not terminate"
    got = spark.sql(
        "select window_start, event_type, events from win_test"
    ).collect()

    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "events")
        .collect()
    )
    # append mode only emits windows closed by the watermark — every emitted
    # row must match the batch result exactly
    batch_map = {(r["window_start"], r["event_type"]): r["events"] for r in batch}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r["window_start"], r["event_type"])] == r["events"]


def test_commitlog_encrypted_archive_and_pit_restore(spark, tmp_path):
    """Segments archived with a KMS key are ciphertext at rest and decrypt
    transparently on the PIT restore (same payload leg as backup uploads)."""
    from esop_spark.functions import crypto
    from esop_spark.operators import pipelines

    src, bucket, ckpt, out = (str(tmp_path / n) for n in ("cl", "b", "ck", "out"))
    os.makedirs(src)
    for i in range(3):
        _write_segment(src, f"CommitLog-7-{200 + i}.log", f"payload{i}", 2000 + i)

    q = commitlog_stream.archive_commitlogs(
        spark, src, bucket, ckpt, available_now=True, kms_key_id="clk"
    )
    assert q.awaitTermination(120), "stream did not terminate"
    cl_dir = os.path.join(bucket, "commitlog")
    objs = sorted(os.listdir(cl_dir))
    assert len(objs) == 3
    assert all(crypto.is_encrypted(os.path.join(cl_dir, o)) for o in objs)

    n = pipelines.restore_commitlogs(
        spark, bucket, out, 2000_000, 2003_000, kms_key_id="clk"
    )
    assert n == 3
    got = sorted(open(os.path.join(out, f)).read() for f in os.listdir(out))
    assert got == ["payload0", "payload1", "payload2"]


def test_dedup_within_watermark_stream(spark, tmp_path):
    src_dir = str(tmp_path / "dedup_in")
    # duplicate content keys arriving close together: only first kept
    spark.createDataFrame(
        [("k1", "2024-01-01 10:00:00"), ("k1", "2024-01-01 10:05:00"),
         ("k2", "2024-01-01 10:01:00"), ("k2", "2024-01-01 10:02:00"),
         ("k3", "2024-01-01 10:03:00")],
        "content_key string, ts_s string",
    ).selectExpr(
        "content_key", "cast(ts_s as timestamp) as ts"
    ).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("content_key string, ts timestamp").parquet(src_dir)
    q = (
        event_stream.dedup_within_watermark(stream, ["content_key"], watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("dedup_wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    rows = spark.sql("select * from dedup_wm_test").collect()
    assert sorted(r["content_key"] for r in rows) == ["k1", "k2", "k3"]


def test_attribution_stream_stream_join(spark, tmp_path):
    tdir, cdir = str(tmp_path / "touch"), str(tmp_path / "conv")
    spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100, "view"),
            (1, "2024-01-01 10:20:00", 101, "click"),
            (1, "2024-01-01 08:00:00", 102, "view"),  # > max_gap before conv
            (2, "2024-01-01 10:00:00", 103, "view"),  # user 2 never converts
        ],
        "user_id bigint, ts_s string, event_id bigint, event_type string",
    ).selectExpr(
        "user_id", "cast(ts_s as timestamp) as ts", "event_id", "event_type"
    ).coalesce(1).write.parquet(tdir)
    spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 200, "purchase")],
        "user_id bigint, ts_s string, event_id bigint, event_type string",
    ).selectExpr(
        "user_id", "cast(ts_s as timestamp) as ts", "event_id", "event_type"
    ).coalesce(1).write.parquet(cdir)

    schema = "user_id bigint, ts timestamp, event_id bigint, event_type string"
    touches = spark.readStream.schema(schema).parquet(tdir)
    convs = spark.readStream.schema(schema).parquet(cdir)
    out = event_stream.attribution_stream(
        touches, convs, max_gap="1 hour", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    rows = spark.sql("select * from attr_out").collect()
    channels = sorted(r["channel"] for r in rows)
    # only the two touches within [conv-1h, conv] qualify
    assert channels == ["click", "view"]
    assert all(r["conversion_id"] == 200 for r in rows)
