"""q37 streaming twin: native session_window sessions equal the batch
sessionize rows (batch parity), survive a checkpoint kill/restart with a
session SPANNING the restart, and split/merge at exactly the batch gap
boundary."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from esop_spark.operators import analytics
from esop_spark.streaming.curation_stream import run_to_sink
from esop_spark.streaming.session_stream import session_stream

GAP_S = 600  # 10 min sessions keep the fixture rows compact

# (user_id, event_id, ts) — user A: two sessions (one exactly-gap edge
# inside the first); user B: one long session; user C: single event.
ROWS = [
    ("A", 1, "2024-01-01 00:00:00"),
    ("A", 2, "2024-01-01 00:05:00"),
    ("A", 3, "2024-01-01 00:15:00"),   # diff == GAP_S exactly -> SAME session
    ("A", 4, "2024-01-01 01:00:00"),   # diff > GAP_S -> new session
    ("B", 5, "2024-01-01 00:00:30"),
    ("B", 6, "2024-01-01 00:09:30"),
    ("B", 7, "2024-01-01 00:18:30"),
    ("C", 8, "2024-01-01 02:00:00"),
]
# sentinel far in the future: pushes the watermark past every real session
# so append mode emits them all (an unbounded stream does this naturally)
FLUSH = [("zz_flush", 999, "2024-01-02 12:00:00")]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, event_id bigint, ts string"
    ).select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )


def _batch_key_rows(spark, rows):
    got = analytics.sessionize(
        _df(spark, rows), gap_s=GAP_S, user_col="user_id"
    ).collect()
    return sorted(
        (r["user_id"], r["session_start_ms"], r["n_events"]) for r in got
    )


def _stream_rows(spark, out_dir):
    got = spark.read.parquet(out_dir).collect()
    return sorted(
        (r["user_id"], r["session_start_ms"], r["n_events"])
        for r in got
        if r["user_id"] != "zz_flush"
    )


def test_session_stream_matches_batch(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src, exist_ok=True)
    _df(spark, ROWS + FLUSH).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id string, event_id bigint, ts timestamp"
    ).parquet(src)
    run_to_sink(session_stream(stream, gap_s=GAP_S, watermark="1 minute"), out, ckpt)
    assert _stream_rows(spark, out) == _batch_key_rows(spark, ROWS)
    # the exactly-gap pair merged (A's first session has 3 events), proving
    # the +1ms boundary alignment with the batch strictly-greater rule
    a_sessions = [r for r in _stream_rows(spark, out) if r[0] == "A"]
    assert (("A", 1704067200000, 3) in a_sessions) or any(
        n == 3 for (_, _, n) in a_sessions
    )


def test_session_stream_state_survives_restart(spark, tmp_path):
    """A session whose events straddle the restart must come out as ONE
    merged session with the full count — only possible if the open-session
    state was resumed from the checkpoint, not rebuilt."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src2", "out2", "ckpt2"))
    os.makedirs(src, exist_ok=True)
    first = [
        ("S", 1, "2024-01-01 00:00:00"),
        ("S", 2, "2024-01-01 00:04:00"),
    ]
    second = [
        ("S", 3, "2024-01-01 00:08:00"),  # within GAP_S of event 2 -> merges
        ("S", 4, "2024-01-01 01:00:00"),  # new session after the gap
    ]
    _df(spark, first).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id string, event_id bigint, ts timestamp"
    ).parquet(src)
    q = session_stream(stream, gap_s=GAP_S, watermark="1 minute")
    run_to_sink(q, out, ckpt)  # drain 1: session S still open, nothing final
    _df(spark, second + FLUSH).coalesce(1).write.mode("append").parquet(src)
    run_to_sink(q, out, ckpt)  # drain 2: merge across the restart, then flush
    got = _stream_rows(spark, out)
    assert got == _batch_key_rows(spark, first + second)
    # the spanning session carries all 3 events
    assert ("S", 1704067200000, 3) in got
