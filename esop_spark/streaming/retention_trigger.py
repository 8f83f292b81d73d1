"""ST2: daemon-mode periodic retention.

The reference re-runs backup removal on a fixed rate (``--rate=1day``,
README.adoc "Global removal"; scheduling/DaemonScheduler.java). The engine
analog is a driver-side trigger loop re-running the retention query —
the query itself is the same distributed ``remove_backup`` plan each tick
(Structured Streaming's ProcessingTime trigger semantics, without
pretending the bucket listing is a stream source).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import SparkSession

from esop_spark.operators.pipelines import remove_backup
from esop_spark.operators.retention import parse_duration_ms


def retention_daemon(
    spark: SparkSession,
    bucket_dir: str,
    older_than: str = "14day",
    rate_s: float = 86400.0,
    max_ticks: int | None = None,
    dry_run: bool = False,
    on_tick: Callable[[dict], None] | None = None,
) -> list[dict]:
    """Re-run `--older-than` retention every ``rate_s`` seconds.

    ``max_ticks`` bounds the loop (tests / cron-style one-shots); ``on_tick``
    observes each removal report. Returns the reports.
    """
    keep_ms = parse_duration_ms(older_than)
    reports = []
    tick = 0
    while max_ticks is None or tick < max_ticks:
        cutoff = int(time.time() * 1000) - keep_ms
        stats = remove_backup(
            spark, bucket_dir, older_than_ms=cutoff, dry_run=dry_run
        )
        reports.append(stats)
        if on_tick:
            on_tick(stats)
        tick += 1
        if max_ticks is not None and tick >= max_ticks:
            break
        time.sleep(rate_s)
    return reports
