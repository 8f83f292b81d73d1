"""Point-in-time commit-log selection.

Reference semantics (P8+W5): keep segments with
``start <= ts <= end`` plus the single earliest segment with ``ts > end``
(the "overhang" — replay must cover mutations written after the window closed
but flushed into the next segment)
(/root/reference/core/src/main/java/com/instaclustr/esop/impl/restore/RestoreCommitLogsOperation.java:106-163).

Scale notes: the window filter prunes at the scan (predicate pushdown on a
timestamp-derived column); the overhang leg is a global min over the filtered
remainder — an O(n) partial-agg, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def commitlog_window(commitlogs: DataFrame, start_ms: int, end_ms: int) -> DataFrame:
    """Q7: segments in [start, end] plus the first overhanging segment."""
    in_window = commitlogs.filter(
        (F.col("ts") >= F.lit(start_ms)) & (F.col("ts") <= F.lit(end_ms))
    )
    # min-ts beyond the window; ts is unique per segment (mtime-millis in the
    # object key) so a min + semi-join is deterministic and avoids a sort.
    after = commitlogs.filter(F.col("ts") > F.lit(end_ms))
    overhang_ts = after.agg(F.min("ts").alias("ts"))
    overhang = after.join(overhang_ts, "ts", "left_semi")
    return in_window.select("name", "ts", "size").unionByName(
        overhang.select("name", "ts", "size")
    )
