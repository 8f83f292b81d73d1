"""Explicit block release for ``localCheckpoint``-ed iterative loops.

``DataFrame.localCheckpoint()`` materializes the plan into cached RDD
blocks and truncates lineage — the right tool for label-propagation /
peel loops where the logical plan would otherwise grow per round. But
unlike ``persist()`` there is no public unpersist handle: the blocks are
freed only when the JVM garbage-collects the LogicalRDD plan and the
ContextCleaner notices. In a loop that rebinds the checkpointed frame
every round, every superseded round's blocks stay resident until a GC
happens to run. Harmless on a cluster (blocks are spread across
executors and evicted under pressure), but in a single-JVM local run at
100x data it is the difference between fitting in the default heap and
OOM: the sf10 k-core rehearsal needed a 48 GiB heap purely to hold dead
peel rounds (SCALE.md round-6 finding).

:class:`RoundCheckpointer` closes the gap: it records which persistent
RDD ids each checkpoint created (``JavaSparkContext.getPersistentRDDs``
is the introspection point) and unpersists exactly those ids once the
caller declares the frame superseded. Checkpoints are eager, so by the
time :meth:`checkpoint` returns, the new round's blocks exist and the
previous round's frame is safe to release as soon as its last consumer
(usually the convergence check) has run.

Single-threaded loops only: the id diff around the checkpoint call would
misattribute RDDs persisted concurrently by another thread. Every loop
in this repo builds its rounds sequentially on the driver, so this holds
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class RoundCheckpointer:
    """Tracks localCheckpoint block ownership per DataFrame so iterative
    loops can free superseded rounds deterministically instead of waiting
    for JVM GC.

    ``storage_level`` sets the checkpoint block placement: the default
    MEMORY_AND_DISK is right for label-relation loops (rounds are small),
    while edge-relation peels over corpus-scale graphs should pass
    DISK_ONLY — the round's blocks are written once and read once next
    round, so caching them on-heap buys little and (in a single-JVM local
    run) competes with the very join/agg execution memory the round
    needs."""

    def __init__(self, df_or_spark, storage_level: StorageLevel | None = None) -> None:
        spark = (
            df_or_spark.sparkSession
            if isinstance(df_or_spark, DataFrame)
            else df_or_spark
        )
        self._jsc = spark.sparkContext._jsc
        self._level = storage_level
        # id(df) -> [persistent rdd ids created by that df's checkpoint]
        self._owned: dict[int, list[int]] = {}

    def _persistent_ids(self) -> set[int]:
        return {
            int(i) for i in self._jsc.getPersistentRDDs().keySet().toArray()
        }

    def checkpoint(self, df: DataFrame) -> DataFrame:
        """Eagerly localCheckpoint ``df`` and record the RDD ids it pinned."""
        before = self._persistent_ids()
        # eager: blocks exist on return
        out = df.localCheckpoint(eager=True, storageLevel=self._level)
        self._owned[id(out)] = sorted(self._persistent_ids() - before)
        return out

    def release(self, df: DataFrame | None) -> None:
        """Unpersist the blocks a prior :meth:`checkpoint` created for
        ``df``. No-op for frames this checkpointer doesn't own (including
        ``None``), so loop prologues can release unconditionally."""
        if df is None:
            return
        rdd_ids = self._owned.pop(id(df), [])
        if not rdd_ids:
            return
        jmap = self._jsc.getPersistentRDDs()
        for rid in rdd_ids:
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist(False)

    def release_all(self) -> None:
        """Free every checkpoint this instance still owns (loop epilogue
        for frames that never became the returned result)."""
        jmap = self._jsc.getPersistentRDDs()
        for rdd_ids in self._owned.values():
            for rid in rdd_ids:
                if jmap.containsKey(rid):
                    jmap.get(rid).unpersist(False)
        self._owned.clear()

    def disown(self, df: DataFrame) -> None:
        """Stop tracking ``df`` (e.g. it is about to be returned to the
        caller and must outlive this checkpointer)."""
        self._owned.pop(id(df), None)
