"""RoundCheckpointer: localCheckpoint blocks are released deterministically
when a round is superseded, so iterative loops hold O(1) rounds resident."""

from pyspark.sql import functions as F

from esop_spark.operators.iterate import RoundCheckpointer


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_checkpoint_release_frees_blocks(spark):
    base = _n_persistent(spark)
    ckpt = RoundCheckpointer(spark)
    df = ckpt.checkpoint(spark.range(1000).withColumn("x", F.col("id") * 2))
    assert df.count() == 1000
    assert _n_persistent(spark) > base  # the checkpoint pinned blocks
    ckpt.release(df)
    assert _n_persistent(spark) == base


def test_loop_holds_bounded_rounds(spark):
    base = _n_persistent(spark)
    ckpt = RoundCheckpointer(spark)
    cur = ckpt.checkpoint(spark.range(100))
    for _ in range(6):
        prev = cur
        cur = ckpt.checkpoint(cur.withColumn("id", F.col("id") + 1))
        ckpt.release(prev)
        # at most the live round's ids are pinned by this checkpointer
        assert _n_persistent(spark) - base <= 2
    assert cur.agg(F.min("id")).collect()[0][0] == 6
    ckpt.release_all()
    assert _n_persistent(spark) == base


def test_release_is_noop_for_unowned_frames(spark):
    ckpt = RoundCheckpointer(spark)
    plain = spark.range(10)
    ckpt.release(plain)  # never checkpointed by this instance
    ckpt.release(None)
    assert plain.count() == 10


def test_disown_leaves_final_round_usable(spark):
    base = _n_persistent(spark)
    ckpt = RoundCheckpointer(spark)
    df = ckpt.checkpoint(spark.range(50))
    ckpt.disown(df)
    ckpt.release_all()  # must not free the disowned frame's blocks
    assert df.count() == 50
    assert _n_persistent(spark) > base  # still pinned (GC will reclaim)
