"""Bucketed co-located join: no shuffle exchange on bucketed inputs."""

import pytest

from esop_spark.plans import bucketing


def test_bucketed_join_has_no_input_exchanges(spark, tmp_path):
    left = spark.range(0, 10000).selectExpr(
        "concat('obj-', id % 500) as object_key", "id as size"
    )
    right = spark.range(0, 500).selectExpr(
        "concat('obj-', id) as object_key", "id as refs"
    )
    bucketing.materialize_bucketed(left, "b_left", "object_key", 8)
    bucketing.materialize_bucketed(right, "b_right", "object_key", 8)

    joined = bucketing.co_located_join(spark, "b_left", "b_right", "object_key")
    assert joined.count() == 10000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # bucket-aware join: sort-merge with NO shuffle on either side
    assert "Exchange hashpartitioning" not in plan, plan[:2000]

    # control: the same join on non-bucketed frames DOES shuffle (or
    # broadcasts); re-join the raw frames to prove the bucket spec did it
    raw = left.join(right.hint("merge"), "object_key")
    raw.count()
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in raw_plan
