"""ST2 retention daemon + applyInPandas centroid refinement."""

import time

from esop_spark.operators import pipelines, similarity
from esop_spark.streaming.retention_trigger import retention_daemon
from tests.test_pipelines import BASE_FILES, make_tree


def test_retention_daemon_removes_old_backups(spark, tmp_path):
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    make_tree(data, "s1", BASE_FILES)
    old_ts = int(time.time() * 1000) - 30 * 86400000  # 30 days old
    pipelines.backup(spark, [data], "s1", bucket, schema_version="sv", ts_millis=old_ts)
    make_tree(data, "s2", BASE_FILES)
    pipelines.backup(
        spark, [data], "s2", bucket, schema_version="sv",
        ts_millis=int(time.time() * 1000),
    )
    reports = retention_daemon(
        spark, bucket, older_than="14day", rate_s=0.01, max_ticks=2
    )
    assert reports[0]["backups_removed"] == 1  # only the 30-day-old one
    assert reports[0]["objects_removed"] == 0  # all objects shared with s2
    assert reports[1]["backups_removed"] == 0  # second tick: nothing left


def test_refine_centroids_moves_toward_members(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 10.0]), (1, [0.0, 12.0]), (2, [10.0, 0.0]), (3, [14.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    seeds = [(0, [0.0, 1.0]), (1, [1.0, 0.0])]
    refined = dict(similarity.refine_centroids(emb, seeds))
    assert refined[0] == [0.0, 11.0]  # mean of the y-axis cluster
    assert refined[1] == [12.0, 0.0]  # mean of the x-axis cluster
