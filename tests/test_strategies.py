"""Phased restoration strategies (hardlinks / import) and bucket lifecycle
(HardlinkingRestorationStrategy.java, ImportingRestorationStrategy.java,
BucketService.java)."""

import os

import pytest

from esop_spark.operators import pipelines, strategies
from tests.test_pipelines import BASE_FILES, TABLE_ID, make_tree


@pytest.fixture()
def backed_up(spark, tmp_path):
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    make_tree(data, "snap1", BASE_FILES)
    pipelines.backup(spark, [data], "snap1", bucket, schema_version="sv", ts_millis=1000)
    return bucket, str(tmp_path)


def test_bucket_service_lifecycle(tmp_path):
    b = str(tmp_path / "bkt")
    assert not strategies.bucket_exists(b)
    with pytest.raises(strategies.BucketServiceException):
        strategies.check_bucket(b, create_missing=False)
    strategies.check_bucket(b, create_missing=True)
    assert strategies.bucket_exists(b)
    strategies.check_bucket(b)  # existing bucket passes without the flag
    strategies.delete_bucket(b)
    assert not strategies.bucket_exists(b)


def test_hardlink_restore_links_and_cleans_up(spark, backed_up):
    bucket, root = backed_up
    node = os.path.join(root, "node")
    stats = strategies.restore_phased(spark, bucket, node, strategy="hardlinks")
    assert stats["downloaded"] == 4 and stats["linked"] == 4 and stats["skipped"] == 0
    # files landed in the live table dirs with correct bytes
    for (ks, table, comp), content in BASE_FILES.items():
        p = os.path.join(node, ks, f"{table}-{TABLE_ID}", comp)
        with open(p) as f:
            assert f.read() == content
    # CLEANUP phase removed the staging dir
    assert not os.path.exists(os.path.join(node, ".esop-import"))
    # JMX boundary: truncate-then-refresh per table, in table order
    ops = stats["jmx_calls"]
    tables = [("ks1", "t1"), ("ks1", "t2"), ("ks2", "t3")]
    assert ops == [("truncate", k, t) for k, t in tables] + [
        ("refresh", k, t) for k, t in tables
    ]


def test_hardlink_restore_skips_existing_targets(spark, backed_up):
    """RestorationPhase.java:540-543: an already-present target is skipped,
    not overwritten."""
    bucket, root = backed_up
    node = os.path.join(root, "node")
    pre = os.path.join(node, "ks1", f"t1-{TABLE_ID}", "me-1-big-Data.db")
    os.makedirs(os.path.dirname(pre))
    with open(pre, "w") as f:
        f.write("pre-existing")
    stats = strategies.restore_phased(spark, bucket, node, strategy="hardlinks")
    assert stats["linked"] == 3 and stats["skipped"] == 1
    with open(pre) as f:
        assert f.read() == "pre-existing"


def test_import_strategy_stages_without_touching_live_dirs(spark, backed_up):
    """IMPORT keeps files staged for the nodetool-import JMX call; the live
    table dirs stay untouched on our side of the boundary."""
    bucket, root = backed_up
    node = os.path.join(root, "node")
    stats = strategies.restore_phased(spark, bucket, node, strategy="import")
    staged = stats["staged_dir"]
    assert staged and os.path.isdir(staged)
    assert stats["linked"] == 0
    assert sorted(os.listdir(node)) == [".esop-import"]
    assert [op for op, _, _ in stats["jmx_calls"]].count("import") == 3
    # every downloaded file is staged and intact
    for (ks, table, comp), content in BASE_FILES.items():
        with open(os.path.join(staged, ks, f"{table}-{TABLE_ID}", comp)) as f:
            assert f.read() == content


def test_verify_gate_aborts_on_corrupt_download(spark, backed_up, monkeypatch):
    """A corrupted download must fail the phase BEFORE any linking
    (RestorationPhase.java:508-511)."""
    bucket, root = backed_up
    node = os.path.join(root, "node")

    real_restore = pipelines.restore

    def corrupting_restore(*a, **kw):
        out = real_restore(*a, **kw)
        dl = os.path.join(node, ".esop-import")
        victim = os.path.join(dl, "ks1", f"t1-{TABLE_ID}", "me-1-big-Data.db")
        with open(victim, "w") as f:
            f.write("BITROT")
        return out

    monkeypatch.setattr(pipelines, "restore", corrupting_restore)
    with pytest.raises(RuntimeError, match="corrupted or missing"):
        strategies.restore_phased(spark, bucket, node, strategy="hardlinks")
    # nothing was linked into the live dirs
    assert not os.path.exists(os.path.join(node, "ks1"))


def test_jmx_executor_receives_ordered_calls(spark, backed_up):
    bucket, root = backed_up
    node = os.path.join(root, "node_jmx")
    calls = []
    stats = strategies.restore_phased(
        spark, bucket, node, strategy="hardlinks",
        jmx_executor=lambda op, ks, t: calls.append((op, ks, t)),
    )
    assert calls == stats["jmx_calls"]
    # all truncates strictly precede all refreshes
    ops = [op for op, _, _ in calls]
    assert ops == ["truncate"] * (len(ops) // 2) + ["refresh"] * (len(ops) // 2)


def test_jmx_executor_failure_preserves_staged_files(spark, backed_up):
    bucket, root = backed_up
    node = os.path.join(root, "node_jmx_fail")

    def failing(op, ks, t):
        if op == "refresh":
            raise RuntimeError("node unreachable")

    with pytest.raises(RuntimeError, match="node unreachable"):
        strategies.restore_phased(
            spark, bucket, node, strategy="hardlinks", jmx_executor=failing
        )
    # cleanup did NOT run: the staged download dir survives for retry
    assert os.path.isdir(os.path.join(node, ".esop-import"))
