"""CLI surface: full backup → list → remove → restore → commitlog lifecycle
through main(argv) (same session via getOrCreate)."""

import json
import os

import pytest

from esop_spark.cli import main, parse_data_rate_bps
from tests.test_pipelines import BASE_FILES, make_tree
from tests.test_streaming import _write_segment


def test_parse_data_rate():
    assert parse_data_rate_bps("10MBPS") == 10_000_000
    assert parse_data_rate_bps("500 kbps") == 500_000
    with pytest.raises(ValueError):
        parse_data_rate_bps("fast")


def test_cli_lifecycle(spark, tmp_path, capsys):
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    make_tree(data, "snap1", BASE_FILES)

    # missing bucket without --create-missing-bucket fails the verification
    # gate (BucketService.checkBucket, BucketService.java:30-45)
    assert main([
        "backup", "--data-dirs", data, "--tag", "snap1",
        "--storage-location", bucket,
    ]) == 2

    assert main([
        "backup", "--data-dirs", data, "--tag", "snap1",
        "--storage-location", bucket, "--schema-version", "sv", "--ts-millis", "1000",
        "--create-missing-bucket",
    ]) == 0
    assert "uploaded 4 objects" in capsys.readouterr().out

    make_tree(data, "snap2", BASE_FILES)
    main([
        "backup", "--data-dirs", data, "--tag", "snap2",
        "--storage-location", bucket, "--schema-version", "sv", "--ts-millis", "2000",
    ])
    assert "uploaded 0 objects" in capsys.readouterr().out  # incremental

    out_file = str(tmp_path / "report.json")
    assert main([
        "list", "--storage-location", bucket, "--json", "--to-file", out_file,
    ]) == 0
    report = json.loads(open(out_file).read())
    assert report["totalFiles"] == 4 and len(report["reports"]) == 2

    assert main([
        "remove-backup", "--storage-location", bucket, "--oldest",
    ]) == 0
    assert "removed 1 backups, 0 objects" in capsys.readouterr().out

    target = str(tmp_path / "restored")
    assert main([
        "restore", "--storage-location", bucket, "--target-dir", target,
    ]) == 0
    assert "downloaded 4" in capsys.readouterr().out
    assert os.path.exists(os.path.join(target, "ks1"))


def test_cli_list_filters_and_keep_extras(spark, tmp_path, capsys):
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    make_tree(data, "s1", BASE_FILES)
    main(["backup", "--data-dirs", data, "--tag", "s1",
          "--storage-location", bucket, "--ts-millis", "1000",
          "--create-missing-bucket"])
    make_tree(data, "s2", BASE_FILES)
    main(["backup", "--data-dirs", data, "--tag", "s2",
          "--storage-location", bucket, "--ts-millis", "2000"])
    capsys.readouterr()

    # --from-timestamp keeps only backups at/before the bound (P9)
    main(["list", "--storage-location", bucket, "--json",
          "--from-timestamp", "1500"])
    rep = json.loads(capsys.readouterr().out)
    assert [r["name"] for r in rep["reports"]] == ["s1-00000000-1000"]

    # --last-n keeps the oldest n of the newest-first listing (W4)
    main(["list", "--storage-location", bucket, "--json", "--last-n", "1"])
    rep = json.loads(capsys.readouterr().out)
    assert [r["name"] for r in rep["reports"]] == ["s1-00000000-1000"]

    # --keep-extras leaves unknown local files alone
    target = str(tmp_path / "restored")
    main(["restore", "--storage-location", bucket, "--target-dir", target])
    stray = os.path.join(target, "stray.bin")
    open(stray, "w").write("keep me")
    capsys.readouterr()
    main(["restore", "--storage-location", bucket, "--target-dir", target,
          "--keep-extras"])
    assert "deleted 0" in capsys.readouterr().out
    assert os.path.exists(stray)


def test_cli_skip_refreshing_controls_remote_mtime_touch(spark, tmp_path, capsys):
    """LocalFileBackuper.java:48-61: a re-backup of unchanged data freshens
    (touches) existing remote objects' mtimes by default; --skip-refreshing
    leaves them untouched. Neither re-uploads anything."""
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    make_tree(data, "s1", BASE_FILES)
    main(["backup", "--data-dirs", data, "--tag", "s1",
          "--storage-location", bucket, "--ts-millis", "1000",
          "--create-missing-bucket"])
    remote = [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(os.path.join(bucket, "data"))
        for f in fns
    ]
    assert remote
    old = 1_000_000_000.0  # park mtimes far in the past
    for p in remote:
        os.utime(p, (old, old))

    capsys.readouterr()
    make_tree(data, "s2", BASE_FILES)
    main(["backup", "--data-dirs", data, "--tag", "s2",
          "--storage-location", bucket, "--ts-millis", "2000",
          "--skip-refreshing"])
    assert "uploaded 0 objects" in capsys.readouterr().out
    assert all(os.path.getmtime(p) == old for p in remote)

    make_tree(data, "s3", BASE_FILES)
    main(["backup", "--data-dirs", data, "--tag", "s3",
          "--storage-location", bucket, "--ts-millis", "3000"])
    assert "uploaded 0 objects" in capsys.readouterr().out
    assert all(os.path.getmtime(p) > old for p in remote)


def test_cli_list_cache_dir_and_skip_download(spark, tmp_path, capsys):
    """ListOperationRequest.java:50-57: listings flow through a local cache;
    --skip-download serves the cache without the store (even after the store
    is gone), and errors when no cache exists."""
    import shutil

    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    cache = str(tmp_path / "cache")
    make_tree(data, "s1", BASE_FILES)
    main(["backup", "--data-dirs", data, "--tag", "s1",
          "--storage-location", bucket, "--ts-millis", "1000",
          "--create-missing-bucket"])
    capsys.readouterr()

    main(["list", "--storage-location", bucket, "--json", "--cache-dir", cache])
    fresh = json.loads(capsys.readouterr().out)
    assert fresh["totalFiles"] == 4

    shutil.rmtree(os.path.join(bucket, "manifests"))  # store goes away
    main(["list", "--storage-location", bucket, "--json",
          "--cache-dir", cache, "--skip-download"])
    cached = json.loads(capsys.readouterr().out)
    assert cached == fresh

    assert main(["list", "--storage-location", bucket, "--json",
                 "--cache-dir", str(tmp_path / "nope"), "--skip-download"]) == 2


def test_cli_commitlogs(spark, tmp_path, capsys):
    src, bucket = str(tmp_path / "cl"), str(tmp_path / "bucket")
    os.makedirs(src)
    for i in range(4):
        _write_segment(src, f"CommitLog-7-{i}.log", f"s{i}", 5000 + i)
    assert main([
        "commitlog-backup", "--archive-dir", src,
        "--storage-location", bucket, "--checkpoint-dir", str(tmp_path / "ck"),
    ]) == 0
    target = str(tmp_path / "recovery")
    assert main([
        "commitlog-restore", "--storage-location", bucket, "--target-dir", target,
        "--timestamp-start", "5001000", "--timestamp-end", "5002000",
    ]) == 0
    assert "restored 3 commit log segments" in capsys.readouterr().out


def test_packaging_console_script_contract():
    """pyproject.toml declares the `esop-spark` console script pointing at
    cli.main; when the distribution is installed (editable develop or
    wheel), the resolved entry point must load the same callable the
    module exports. Skips the installed half on a bare checkout."""
    import importlib.metadata as im
    try:
        import tomllib
    except ImportError:  # Python 3.10 (requires-python >= 3.10)
        tomllib = pytest.importorskip("tomli")

    with open(os.path.join(os.path.dirname(__file__), "..", "pyproject.toml"),
              "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["scripts"]["esop-spark"] == "esop_spark.cli:main"
    assert meta["project"]["name"] == "esop-spark"
    try:
        eps = im.entry_points(group="console_scripts", name="esop-spark")
    except im.PackageNotFoundError:  # pragma: no cover
        pytest.skip("esop-spark not installed")
    if not eps:
        pytest.skip("esop-spark not installed")
    assert list(eps)[0].load() is main
