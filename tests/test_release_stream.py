"""Streaming incremental release: the XOR-digest manifest maintained across
micro-batches must equal a full batch recompute over everything shipped
(merge == rescan), survive restarts, and ignore replayed batches."""

import json
import os

from esop_spark.operators import versioning
from esop_spark.streaming.release_stream import MANIFEST_NAME, write_release_stream


def _write_src(spark, src, i0, i1):
    rows = [
        (i, " ".join(f"w{(i + j) % 9}" for j in range(6)), ["en", "fr"][i % 2])
        for i in range(i0, i1)
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema("doc_id bigint, text string, lang string").parquet(
        src
    )
    q = write_release_stream(stream, out, ckpt)
    assert q.awaitTermination(120), "stream did not terminate"


def test_incremental_manifest_equals_rescan_across_restart(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)

    _write_src(spark, src, 0, 100)
    _run(spark, src, out, ckpt)

    # second wave of documents, new stream run on the same checkpoint
    _write_src(spark, src, 100, 180)
    _run(spark, src, out, ckpt)

    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    parts = manifest["partitions"]

    # merge == rescan: recompute the manifest over EVERYTHING shipped
    shipped = spark.read.parquet(os.path.join(out, "data"))
    full = {
        str(r["partition"]): r
        for r in versioning.release_manifest(shipped, "lang").collect()
    }
    assert set(parts) == set(full) == {"en", "fr"}
    for p in parts:
        assert parts[p]["n_docs"] == full[p]["n_docs"]
        assert parts[p]["n_tokens"] == full[p]["n_tokens"]
        assert parts[p]["content_digest"] == full[p]["content_digest"]
    assert sum(r["n_docs"] for r in parts.values()) == 180


def test_replayed_batch_not_merged_twice(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "s2"), str(tmp_path / "o2"), str(tmp_path / "c2")
    os.makedirs(src)
    _write_src(spark, src, 0, 40)
    _run(spark, src, out, ckpt)
    before = json.load(open(os.path.join(out, MANIFEST_NAME)))

    # re-run with NO new input: any replay/empty batch must leave the
    # manifest unchanged
    _run(spark, src, out, ckpt)
    after = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert before["partitions"] == after["partitions"]
