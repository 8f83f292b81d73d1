"""Streaming corpus release: the batch release writer
(:func:`esop_spark.operators.versioning.write_release`) as an incremental
streaming sink, so a continuously-curated corpus ships as it arrives and
the release manifest stays current without ever rescanning shipped data.

The manifest digest is a commutative bit-XOR of per-doc content hashes, so
the incremental maintenance rule is trivial and EXACT: merged_digest =
old_digest XOR batch_digest (counts add). A full recompute over everything
shipped equals the running merge — the same merge==rescan contract as the
mergeable-stats operator (q109), applied to release fingerprints.

Exactly-once: each micro-batch writes its rows into its own
``data/batch=<id>/`` directory in overwrite mode (replaying a failed batch
rewrites the same directory — idempotent), and the manifest JSON records
the last merged batch id, so a replayed batch is merged at most once. The
manifest file is swapped atomically (tmp + rename).

Scale: per batch, one write job plus one |partitions|-grain aggregate;
the manifest held on the driver is one dict entry per partition value.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from esop_spark.operators.versioning import release_manifest

MANIFEST_NAME = "_RELEASE_MANIFEST.json"


def _read_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return {"_last_batch": -1, "partitions": {}}
    with open(path) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, path)


def write_release_stream(
    docs: DataFrame,
    out_dir: str,
    checkpoint: str,
    partition_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
):
    """Start (availableNow) a streaming release: per micro-batch, ship the
    rows under ``data/batch=<id>/<partition_col>=<v>/`` and XOR-merge the
    batch's manifest into the cumulative ``_RELEASE_MANIFEST.json``.

    Returns the StreamingQuery; callers ``awaitTermination()``."""
    os.makedirs(out_dir, exist_ok=True)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        manifest = _read_manifest(out_dir)
        if batch_id <= manifest["_last_batch"]:
            return  # replayed batch already shipped + merged
        (
            batch_df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(os.path.join(out_dir, "data", f"batch={batch_id}"))
        )
        rows = release_manifest(
            batch_df, partition_col, text_col, id_col, hash_family
        ).collect()
        parts = manifest["partitions"]
        for r in rows:
            p = str(r["partition"])
            cur = parts.get(p, {"n_docs": 0, "n_tokens": 0, "content_digest": 0})
            parts[p] = {
                "n_docs": cur["n_docs"] + r["n_docs"],
                "n_tokens": cur["n_tokens"] + r["n_tokens"],
                "content_digest": cur["content_digest"] ^ r["content_digest"],
            }
        manifest["_last_batch"] = batch_id
        _write_manifest(out_dir, manifest)

    return (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
