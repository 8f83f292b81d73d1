"""Cloud-connector configuration profiles (U2 storage SPI, concrete).

The reference ships three provider modules (s3/, azure/, gcp/) whose
engine-relevant behavior reduces to a handful of transfer tunables; this
repo delegates the byte transport to Hadoop FileSystem connectors (COVERAGE
§2.7), so those tunables become Spark/Hadoop configs. This module encodes
them so parity is code, not prose:

- **s3** (s3a connector): multipart upload sizing and connection pool —
  the analog of the reference's TransferManager settings; DeleteObjects
  batching is client-side there (100 per request,
  s3/v2/BaseS3Restorer.java:251-253) and maps to our partition-batched
  delete sink (``DELETE_BATCH_SIZE``).
- **azure** (abfss connector): the reference caps blob blocks at 4 MiB
  (AzureBackuper.java:28-30, ``azure.max.blob.block.size``); abfss
  expresses the same bound as ``fs.azure.write.request.size``.
- **gcp** (gs connector): resumable-upload chunk size, the GCS analog of
  the block cap.

``apply_cloud_profile`` sets the configs on a builder or a live session;
``profile_for`` returns the dict (inspectable, testable). Unknown
providers raise — a typo'd profile silently falling back to defaults is
exactly the config drift this module exists to prevent.
"""

from __future__ import annotations

import os
from itertools import islice

# partition-batched removal sink batch bound — the DeleteObjects-batch
# analog (BaseS3Restorer.java:251-253 splits deletions 100 per request)
DELETE_BATCH_SIZE = 100


def default_bulk_delete(batch: list) -> None:
    """The file://-scheme stand-in for one DeleteObjects request: unlink
    every path in the batch, tolerating already-gone objects (the provider
    API treats missing keys as deleted, not as an error)."""
    for p in batch:
        if os.path.exists(p):
            os.remove(p)


def delete_objects_batched(paths, bulk_delete=None) -> list:
    """Split ``paths`` into DeleteObjects-sized requests and issue one
    ``bulk_delete`` call per batch — the client-side batching every
    provider sink shares (S3 DeleteObjects caps at 100 keys per request in
    the reference, BaseS3Restorer.java:251-253; the same loop bounds Azure
    and GCS batch deletes). Returns the per-request batch sizes — the
    request log an object-store client would emit — so callers can report
    request counts and tests can assert the cap is respected."""
    bulk = bulk_delete or default_bulk_delete
    sizes = []
    it = iter(paths)
    while batch := list(islice(it, DELETE_BATCH_SIZE)):
        bulk(batch)
        sizes.append(len(batch))
    return sizes

_PROFILES: dict[str, dict[str, str]] = {
    "s3": {
        # multipart threshold/size ≈ the TransferManager part sizing
        "spark.hadoop.fs.s3a.multipart.size": "67108864",  # 64 MiB parts
        "spark.hadoop.fs.s3a.multipart.threshold": "134217728",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.committer.name": "magic",
    },
    "azure": {
        # reference caps blob blocks at 4 MiB (AzureBackuper.java:28-30);
        # abfss write request size is the same knob
        "spark.hadoop.fs.azure.write.request.size": str(4 * 1024 * 1024),
        "spark.hadoop.fs.azure.read.request.size": str(4 * 1024 * 1024),
        "spark.hadoop.fs.azure.io.retry.max.retries": "7",
    },
    "gcp": {
        # resumable-upload chunk — GCS analog of the block cap
        "spark.hadoop.fs.gs.outputstream.upload.chunk.size": "8388608",
        "spark.hadoop.fs.gs.inputstream.support.gzip.encoding.enable": "false",
        "spark.hadoop.fs.gs.status.parallel.enable": "true",
    },
    # local / test harness: nothing to tune
    "local": {},
}


# Job-commit safety for object stores (no atomic rename): these classes
# live in the spark-hadoop-cloud artifact, which a cloud deployment ships
# on the classpath but a bare local build does not — and Spark VALIDATES
# commitProtocolClass at conf-set time, so they are builder-only (a
# builder's configs are applied before any validation; on a live session
# without the jar, conf.set itself would throw ClassNotFound).
_BUILDER_ONLY: dict[str, dict[str, str]] = {
    "s3": {
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    },
}


def profile_for(provider: str, include_builder_only: bool = False) -> dict[str, str]:
    try:
        out = dict(_PROFILES[provider])
    except KeyError:
        raise ValueError(
            f"unknown cloud provider {provider!r}; expected one of "
            f"{sorted(_PROFILES)}"
        ) from None
    if include_builder_only:
        out.update(_BUILDER_ONLY.get(provider, {}))
    return out


def apply_cloud_profile(target, provider: str):
    """Apply a profile to a SparkSession.Builder (``.config`` chaining — gets
    the transfer tunables AND the builder-only committer overrides) or a
    live SparkSession (runtime ``conf.set`` — transfer tunables only; Hadoop
    configs are readable at FS-instantiation time, so setting them
    pre-first-use is valid, while the committer classes require the
    spark-hadoop-cloud jar and must be set at session build)."""
    if hasattr(target, "config"):  # builder
        for k, v in profile_for(provider, include_builder_only=True).items():
            target = target.config(k, v)
        return target
    for k, v in profile_for(provider).items():
        target.conf.set(k, v)
    return target
