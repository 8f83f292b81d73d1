"""Cloud-connector profiles: the reference's transfer tunables as concrete
Spark/Hadoop configs (AzureBackuper.java:28-30 block cap,
BaseS3Restorer.java:251-253 delete batching)."""

import pytest

from esop_spark.sources.cloud_profiles import (
    DELETE_BATCH_SIZE,
    apply_cloud_profile,
    profile_for,
)


def test_azure_block_cap_matches_reference():
    p = profile_for("azure")
    assert p["spark.hadoop.fs.azure.write.request.size"] == str(4 * 1024 * 1024)


def test_delete_batch_matches_reference():
    assert DELETE_BATCH_SIZE == 100


def test_unknown_provider_is_an_error():
    with pytest.raises(ValueError, match="unknown cloud provider"):
        profile_for("s4")


def test_apply_to_live_session_sets_runtime_confs(spark):
    apply_cloud_profile(spark, "azure")
    assert (
        spark.conf.get("spark.hadoop.fs.azure.write.request.size")
        == str(4 * 1024 * 1024)
    )


def test_apply_to_builder_chains_configs():
    class FakeBuilder:
        def __init__(self):
            self.confs = {}

        def config(self, k, v):
            self.confs[k] = v
            return self

    b = apply_cloud_profile(FakeBuilder(), "s3")
    assert b.confs["spark.hadoop.fs.s3a.multipart.size"] == "67108864"
    assert apply_cloud_profile(FakeBuilder(), "local").confs == {}
