"""In-place restore cassandra.yaml rewrite
(InPlaceRestorationStrategy.java:125-160, io/FileUtils.java:69-84)."""

import os

from esop_spark.operators import cassandra_yaml, pipelines
from tests.test_pipelines import BASE_FILES, make_tree

STOCK_YAML = """cluster_name: 'Test Cluster'
num_tokens: 16
# initial_token:
auto_bootstrap: true
listen_address: localhost
"""

TOKENS = ["-9223372036854775808", "0", "4611686018427387904"]
FRAGMENT = "initial_token: -9223372036854775808,0,4611686018427387904"


def test_fresh_stock_yaml_golden(tmp_path):
    p = str(tmp_path / "cassandra.yaml")
    with open(p, "w") as f:
        f.write(STOCK_YAML)
    got = cassandra_yaml.update_cassandra_yaml(p, TOKENS)
    assert got == {"auto_bootstrap": "replaced", "initial_token": "appended"}
    content = open(p).read()
    assert content == (
        STOCK_YAML.replace("auto_bootstrap: true", "auto_bootstrap: false")
        + FRAGMENT
        + "\n"
    )


def test_second_run_is_idempotent(tmp_path):
    p = str(tmp_path / "cassandra.yaml")
    with open(p, "w") as f:
        f.write(STOCK_YAML)
    cassandra_yaml.update_cassandra_yaml(p, TOKENS)
    first = open(p).read()
    got = cassandra_yaml.update_cassandra_yaml(p, TOKENS)
    assert got == {"auto_bootstrap": "unchanged", "initial_token": "unchanged"}
    assert open(p).read() == first


def test_no_auto_bootstrap_line_appends(tmp_path):
    p = str(tmp_path / "cassandra.yaml")
    with open(p, "w") as f:
        f.write("cluster_name: 'x'\n")
    got = cassandra_yaml.update_cassandra_yaml(p, TOKENS)
    assert got == {"auto_bootstrap": "appended", "initial_token": "appended"}
    content = open(p).read()
    assert "auto_bootstrap: false\n" in content and content.endswith(FRAGMENT + "\n")


def test_existing_uncommented_initial_token_is_left_alone(tmp_path):
    p = str(tmp_path / "cassandra.yaml")
    with open(p, "w") as f:
        f.write("initial_token: 42\nauto_bootstrap: false\n")
    got = cassandra_yaml.update_cassandra_yaml(p, TOKENS)
    assert got == {"auto_bootstrap": "unchanged", "initial_token": "skipped_existing"}
    assert open(p).read() == "initial_token: 42\nauto_bootstrap: false\n"


def test_missing_yaml_is_noop(tmp_path):
    got = cassandra_yaml.update_cassandra_yaml(str(tmp_path / "nope.yaml"), TOKENS)
    assert got == {
        "auto_bootstrap": "missing_file",
        "initial_token": "missing_file",
    }


def test_restore_wires_yaml_rewrite_from_manifest_tokens(spark, tmp_path):
    """backup(tokens=…) embeds the ring tokens in the manifest; an in-place
    restore with cassandra_config_dir set replays them into cassandra.yaml."""
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    conf = str(tmp_path / "conf")
    os.makedirs(conf)
    with open(os.path.join(conf, "cassandra.yaml"), "w") as f:
        f.write(STOCK_YAML)
    make_tree(data, "snap1", BASE_FILES)
    pipelines.backup(
        spark, [data], "snap1", bucket, schema_version="sv", ts_millis=1000,
        tokens=TOKENS,
    )
    stats = pipelines.restore(
        spark, bucket, str(tmp_path / "out"), cassandra_config_dir=conf
    )
    assert stats["cassandra_yaml"] == {
        "auto_bootstrap": "replaced",
        "initial_token": "appended",
    }
    content = open(os.path.join(conf, "cassandra.yaml")).read()
    assert "auto_bootstrap: false" in content and FRAGMENT in content
