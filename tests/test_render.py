"""Golden tests for output rendering (FIXTURES.md §10 vectors, mirroring the
reference's AllManifestsReportTest / humanReadableByteCountSI expectations)."""

from esop_spark.functions.render import (
    human_bytes,
    human_bytes_col,
    render_table,
    render_timestamp,
)

GOLDENS = {
    0: "0 B",
    999: "999 B",
    1000: "1.0 kB",
    999949: "999.9 kB",
    999950: "1.0 MB",
    1000000: "1.0 MB",
    999949999999: "999.9 GB",
    999950000000: "1.0 TB",
}


def test_human_bytes_goldens():
    for n, expected in GOLDENS.items():
        assert human_bytes(n) == expected, n


def test_human_bytes_negative_mirror():
    assert human_bytes(-1000) == "-1.0 kB"
    assert human_bytes(-999950) == "-1.0 MB"
    assert human_bytes(-999) == "-999 B"


def test_human_bytes_col_matches_python(spark):
    values = sorted(GOLDENS) + [123456, 113100, 10100, 5 * 10**15, 2**53 + 1001]
    df = spark.createDataFrame([(v,) for v in values], "b bigint")
    out = {
        r["b"]: r["h"]
        for r in df.select("b", human_bytes_col("b").alias("h")).collect()
    }
    for v in values:
        assert out[v] == human_bytes(v), v


def test_render_timestamp():
    # reference example 2021-04-27T15:38:40.284 (Manifest.java:690)
    assert render_timestamp(1619537920284) == "2021-04-27T15:38:40.284"
    assert render_timestamp(1619537920000) == "2021-04-27T15:38:40"
    assert render_timestamp(1619537880000) == "2021-04-27T15:38"


def test_render_table_alignment():
    out = render_table([["name", "size"], ["backup-1", "5"], ["b2", "12345"]])
    lines = out.splitlines()
    assert lines[0] == "name     size"
    assert lines[1] == "backup-1 5"
    assert lines[2] == "b2       12345"
