"""Corpus snapshot diff + incremental worklist."""

from pyspark.sql import functions as F

from esop_spark.operators import versioning


def _corpora(spark):
    v1 = spark.createDataFrame(
        [(0, "same text"), (1, "will change"), (2, "will vanish")],
        "doc_id long, text string",
    )
    v2 = spark.createDataFrame(
        [(0, "same text"), (1, "has changed"), (3, "brand new")],
        "doc_id long, text string",
    )
    return v1, v2


def test_corpus_diff_statuses(spark):
    v1, v2 = _corpora(spark)
    got = {r["doc_id"]: r["status"] for r in versioning.corpus_diff(v1, v2).collect()}
    assert got == {0: "unchanged", 1: "changed", 2: "removed", 3: "added"}


def test_diff_report_counts(spark):
    v1, v2 = _corpora(spark)
    rep = {r["status"]: r for r in versioning.diff_report(v1, v2).collect()}
    assert {s: r["n_docs"] for s, r in rep.items()} == {
        "unchanged": 1, "changed": 1, "removed": 1, "added": 1,
    }
    assert rep["added"]["min_id"] == 3


def test_incremental_work_is_added_plus_changed(spark):
    v1, v2 = _corpora(spark)
    work = versioning.incremental_work(v1, v2).collect()
    assert {r["doc_id"] for r in work} == {1, 3}
    # worklist rows come from v2 (carry the NEW text)
    assert {r["text"] for r in work} == {"has changed", "brand new"}
