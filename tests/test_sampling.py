"""Deterministic sampling: content-hash decisions must be invariant to
partitioning/layout (the property Spark's df.sample lacks) and independent
across seeds."""

from pyspark.sql import functions as F

from esop_spark.operators import sampling


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def test_hash_sample_invariant_to_partitioning(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.3, F.col("doc_id")).collect()}
    b = {
        r["doc_id"]
        for r in sampling.hash_sample(
            docs.repartition(13, "lang"), 0.3, F.col("doc_id")
        ).collect()
    }
    assert a == b
    assert 0.15 < len(a) / 400 < 0.45  # ~rate, loose bound


def test_hash_sample_seeds_uncorrelated(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.5, F.col("doc_id"), "s0").collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(docs, 0.5, F.col("doc_id"), "s1").collect()}
    assert a != b
    # independent halves overlap in roughly a quarter of the corpus
    assert 0.1 < len(a & b) / 400 < 0.4


def test_stratified_rates_respected(spark):
    docs = _docs(spark)
    got = sampling.stratified_sample(
        docs, "lang", {"0": 1.0, "1": 0.0}, F.col("doc_id"), default_rate=0.5
    ).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["0"] == 134  # every '0' row kept (ids 0,3,...,399)
    assert "1" not in by_lang
    assert 30 < by_lang["2"] < 103  # ~half of 133


def test_sample_k_per_stratum_exact_k_and_deterministic(spark):
    docs = _docs(spark)
    s1 = sampling.sample_k_per_stratum(docs, "lang", 7, F.col("doc_id"))
    s2 = sampling.sample_k_per_stratum(
        docs.repartition(9), "lang", 7, F.col("doc_id")
    )
    rows1 = sorted((r["lang"], r["doc_id"]) for r in s1.collect())
    rows2 = sorted((r["lang"], r["doc_id"]) for r in s2.collect())
    assert rows1 == rows2
    counts = {}
    for lang, _ in rows1:
        counts[lang] = counts.get(lang, 0) + 1
    assert counts == {"0": 7, "1": 7, "2": 7}


def test_skewed_stratum_spreads_and_stays_exact(spark):
    """One stratum holds 90% of rows — the 100 TB hot-language shape. The
    distributed ranking must (a) agree exactly with the naive per-stratum
    window, (b) be layout-invariant, and (c) never sort a whole stratum in
    one task (no Window.partitionBy(stratum) over the full data in the
    plan)."""
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "hot").otherwise("cold").alias("lang"),
    )
    got = sampling.sample_k_per_stratum(docs, "lang", 40, F.col("doc_id"))
    # (a) exactness: naive single-window reference computed inline
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        sampling.sample_bucket(F.col("doc_id")).asc(),
        F.col("doc_id").cast("string").asc(),
    )
    ref = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 40)
        .drop("_rn")
    )
    assert sorted((r["lang"], r["doc_id"]) for r in got.collect()) == sorted(
        (r["lang"], r["doc_id"]) for r in ref.collect()
    )
    # (b) layout invariance
    got2 = sampling.sample_k_per_stratum(
        docs.repartition(17, "doc_id"), "lang", 40, F.col("doc_id")
    )
    assert sorted((r["lang"], r["doc_id"]) for r in got2.collect()) == sorted(
        (r["lang"], r["doc_id"]) for r in got.collect()
    )
    # (c) plan shape: every window partitions on (_pid, stratum) or runs
    # over the tiny offsets relation — never a bare [lang] spec over the
    # full input (ignore the offsets window, whose input is <= P rows/stratum)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    bare = [
        ln
        for ln in plan.splitlines()
        if re.search(r"row_number\(\).*partition.*\blang\b", ln, re.I)
        and "_pid" not in ln
    ]
    assert bare == [], f"per-stratum single-task window found:\n{bare}"


def test_mixture_resample_distributed_matches_naive(spark):
    """mixture_resample through the distributed rank must equal the naive
    windowed construction on a skewed corpus."""
    docs = spark.range(1200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "en").otherwise("fr").alias("lang"),
    )
    weights = {"en": 500_000, "fr": 500_000}
    got = sampling.mixture_resample(docs, "lang", weights, F.col("doc_id"))
    got_r = sampling.mixture_resample(
        docs.repartition(23), "lang", weights, F.col("doc_id")
    )
    a = sorted((r["lang"], r["doc_id"]) for r in got.collect())
    b = sorted((r["lang"], r["doc_id"]) for r in got_r.collect())
    assert a == b
    by_lang = {}
    for lang, _ in a:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    # equal-weight mixture: keep = min over strata of n_s/w_s scaled — fr
    # is binding (200 rows), so both strata keep 200
    assert by_lang == {"en": 200, "fr": 200}


def test_temperature_resample_flattens_mixture(spark):
    from pyspark.sql import functions as F

    from esop_spark.operators import sampling

    # 800 'a' vs 50 'b': natural ratio 16:1, sqrt-flattened target 4:1
    docs = spark.range(850).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 800, "a").otherwise("b").alias("lang"),
    )
    rep = {r["lang"]: r for r in sampling.temperature_resample(
        docs, "lang", F.col("doc_id")
    ).collect()}
    # minority stratum is the binding one — kept ~whole (floors may shave 1)
    assert rep["b"]["n_kept"] in (49, 50)
    ratio = rep["a"]["n_kept"] / rep["b"]["n_kept"]
    assert 3.5 < ratio < 4.5  # ~sqrt(16) = 4, floors allowed
    assert rep["a"]["n_before"] == 800


def test_temperature_weights_isqrt_exact():
    import math

    from esop_spark.operators import sampling

    w = sampling.temperature_weights({"x": 9, "y": 16}, alpha=0.5)
    assert w == {"x": math.isqrt(9_000_000), "y": 4000}


def test_score_weighted_sample_extremes_and_determinism(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 0).when(F.col("id") < 200, 100).otherwise(50)
        .cast("bigint").alias("score"),
    )
    kept = sampling.score_weighted_sample(docs, F.col("score"), F.col("doc_id"))
    rows = {r["doc_id"] for r in kept.collect()}
    assert not any(i in rows for i in range(100))        # p=0 drops all
    assert all(i in rows for i in range(100, 200))       # p=1 keeps all
    mid = sum(1 for i in range(200, 500) if i in rows)
    assert 100 < mid < 200                               # p=0.5 ~ half
    again = {
        r["doc_id"]
        for r in sampling.score_weighted_sample(
            docs.repartition(13), F.col("score"), F.col("doc_id")
        ).collect()
    }
    assert again == rows


def test_validate_key_rejects_duplicate_keys(spark):
    """Survivor-semi-join precondition (round-8 advice): a repeated key
    would return MORE than k rows per stratum; validate_key=True raises
    instead of silently over-returning."""
    import pytest

    dup = spark.createDataFrame(
        [(i % 3, i % 5) for i in range(30)], "s int, k int"
    )
    with pytest.raises(ValueError, match="key is not unique"):
        sampling.sample_k_per_stratum(
            dup, "s", 2, F.col("k"), validate_key=True
        )
    with pytest.raises(ValueError, match="key is not unique"):
        sampling.mixture_resample(
            dup.withColumn("s", F.col("s").cast("string")),
            "s",
            {"0": 500_000, "1": 500_000},
            F.col("k"),
            validate_key=True,
        )
    # unique keys pass the check and still return exactly k per stratum
    uniq = spark.createDataFrame(
        [(i % 3, i) for i in range(30)], "s int, k int"
    )
    got = sampling.sample_k_per_stratum(
        uniq, "s", 2, F.col("k"), validate_key=True
    )
    by_s = {}
    for r in got.collect():
        by_s[r["s"]] = by_s.get(r["s"], 0) + 1
    assert by_s == {0: 2, 1: 2, 2: 2}
