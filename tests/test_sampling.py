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
