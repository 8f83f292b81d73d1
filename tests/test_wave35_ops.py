"""Wave-35 operators: HLL distinct audit, Brier/Murphy decomposition,
component census, join-strategy advisor, and the sample-quantile audit.
Oracle-checked by q276-q280; these tests pin the non-oracle invariants
(sketch accuracy bounds, decomposition identity, census structure,
threshold flip, and sample-equals-exact degeneracy)."""

from pyspark.sql import functions as F

from esop_spark.operators import analytics, graph, sampling
from esop_spark.operators import text as text_ops


# --- HLL ----------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_chars long, lang string, text string"
    )


def test_hll_small_cardinality_exactish(spark):
    # 40 distinct terms over 256 registers: linear-counting regime, the
    # estimate should land within ~15% of truth
    words = " ".join(f"w{i}" for i in range(40))
    docs = _docs(spark, [("d1", "s", 0, "en", words)])
    r = text_ops.hll_distinct_audit(docs).collect()[0]
    assert r["n_exact"] == 40
    assert abs(r["err_ppm"]) < 150_000


def test_hll_mid_cardinality_bounded_error(spark):
    # 2000 distinct terms, m=256: canonical HLL error ~1.04/sqrt(256) = 6.5%;
    # allow 3 sigma
    rows = [
        (f"d{i}", "s", 0, "en", " ".join(f"t{i}_{j}" for j in range(100)))
        for i in range(20)
    ]
    r = text_ops.hll_distinct_audit(_docs(spark, rows)).collect()[0]
    assert r["n_exact"] == 2000
    assert abs(r["err_ppm"]) < 200_000


def test_hll_per_stratum_independent(spark):
    rows = [("a1", "sa", 0, "en", "x y z"), ("b1", "sb", 0, "en", "x y z w")]
    out = {r["stratum"]: r for r in
           text_ops.hll_distinct_audit(_docs(spark, rows)).collect()}
    assert out["sa"]["n_exact"] == 3 and out["sb"]["n_exact"] == 4


# --- Brier --------------------------------------------------------------------

def test_brier_decomposition_identity(spark):
    # brier == reliability - resolution + uncertainty + within_bin_var
    #          - 2*within_bin_cov  (exact; the 3-term textbook identity
    # is the constant-p-per-bin special case)
    rows = [(f"d{i}", "s", (i * 97) % 2500, "en" if i % 3 == 0 else "fr", "")
            for i in range(300)]
    r = analytics.brier_decomposition(_docs(spark, rows)).collect()[0]
    lhs = r["brier"]
    rhs = (r["reliability"] - r["resolution"] + r["uncertainty"]
           + r["within_bin_var"] - 2 * r["within_bin_cov"])
    assert abs(lhs - rhs) < 5e-6
    assert r["n_docs"] == 300
    assert 0 <= r["uncertainty"] <= 0.25 + 1e-9


def test_brier_perfect_forecaster(spark):
    # p=1 docs are 'en', p=0 docs are not: brier 0, resolution==uncertainty
    rows = [(f"a{i}", "s", 2000, "en", "") for i in range(50)] + [
        (f"b{i}", "s", 0, "fr", "") for i in range(50)
    ]
    r = analytics.brier_decomposition(_docs(spark, rows)).collect()[0]
    assert r["brier"] == 0.0
    assert abs(r["resolution"] - r["uncertainty"]) < 1e-9
    assert r["reliability"] == 0.0


# --- component census -----------------------------------------------------------

def test_component_census_shapes(spark):
    # two triangles and one isolated edge: census {3: 2, 2: 1}
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src bigint, dst bigint",
    )
    out = {r["component_size"]: r["n_components"] for r in
           graph.component_census(e).collect()}
    assert out == {3: 2, 2: 1}


def test_coorder_edges_min_threshold(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)],
        "l_orderkey bigint, l_partkey bigint",
    )
    pairs = sorted(map(tuple, graph.coorder_edges_min(li, 2).collect()))
    assert pairs == [(10, 20)]  # (10,30) co-occurs once only


# --- join advisor ---------------------------------------------------------------

def test_join_advisor_threshold_flip(spark):
    big = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("x" * 100).alias("pad")
    )
    small = spark.range(0, 10).select(F.col("id").alias("k"))
    out = {r["join_edge"]: r for r in analytics.join_advisor(
        {"big": big, "small": small},
        [("big", "small")],
        broadcast_bytes=1000,
    ).collect()}
    r = out["big*small"]
    assert r["strategy"] == "broadcast_right"
    assert r["est_shuffle_bytes"] == 0
    # tighten the threshold below the small side: flips to shuffle
    out2 = analytics.join_advisor(
        {"big": big, "small": small}, [("big", "small")], broadcast_bytes=10
    ).collect()[0]
    assert out2["strategy"] == "shuffle_merge"
    assert out2["est_shuffle_bytes"] == (
        out2["left_bytes"] + out2["right_bytes"]
    )


def test_join_advisor_byte_model(spark):
    t = spark.createDataFrame([(1, "abc")], "k long, s string")
    r = analytics.join_advisor({"t": t}, [("t", "t")]).collect()[0]
    # 8 bytes for k + len("abc") = 11
    assert r["left_bytes"] == 11 and r["right_bytes"] == 11


# --- sample quantile audit --------------------------------------------------------

def _orders(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "o_orderkey bigint, o_totalprice double",
    )


def test_sqa_sample_covers_all_when_k_large(spark):
    # k >= n: the sample IS the population, so err_ppm == 0 at every q
    vals = [(i * 37) % 1000 + 1 for i in range(200)]
    out = sampling.sample_quantile_audit(
        _orders(spark, vals), k=1024
    ).collect()
    assert len(out) == 4
    assert all(r["err_ppm"] == 0 for r in out)
    assert all(r["exact_cents"] == r["sample_cents"] for r in out)


def test_sqa_exact_rank_selection(spark):
    # 11 values 100..1100: type-1 median (q=500) is rank 500*10//1000+1 = 6
    vals = [100 * (i + 1) for i in range(11)]
    out = {r["q_milli"]: r for r in sampling.sample_quantile_audit(
        _orders(spark, vals), k=1024
    ).collect()}
    assert out[500]["exact_cents"] == 600 * 100
    assert out[250]["exact_cents"] == 300 * 100  # rank 250*10//1000+1 = 3
