"""Wave-9 operators: surprisal-span detector, table profiler, join
cardinality audit. Oracle-checked by q154–q156."""

from pyspark.sql import functions as F

from esop_spark.operators import analytics
from esop_spark.operators import text as text_ops


# --- surprisal_spans --------------------------------------------------------

def test_surprisal_span_locates_planted_junk(spark):
    common = "the cat sat on the mat and then"  # 8 tokens, repeated corpus-wide
    rows = [(i, common) for i in range(20)]
    # doc 99: common prefix, then 8 tokens of unique gibberish
    rows.append((99, common + " zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text_ops.surprisal_spans(docs, window=8).collect()}
    # the junk span starts right after the 8-token common prefix
    assert out[99]["worst_start"] == 9
    assert out[99]["worst_mean_nll"] > out[0]["worst_mean_nll"]


def test_surprisal_spans_tiebreak_earliest(spark):
    # uniform doc: every window has the same sum -> earliest wins
    docs = spark.createDataFrame(
        [(0, "w w w w w w w w w w")], ["doc_id", "text"]
    )
    out = text_ops.surprisal_spans(docs, window=4).collect()[0]
    assert out["worst_start"] == 1
    assert out["n_tokens"] == 10


def test_surprisal_spans_short_docs_drop(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c d e f g h i")], ["doc_id", "text"]
    )
    out = text_ops.surprisal_spans(docs, window=8).collect()
    assert {r["doc_id"] for r in out} == {1}


# --- table_profile ----------------------------------------------------------

def test_table_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (4, "y")], ["id", "val"]
    )
    out = {r["column_name"]: r for r in analytics.table_profile(df).collect()}
    assert out["id"]["n_rows"] == 4
    assert out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["val"]["n_nulls"] == 1
    assert out["val"]["n_distinct"] == 2
    assert out["val"]["min_val"] == "x" and out["val"]["max_val"] == "y"


def test_table_profile_one_shuffle_row(spark):
    df = spark.createDataFrame([(i, f"s{i % 3}") for i in range(100)], ["a", "b"])
    prof = analytics.table_profile(df)
    assert prof.count() == 2  # one row per column
    # lexicographic string min: "0" < "1" < ... for ints as strings
    out = {r["column_name"]: r for r in prof.collect()}
    assert out["a"]["min_val"] == "0"
    assert out["a"]["max_val"] == "99"  # string order: "99" > "98" > "9"


# --- join_cardinality_audit -------------------------------------------------

def test_join_cardinality_exact_output_size(spark):
    left = spark.createDataFrame(
        [(1,), (2,), (3,), (3,)], ["k"]
    )  # key 3 twice
    right = spark.createDataFrame(
        [(2,), (2,), (3,), (4,)], ["k2"]
    )
    out = analytics.join_cardinality_audit(left, right, "k", "k2").collect()[0]
    assert out["n_left_rows"] == 4 and out["n_right_rows"] == 4
    assert out["n_left_keys"] == 3 and out["n_right_keys"] == 3
    assert out["n_matched_keys"] == 2  # keys 2 and 3
    # exact join size: key2 -> 1*2, key3 -> 2*1 => 4 rows
    assert out["est_rows"] == 4
    assert out["max_fanout"] == 2
    # verify against the real join
    assert left.join(right, left["k"] == right["k2"]).count() == 4


def test_join_cardinality_flags_hot_key_blowup(spark):
    left = spark.createDataFrame([(7,)] * 1000, ["k"])
    right = spark.createDataFrame([(7,)] * 1000, ["k2"])
    out = analytics.join_cardinality_audit(left, right, "k", "k2").collect()[0]
    assert out["est_rows"] == 1_000_000
    assert out["max_fanout"] == 1_000_000


# --- minhash index lifecycle ------------------------------------------------

def test_minhash_index_round_trip(spark, tmp_path):
    from esop_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon w{i} x{i} y{i}") for i in range(12)],
        ["doc_id", "text"],
    )
    sigs = dedup.minhash_signatures(docs, num_hashes=8)
    path = str(tmp_path / "mh_index")
    dedup.save_minhash_index(sigs, path)
    back = dedup.load_minhash_index(spark, path)
    assert sorted(back.columns) == sorted(sigs.columns)
    a = {tuple(r) for r in sigs.select(*sorted(sigs.columns)).collect()}
    b = {tuple(r) for r in back.select(*sorted(sigs.columns)).collect()}
    assert a == b


# --- blocklist_scan ---------------------------------------------------------

def test_blocklist_counts_and_position(spark):
    docs = spark.createDataFrame(
        [(0, "clean text only here"),
         (1, "bad word bad again"),
         (2, "one ugly time")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text_ops.blocklist_scan(
        docs, ("bad", "ugly")).collect()}
    assert out[0]["n_hits"] == 0 and not out[0]["flagged"]
    assert out[0]["first_hit_pos"] == 0
    assert out[1]["n_hits"] == 2 and out[1]["n_distinct_terms"] == 1
    assert out[1]["first_hit_pos"] == 1
    assert out[2]["first_hit_pos"] == 2 and out[2]["flagged"]


# --- weighted histogram quantiles -------------------------------------------

def test_weighted_quantiles_shift_toward_mass(spark):
    # 99 docs of length 10, 1 doc of length 1000: by count the median is
    # 10; by token mass the 1000-token doc holds >50% of tokens
    rows = [(i, 10) for i in range(99)] + [(99, 1000)]
    df = spark.createDataFrame(rows, ["id", "v"])
    by_count = analytics.histogram_quantiles(
        df, F.col("v"), bins=1000, quantiles_ppm=(500_000,)).collect()[0]
    by_mass = analytics.histogram_quantiles(
        df, F.col("v"), bins=1000, quantiles_ppm=(500_000,),
        weight=F.col("v")).collect()[0]
    assert by_count["approx_value"] <= 11
    assert by_mass["approx_value"] >= 999
    assert by_mass["n_rows"] == 99 * 10 + 1000  # total weight
