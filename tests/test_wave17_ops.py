"""Wave-17 operators: vocabulary tail health, JL projection audit.
Oracle-checked by q191–q192."""

from esop_spark.operators import similarity
from esop_spark.operators import text as text_ops


def test_vocab_tail_hapax_and_head(spark):
    # source s: 'a' x10, 'b' x5, then 5 hapaxes -> vocab 7, hapax 5
    docs = spark.createDataFrame(
        [(1, "s", " ".join(["a"] * 10 + ["b"] * 5 + ["u1", "u2", "u3", "u4", "u5"]))],
        ["doc_id", "source", "text"],
    )
    out = text_ops.vocab_tail_report(docs, head_k=2).collect()[0]
    assert out["vocab_size"] == 7
    assert out["n_tokens"] == 20
    assert out["n_hapax"] == 5
    assert out["hapax_ppm"] == 5 * 1_000_000 // 7
    # top-2 mass = 10 + 5
    assert out["head_mass_ppm"] == 15 * 1_000_000 // 20


def test_vocab_tail_head_tie_is_mass_exact(spark):
    # four tokens all with count 3; head_k=2 -> head mass = 6 regardless
    # of which two tied tokens are "chosen"
    docs = spark.createDataFrame(
        [(1, "s", " ".join(["a"] * 3 + ["b"] * 3 + ["c"] * 3 + ["d"] * 3))],
        ["doc_id", "source", "text"],
    )
    out = text_ops.vocab_tail_report(docs, head_k=2).collect()[0]
    assert out["head_mass_ppm"] == 6 * 1_000_000 // 12


def test_vocab_tail_small_vocab_saturates(spark):
    docs = spark.createDataFrame(
        [(1, "s", "x y")], ["doc_id", "source", "text"]
    )
    out = text_ops.vocab_tail_report(docs, head_k=10).collect()[0]
    assert out["head_mass_ppm"] == 1_000_000  # vocab < k -> whole corpus


def test_jl_audit_identity_when_projection_preserves(spark):
    # vectors that live in the plane spanned by the first projections
    # still incur SOME error; just pin determinism and bounds
    emb = spark.createDataFrame(
        [(i, [((i * 13 + d * 7) % 11 - 5) / 5.0 for d in range(64)]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    a = similarity.jl_projection_audit(emb, proj_planes=16, max_docs=20).collect()[0]
    b = similarity.jl_projection_audit(emb, proj_planes=16, max_docs=20).collect()[0]
    assert a == b  # deterministic
    assert a["n_pairs"] == 20 * 19 // 2
    assert 0.0 <= a["mean_abs_err"] <= a["max_abs_err"] <= 2.0


def test_jl_audit_more_planes_less_error(spark):
    emb = spark.createDataFrame(
        [(i, [((i * 29 + d * 3) % 17 - 8) / 8.0 for d in range(64)]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    few = similarity.jl_projection_audit(emb, proj_planes=4, max_docs=30).collect()[0]
    many = similarity.jl_projection_audit(emb, proj_planes=32, max_docs=30).collect()[0]
    assert many["mean_abs_err"] < few["mean_abs_err"]
