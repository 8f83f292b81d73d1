"""Round-3 operators: sequence packing, chunk-dedup rewrite, fuzzy title
join, matryoshka truncation eval, int8 retrieval recall."""

import pytest
from pyspark.sql import functions as F

from esop_spark.operators import dedup, similarity, text as text_ops
from esop_spark.operators.splits import pack_sequences, sequence_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# --- pack_sequences ---------------------------------------------------------

def test_pack_sequences_splits_straddlers(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 3)], "doc_id bigint, n bigint"
    )
    segs = {
        (r.seq_id, r.doc_id): (r.seg_start, r.seg_len, r.is_head)
        for r in pack_sequences(df, "doc_id", "n", ctx=8).collect()
    }
    # layout: doc1 [0,5) doc2 [5,15) doc3 [15,18); ctx=8 cuts at 8, 16
    assert segs[(0, 1)] == (0, 5, True)
    assert segs[(0, 2)] == (5, 3, True)
    assert segs[(1, 2)] == (0, 7, False)  # straddler carry-in
    assert segs[(1, 3)] == (7, 1, True)
    assert segs[(2, 3)] == (0, 2, False)
    assert len(segs) == 5


def test_sequence_report_conserves_tokens_and_fills(spark):
    df = spark.createDataFrame(
        [(i, 7 + (i % 5)) for i in range(1, 101)], "doc_id bigint, n bigint"
    )
    total = df.agg(F.sum("n")).collect()[0][0]
    rep = sequence_report(df, "doc_id", "n", ctx=64).collect()
    assert sum(r.fill_tokens for r in rep) == total
    # every sequence except the last is exactly full
    full = sorted(rep, key=lambda r: r.seq_id)[:-1]
    assert all(r.fill_tokens == 64 and r.fill_frac == 1.0 for r in full)
    # heads + carry-ins account for all segments
    assert all(r.n_heads + r.n_carryin == r.n_segments for r in rep)
    # a sequence has at most one carry-in (one straddler can enter)
    assert all(r.n_carryin <= 1 for r in rep)


def test_pack_sequences_zero_token_docs_dropped(spark):
    df = spark.createDataFrame([(1, 0), (2, 4)], "doc_id bigint, n bigint")
    rows = pack_sequences(df, "doc_id", "n", ctx=8).collect()
    assert {r.doc_id for r in rows} == {2}


def test_pack_sequences_rejects_bad_ctx(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id bigint, n bigint")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n", ctx=0)


# --- chunk_dedup_rewrite ----------------------------------------------------

def test_chunk_dedup_rewrite_first_writer_wins(spark):
    a = "w1 w2 w3 w4"
    b = "x1 x2 x3 x4"
    docs = _docs(
        spark,
        [
            (1, f"{a} {b}", "en"),   # owns both chunks
            (2, f"{b} {a}", "en"),   # both chunks already seen -> empty
            (3, f"{a} y1 y2 y3 y4", "en"),  # keeps only its new tail
        ],
    )
    out = {
        r.doc_id: r
        for r in text_ops.chunk_dedup_rewrite(docs, chunk_tokens=4).collect()
    }
    assert out[1].n_tokens_after == 8 and out[1].kept_frac == 1.0
    assert out[2].n_tokens_after == 0
    assert out[3].n_tokens_after == 4
    # doc2's rebuilt text is the empty string
    import hashlib

    assert out[2].text_hash == hashlib.md5(b"").hexdigest()
    assert out[3].text_hash == hashlib.md5(b"y1 y2 y3 y4").hexdigest()


def test_chunk_dedup_rewrite_unique_docs_untouched(spark):
    docs = _docs(
        spark, [(i, " ".join(f"t{i}_{j}" for j in range(10)), "en") for i in range(5)]
    )
    rows = text_ops.chunk_dedup_rewrite(docs, chunk_tokens=4).collect()
    assert all(r.n_tokens_after == r.n_tokens_before for r in rows)
    assert all(r.kept_frac == 1.0 for r in rows)


# --- fuzzy_title_pairs ------------------------------------------------------

def test_fuzzy_title_pairs_blocked_match(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta tail1", "en"),
            (2, "alpha beta gamma delra tail2", "en"),   # distance 1
            (3, "alpha completely different words x", "en"),  # same block, far
            (4, "omega beta gamma delta tail", "en"),    # different block
            (5, "alpha beta gamma delta tail3", "fr"),   # different lang
        ],
    )
    pairs = {
        (r.id_a, r.id_b): r.edit_distance
        for r in dedup.fuzzy_title_pairs(
            docs, title_tokens=4, max_distance=3
        ).collect()
    }
    assert pairs == {(1, 2): 1}


def test_fuzzy_title_pairs_hot_block_star_cap(spark):
    # 50 docs share a block; cap at 10 -> star pairs against anchor only
    docs = _docs(
        spark,
        [(i, f"hot title words v{i} tail{i}", "en") for i in range(1, 51)],
    )
    pairs = dedup.fuzzy_title_pairs(
        docs, title_tokens=4, max_distance=10, max_block=10
    ).collect()
    # anchor = min id = 1; every pair involves it
    assert all(r.id_a == 1 for r in pairs)
    assert len(pairs) == 49


# --- matryoshka_eval --------------------------------------------------------

def test_matryoshka_full_dim_is_perfect(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r.dim: r for r in similarity.matryoshka_eval(emb, dims=(4, 16)).collect()}
    assert out[16].pearson_corr == 1.0 and out[16].mean_abs_err == 0.0
    assert out[4].n_pairs == 39
    assert out[4].mean_abs_err > 0.0
    assert out[4].pearson_corr < 1.0


# --- quantized_ann_recall ---------------------------------------------------

def test_quantized_recall_bounds_and_high_fidelity(spark):
    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(32)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.quantized_ann_recall(emb, query_ids=[0, 1, 2], k=5).collect()
    assert len(out) == 3
    assert all(0.0 <= r.recall <= 1.0 for r in out)
    # int8 keeps ~7 bits of precision; recall@5 should be near-perfect
    assert sum(r.recall for r in out) / 3 >= 0.8


def test_int8_code_space_equals_reconstructed_space(spark):
    # cosine is scale-invariant: code-space top-k == reconstructed top-k
    import random

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-2, 2) for _ in range(16)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    codes = similarity.int8_codes(emb)
    approx = similarity._int8_ann_topk(codes, [0], k=5).collect()
    # reconstruct in python and verify ranking matches
    import math

    data = {r.vec_id: r.embedding for r in emb.collect()}

    def code(v):
        s = max(abs(x) for x in v) / 127.0
        return [round(x / s) for x in v] if s else [0] * len(v)

    q = code(data[0])
    scored = []
    for i, v in data.items():
        if i == 0:
            continue
        c = code(v)
        dot = sum(a * b for a, b in zip(q, c))
        cos = dot / (
            math.sqrt(sum(a * a for a in q)) * math.sqrt(sum(b * b for b in c))
        )
        scored.append((round(cos, 6), -i))
    expect = [-i for _, i in sorted(scored, reverse=True)[:5]]
    assert [r.neighbor_id for r in sorted(approx, key=lambda r: r.rank)] == expect
