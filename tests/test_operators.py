"""Operator semantics on small hand-built relations (reference-derived cases:
README worked example shapes, overhang selection, rename validation,
latest-wins, dedup recall)."""

from pyspark.sql import functions as F

from esop_spark.operators import commitlog, dedup, diff, entities, manifest, retention, similarity


def _entries(spark, rows):
    return spark.createDataFrame(
        rows, "backup_name string, backup_ts long, keyspace string, "
              "table_name string, object_key string, size long, hash string"
    )


def test_list_backups_reclaimable(spark):
    # two backups sharing k2: only unique objects are reclaimable
    e = _entries(spark, [
        ("b1", 1000, "ks", "t", "k1", 10, "h1"),
        ("b1", 1000, "ks", "t", "k2", 20, "h2"),
        ("b2", 2000, "ks", "t", "k2", 20, "h2"),
        ("b2", 2000, "ks", "t", "k3", 5, "h3"),
    ])
    got = {r["backup_name"]: r for r in manifest.list_backups(e).collect()}
    assert got["b1"]["size_bytes"] == 30 and got["b1"]["reclaimable_bytes"] == 10
    assert got["b2"]["size_bytes"] == 25 and got["b2"]["reclaimable_bytes"] == 5
    totals = manifest.totals(e).collect()[0]
    assert totals["total_files"] == 3 and totals["total_size"] == 35


def test_removable_entries(spark):
    e = _entries(spark, [
        ("b1", 1000, "ks", "t", "k1", 10, "h1"),
        ("b1", 1000, "ks", "t", "k2", 20, "h2"),
        ("b2", 2000, "ks", "t", "k2", 20, "h2"),
    ])
    rem = manifest.removable_entries(e, "b1").collect()
    assert [(r["object_key"], r["size"]) for r in rem] == [("k1", 10)]


def test_restore_diff_three_legs(spark):
    mf = spark.createDataFrame(
        [("f1", 10, "h1"), ("f2", 20, "h2"), ("f3", 30, "h3")],
        "object_key string, size long, hash string",
    )
    local = spark.createDataFrame(
        [("f2", 20, "h2"), ("f3", 30, "CORRUPT"), ("f9", 9, "h9")],
        "rel_file string, size long, hash string",
    )
    got = {(r["action"], r["rel_file"]) for r in diff.restore_diff(mf, local).collect()}
    assert got == {("download", "f1"), ("delete", "f9"), ("mismatch", "f3")}


def test_commitlog_overhang(spark):
    logs = spark.createDataFrame(
        [(f"cl-{i}", i * 100, 1) for i in range(10)], "name string, ts long, size long"
    )
    got = sorted(r["ts"] for r in commitlog.commitlog_window(logs, 200, 450).collect())
    # in-window: 200,300,400; overhang: first ts > 450 → 500
    assert got == [200, 300, 400, 500]


def test_latest_manifest_per_prefix(spark):
    m = spark.createDataFrame(
        [("s1-sv1-100", "s1", "sv1", 100, 1), ("s1-sv1-200", "s1", "sv1", 200, 1),
         ("s2-sv1-50", "s2", "sv1", 50, 1)],
        "backup_name string, snapshot string, schema_version string, ts long, size long",
    )
    got = {r["snapshot"]: r["ts"] for r in retention.latest_manifest_per_prefix(m).collect()}
    assert got == {"s1": 200, "s2": 50}


def test_rename_remap(spark):
    e = _entries(spark, [
        ("b1", 1, "ks0", "t1", "k1", 1, "h"),
        ("b1", 1, "ks0", "t2", "k2", 1, "h"),
    ])
    got = {(r["keyspace"], r["table_name"]) for r in
           entities.rename_remap(e, [("ks0", "t1", "ks9", "t9")]).collect()}
    assert got == {("ks9", "t9"), ("ks0", "t2")}


def test_minhash_lsh_finds_planted_neardups(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(59)) + " zzz"
    far = " ".join(f"v{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """500 near-identical boilerplate docs — the degenerate bucket every
    100 TB corpus contains. Uncapped band buckets would emit ~500²/2 ≈ 125k
    candidate pairs; the hot-bucket star cap must bound candidates to
    O(bands · B) while keeping every doc attached to its duplicate cluster
    via the anchor edges."""
    boiler = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(500)] + [(1000, " ".join(f"v{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    candidates, base = dedup._lsh_candidates(
        docs, num_hashes=32, bands=8, n=3, text_col="text", id_col="doc_id",
        hash_family="xxhash64", max_bucket=50,
    )
    n_cand = candidates.count()
    base.unpersist()
    # star pairing: each of 8 bands emits <= 499 anchor pairs, distinct
    # collapses them (identical docs share every bucket) — far below B²/2
    assert n_cand <= 8 * 499
    assert n_cand >= 499  # every non-anchor doc still reaches the anchor
    # cluster connectivity survives the cap: all 500 in one cluster
    clusters = dedup.dedup_clusters(candidates)
    sizes = {r["cluster_size"] for r in clusters.collect()}
    assert sizes == {500}


def test_lsh_cap_inactive_below_threshold_is_identical(spark):
    """With bucket sizes under max_bucket the guarded join must emit exactly
    the all-pairs candidates (the sf0.01 oracle relies on this)."""
    base_txt = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(59)) + " zzz"
    far = " ".join(f"v{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, base_txt), (1, near), (2, far)], "doc_id long, text string"
    )
    capped, b1 = dedup._lsh_candidates(
        docs, 32, 8, 3, "text", "doc_id", "xxhash64", max_bucket=100
    )
    uncapped, b2 = dedup._lsh_candidates(
        docs, 32, 8, 3, "text", "doc_id", "xxhash64", max_bucket=10**9
    )
    got = sorted((r["id_a"], r["id_b"]) for r in capped.collect())
    ref = sorted((r["id_a"], r["id_b"]) for r in uncapped.collect())
    b1.unpersist(); b2.unpersist()
    assert got == ref and (0, 1) in got


def test_ngram_jaccard_df_cap(spark):
    # Every doc shares the same hot boilerplate prefix; docs 0/1 are near-dups
    # beyond it. With max_df=2 the boilerplate shingles leave the candidate
    # index (df=4 > 2), yet the (0,1) pair is still found via its rare shared
    # shingles AND its jaccard counts the boilerplate (exact verification).
    boiler = "lorem ipsum dolor sit amet consectetur"
    a = boiler + " " + " ".join(f"w{i}" for i in range(30))
    b = boiler + " " + " ".join(f"w{i}" for i in range(29)) + " zzz"
    docs = spark.createDataFrame(
        [(0, a), (1, b),
         (2, boiler + " " + " ".join(f"x{i}" for i in range(30))),
         (3, boiler + " " + " ".join(f"y{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=2).collect()
    key = lambda rows: sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rows)
    assert key(capped) == key(uncapped)
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(0, 1)]


def test_containment_asymmetric_finds_short_in_long(spark):
    """A short doc embedded in a 6×-longer one: jaccard ≈ 0.17 (below any
    symmetric-LSH radar) but containment = 1.0 — the asymmetric bottom-k
    probe candidates must surface it, while unrelated docs produce no
    verified pair."""
    short = " ".join(f"w{i}" for i in range(20))
    long_doc = short + " " + " ".join(f"x{i}" for i in range(100))
    other = " ".join(f"y{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(0, short), (1, long_doc), (2, other)], "doc_id long, text string"
    )
    got = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in got] == [(0, 1, 1.0)]


def test_containment_tiny_doc_adaptive_min_hits(spark):
    """A doc with fewer shingles than min_hits must still be findable —
    the hit threshold adapts to min(min_hits, n_sh)."""
    tiny = "a b c"  # exactly one 3-shingle
    big = "a b c " + " ".join(f"z{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(0, tiny), (1, big)], "doc_id long, text string"
    )
    got = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in got] == [(0, 1, 1.0)]


def test_dedup_clusters_transitive_chain(spark):
    # 0-1, 1-2, 2-3 chain (diameter 3 → needs >1 propagation round) plus a
    # separate 10-11 pair; min label must flow end-to-end through the chain.
    pairs = spark.createDataFrame(
        [(1, 2), (0, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = sorted(
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in dedup.dedup_clusters(pairs).collect()
    )
    assert got == [
        (0, 0, 4), (1, 0, 4), (2, 0, 4), (3, 0, 4), (10, 10, 2), (11, 10, 2),
    ]


def test_contamination_planted_overlap(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        # doc 1: shingles {abc,bcd,cde,def} all in train → 1.0
        # doc 3: {xyz...} none in train → 0.0
        # doc 5: "a b c x y z" → {abc, bcx, cxy, xyz} → 1/4
        [(1, "a b c d e f"), (3, "x y z w v u"), (5, "a b c x y z")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_sh"], r["n_contaminated"], r["contamination"])
        for r in dedup.contamination(train, test).collect()
    }
    assert got == {1: (4, 4, 1.0), 3: (4, 0, 0.0), 5: (4, 1, 0.25)}


def test_quantize_int8_known_vectors(spark):
    emb = spark.createDataFrame(
        [(0, [127.0, 0.0, -127.0]), (1, [0.0, 0.0, 0.0]), (2, [1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["n_dims"], r["scale_e9"], r["mse_e9"])
        for r in similarity.quantize_int8(emb).collect()
    }
    # vec 0: scale=1.0, codes reconstruct exactly → mse 0
    assert got[0] == (3, 1_000_000_000, 0)
    # zero vector: scale 0, codes 0, mse 0
    assert got[1] == (3, 0, 0)
    # vec 2: scale=1/127; 0.5/scale=63.5 rounds half-up to 64 → err=0.5-64/127
    scale = 1.0 / 127.0
    mse = ((0.5 - 64 * scale) ** 2) / 2
    assert got[2] == (2, int(scale * 1e9), int(mse * 1e9))


def test_tfidf_top_terms_ranking(spark):
    docs = spark.createDataFrame(
        [
            (0, "en", "apple apple banana"),
            (1, "en", "apple cherry"),
            (2, "fr", "banana banana banana"),
        ],
        "doc_id long, lang string, text string",
    )
    from esop_spark.operators.text import tfidf_top_terms

    rows = tfidf_top_terms(docs, k=2).collect()
    top = {(r["lang"], r["rank"]): (r["term"], r["tf"], r["df"]) for r in rows}
    # en: apple tf=3 df=2 → 3·ln(1.5); banana/cherry tf=1 — apple wins
    assert top[("en", 1)] == ("apple", 3, 2)
    # fr: banana tf=3 df=2 → ln(1.5)·3 tops the group
    assert top[("fr", 1)] == ("banana", 3, 2)


def test_simhash_identical_docs_distance_zero(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, t), (1, t), (2, "totally different words here entirely unrelated content")],
        "doc_id long, text string",
    )
    pairs = dedup.simhash_pairs(docs, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(0, 1, 0)]


def test_cosine_and_ann(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    pairs = similarity.cosine_pairs(emb, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in pairs] == [(0, 1, 1.0)]
    topk = similarity.ann_topk(emb, query_ids=[0], k=1).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in topk] == [(0, 1)]


def test_dedup_exact_groups(spark):
    docs = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    from esop_spark.operators.text import tokenset_key
    got = {(r["canonical_id"], r["n_dups"]) for r in
           dedup.dedup_exact(docs, tokenset_key("text")).collect()}
    assert got == {(1, 2), (3, 1)}


def test_lsh_recall_audit_planted_pairs(spark):
    # 40 unrelated docs + one planted near-dup pair; rate=1.0 keeps all
    # docs, so the audit's ground truth must contain exactly the planted
    # pair and the production banding must find it.
    rows = [(i, " ".join(f"u{i}_{j}" for j in range(60))) for i in range(40)]
    base = " ".join(f"w{j}" for j in range(60))
    near = " ".join(f"w{j}" for j in range(59)) + " zzz"
    rows += [(100, base), (101, near)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.lsh_recall_audit(docs, sample_rate=1.0, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 42
    assert r["n_true_pairs"] == 1
    assert r["n_found"] == 1
    assert r["recall"] == 1.0
    assert r["precision"] is not None and 0 < r["precision"] <= 1.0


def test_lsh_recall_audit_sampling_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(30))) for i in range(50)],
        "doc_id long, text string",
    )
    a = dedup.lsh_recall_audit(docs, sample_rate=0.4).collect()[0]
    b = dedup.lsh_recall_audit(docs, sample_rate=0.4).collect()[0]
    assert a["n_docs"] == b["n_docs"] > 0
