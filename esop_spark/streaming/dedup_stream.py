"""Streaming MinHash-LSH near-duplicate candidate detection: online dedup
of an incoming document stream against everything seen so far.

The batch LSH (operators.dedup._lsh_candidates) banding is recomputed
stream-side as pure projections — per-row signature via
``with_minhash_signature`` (bit-identical to the batch aggregation) and the
same band-bucket hash — so a replayed corpus lands in the SAME buckets the
batch job would build. The stateful leg is keyed by (band, bucket); its
state is the bucket's member-id list, capped at ``max_bucket`` with the
batch operator's star-pairing degradation: once a bucket goes hot, new
members emit only their anchor edge (O(1) per arrival, cluster
connectivity preserved for downstream connected-components), and the state
collapses to the anchor alone — bounded forever after, no matter how much
boilerplate the crawl keeps sending.

Candidate pairs are exactly that — candidates. Verification (exact Jaccard
on shingles) stays a batch job over the emitted pair log, the same split
the batch pipeline uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from esop_spark.operators.dedup import (
    _band_buckets,
    simhash_chunks,
    with_minhash_signature,
    with_simhash_signature,
    with_weighted_minhash_signature,
)
from esop_spark.plans.barriers import pin_projection_barrier

LSH_OUTPUT = "band int, id_a bigint, id_b bigint"
LSH_DELTA = "band int, news array<bigint>, olds array<bigint>, star int"
LSH_STATE = "ids string, hot int"


def _lsh_fn_factory(max_bucket: int):
    """Stateful leg: per (band, bucket) group, ONE compact delta row per
    micro-batch — (news, olds, star) member arrays — never the pairs
    themselves. The r8 sf10 stream bench showed the drain dominated by
    candidate-pair rows (7.9M) emitted one-by-one through the Arrow state
    function (847 rows/s); Arrow volume is now O(members) per group and
    the O(pairs) expansion happens JVM-side (:func:`_expand_delta_pairs`),
    inside whole-stage codegen. State transitions are byte-identical to
    the previous pair-emitting version (same LSH_STATE schema and values,
    so existing checkpoints resume cleanly)."""
    def fn(key, pdfs, state: GroupState):
        import json as _json

        ids, hot = (
            (_json.loads(state.get[0]), int(state.get[1]))
            if state.exists
            else ([], 0)
        )
        known = set(ids)
        new_set = {int(i) for pdf in pdfs for i in pdf["did"].tolist()}
        new_set -= known
        if not new_set:
            return  # replayed members only: no state change, no output
        new = sorted(new_set)
        prior = ids
        if hot or len(ids) + len(new) > max_bucket:
            # star degradation (batch's oversized-bucket contract): the
            # expansion emits anchor edges only; state collapses to the
            # anchor — bounded forever after
            ids, hot, star = [min(prior + new)], 1, 1
        else:
            ids, star = sorted(new_set | known), 0
        state.update((_json.dumps(ids), hot))
        # fast path for the dominant group shape — a bucket seeing its
        # FIRST (single) member: no pair can exist, so skip the pandas
        # construction entirely. At sf10 the weighted stream's exchange
        # visits ~9M (band, bucket) keys, nearly all singletons; emitting
        # a delta row for each was measured at ~+110 s of pure per-group
        # overhead. (A lone-new-arrival HOT bucket still emits: the
        # expansion may owe a star/bridge edge against the old members.)
        if star == 0 and not prior and len(new) == 1:
            return
        yield pd.DataFrame(
            {
                "band": pd.Series([int(key[0])], dtype="int32"),
                "news": pd.Series([new], dtype="object"),
                "olds": pd.Series([prior], dtype="object"),
                "star": pd.Series([star], dtype="int32"),
            }
        )

    return fn


def _expand_delta_pairs(delta: DataFrame) -> DataFrame:
    """JVM-side pair expansion of the stateful leg's delta rows — exactly
    the pair set the state function used to emit row-by-row:

    - star = 0 (bucket under the cap): all within-``news`` pairs (a < b;
      ``news`` is sorted-distinct) plus every news × olds cross pair
      (min, max) — the batch pairwise contract.
    - star = 1 (hot bucket): anchor = min(news ∪ olds); one (anchor, m)
      edge per non-anchor arrival, plus — when the anchor is itself a new
      arrival smaller than every old member — one bridge edge to the old
      component's min. O(B) edges, connectivity preserved.

    One explode, whole-stage codegen, no Python in the pair loop.

    The anchor/min values are materialized ONCE per row and pinned behind
    a Generate barrier (plans.barriers) before the lambdas consume them:
    an expression referenced inside an element lambda is re-evaluated PER
    ELEMENT, so an inlined ``array_min(news)`` anchor turns a 25k-member
    hot bucket's star expansion into 625M array scans per delta row —
    measured 9 s → 124 s on the sf10 embedding stream drain. With the pin
    the lambdas see O(1) column references."""
    delta = pin_projection_barrier(
        delta,
        F.struct(
            F.array_min("news").alias("nm"), F.array_min("olds").alias("om")
        ),
        "mins",
        "band", "news", "olds", "star",
    )
    new_min, old_min = F.col("mins.nm"), F.col("mins.om")
    anchor = F.least(new_min, old_min)

    def edge(a, b):
        return F.struct(a.alias("a"), b.alias("b"))

    star_edges = F.concat(
        F.transform(
            F.filter("news", lambda m: m != anchor), lambda m: edge(anchor, m)
        ),
        # bridge: the condition is row-level; filter() keeps or drops the
        # one prebuilt element (old_min is NULL when olds is empty, but
        # that element is dropped before it surfaces)
        F.filter(
            F.array(edge(anchor, old_min)),
            lambda _: (F.size("olds") > 0) & (new_min < old_min),
        ),
    )
    pair_edges = F.flatten(
        F.transform(
            "news",
            lambda a: F.concat(
                F.transform(
                    F.filter("news", lambda b: b > a), lambda b: edge(a, b)
                ),
                F.transform(
                    "olds", lambda b: edge(F.least(a, b), F.greatest(a, b))
                ),
            ),
        )
    )
    return delta.select(
        "band",
        F.explode(
            F.when(F.col("star") == 1, star_edges).otherwise(pair_edges)
        ).alias("e"),
    ).select("band", F.col("e.a").alias("id_a"), F.col("e.b").alias("id_b"))


def lsh_candidate_stream(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming counterpart of the batch LSH candidate generation: input
    stream of (doc_id, text) rows; emits (band, id_a, id_b) candidate
    pairs as documents arrive, id_a < id_b. A full replay's distinct
    (id_a, id_b) set equals the batch ``_lsh_candidates`` pair set for
    buckets within ``max_bucket`` (exact-set parity is tested); oversized
    buckets degrade to the same anchor-star connectivity contract as the
    batch operator. State per (band, bucket) is bounded: member ids up to
    the cap, a single anchor after.

    **Pair-log contract — consumers must treat it as a SET** (``distinct()``
    before any per-pair counting). Two append-mode caveats make the raw log
    a superset of the batch pair set for oversized buckets: (1) a bucket
    that crosses ``max_bucket`` mid-stream has already emitted its pre-cap
    pairwise edges and then emits star edges; (2) after hot-collapse the
    state keeps only the anchor, so a document re-delivered later (source
    replays, at-least-once upstreams) re-emits its anchor edge. Both extras
    are edges WITHIN the bucket's connected component, so the intended
    consumer — connected-components clustering — is unaffected even
    without dedup; only pair-count statistics need the distinct()."""
    sig = with_minhash_signature(
        documents, num_hashes, n, text_col, id_col, hash_family
    )
    bb = _band_buckets(sig, num_hashes, bands, hash_family, id_col).select(
        F.col(id_col).alias("did"), "band", "bucket"
    )
    return _expand_delta_pairs(
        bb.groupBy("band", "bucket").applyInPandasWithState(
            _lsh_fn_factory(int(max_bucket)),
            outputStructType=LSH_DELTA,
            stateStructType=LSH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def weighted_lsh_candidate_stream(
    documents: DataFrame,
    num_hashes: int = 200,
    bands: int = 20,
    tf_cap: int = 10,
    hash_family: str = "xxhash64",
    max_bucket: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of the WEIGHTED MinHash candidate generation
    (dedup.weighted_minhash_lsh_pairs): online tf-multiset near-dup
    against everything seen so far, with the exact state machinery of
    :func:`lsh_candidate_stream` — only the signature differs (per-row
    replicated-element projection, ``with_weighted_minhash_signature``,
    bit-identical to the batch chain, so a replayed corpus lands in the
    batch job's (band, bucket) keys). Same pair-log SET contract and
    hot-bucket anchor-star degradation; verification (exact capped
    weighted Jaccard) stays a batch job over the emitted pair log, the
    same split as every LSH stream here."""
    sig = with_weighted_minhash_signature(
        documents, num_hashes, tf_cap, text_col, id_col, hash_family
    )
    bb = _band_buckets(sig, num_hashes, bands, hash_family, id_col).select(
        F.col(id_col).alias("did"), "band", "bucket"
    )
    return _expand_delta_pairs(
        bb.groupBy("band", "bucket").applyInPandasWithState(
            _lsh_fn_factory(int(max_bucket)),
            outputStructType=LSH_DELTA,
            stateStructType=LSH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def simhash_candidate_stream(
    documents: DataFrame,
    num_bits: int = 48,
    chunks: int = 4,
    hash_family: str = "xxhash64",
    max_bucket: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of the SimHash candidate generation
    (dedup.simhash_pairs): online Hamming-radius near-dup against
    everything seen so far — the last banded family without a streaming
    leg (MinHash, weighted MinHash, and hyperplane cosine have theirs).
    Per-row signature via :func:`~esop_spark.operators.dedup.
    with_simhash_signature` (bit-identical to the batch aggregation) and
    the batch operator's own pigeonhole chunking
    (:func:`~esop_spark.operators.dedup.simhash_chunks`), so a replayed
    corpus lands in the batch equi-join's (chunk_idx, chunk_val) buckets.
    Same state machinery, pair-log SET contract, and hot-bucket
    anchor-star degradation as :func:`lsh_candidate_stream`; the Hamming
    verification (bit_count(xor) ≤ radius) stays a batch job over the
    emitted pair log — the same candidates-then-verify split as every
    LSH stream here. Output (band, id_a, id_b); band is the chunk index."""
    sig = with_simhash_signature(
        documents, num_bits, text_col, id_col, hash_family
    )
    bb = simhash_chunks(sig, num_bits, chunks, id_col).select(
        F.col(id_col).alias("did"),
        F.col("chunk_idx").alias("band"),
        F.col("chunk_val").cast("string").alias("bucket"),
    )
    return _expand_delta_pairs(
        bb.groupBy("band", "bucket").applyInPandasWithState(
            _lsh_fn_factory(int(max_bucket)),
            outputStructType=LSH_DELTA,
            stateStructType=LSH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def embedding_candidate_stream(
    embeddings: DataFrame,
    bands: int = 8,
    band_planes: int = 3,
    dim: int = 64,
    seed: str = "hp",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 100,
) -> DataFrame:
    """Streaming twin of the banded-LSH COSINE candidate generation
    (similarity.cosine_pairs_lsh): online embedding near-dup against
    everything seen so far, with the exact state machinery of
    :func:`lsh_candidate_stream` — only the banding differs (hyperplane
    sign patterns instead of MinHash slices; both are pure per-row
    projections, so a replayed corpus lands in the batch leg's buckets).

    Emits (band, id_a, id_b) candidate pairs; exact-cosine verification
    stays a batch job over the pair log (join the ids back to the
    embedding table — similarity.cosine_pairs_lsh's verify tail), the
    same candidates-then-verify split as the text path. State per
    (band, bucket) is bounded: member ids up to ``max_bucket``, a single
    anchor after — the pair-log SET contract documented on
    :func:`lsh_candidate_stream` applies identically."""
    from esop_spark.operators.similarity import banded_semantic_buckets

    bb = banded_semantic_buckets(
        embeddings, bands, band_planes, dim, seed, vec_col, id_col
    ).select(F.col(id_col).alias("did"), "band", "bucket")
    return _expand_delta_pairs(
        bb.groupBy("band", "bucket").applyInPandasWithState(
            _lsh_fn_factory(int(max_bucket)),
            outputStructType=LSH_DELTA,
            stateStructType=LSH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
