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
    with_minhash_signature,
    with_weighted_minhash_signature,
)

LSH_OUTPUT = "band int, id_a bigint, id_b bigint"
LSH_STATE = "ids string, hot int"


def _lsh_fn_factory(max_bucket: int):
    def fn(key, pdfs, state: GroupState):
        import json as _json

        ids, hot = (
            (_json.loads(state.get[0]), int(state.get[1]))
            if state.exists
            else ([], 0)
        )
        known = set(ids)
        new = sorted(
            {int(i) for pdf in pdfs for i in pdf["did"]} - known
        )
        pairs: list = []
        if new:
            total = len(ids) + len(new)
            if hot or total > max_bucket:
                members = ids + new
                anchor = min(members)
                # star edges for the arrivals (batch's oversized-bucket
                # degradation: O(B) anchor edges, components unchanged)
                pairs.extend((anchor, m) for m in new if m != anchor)
                if ids and anchor not in known:
                    # a new, smaller anchor: bridge it to the old component
                    pairs.append((anchor, min(ids)))
                ids, hot = [anchor], 1
            else:
                for i, a in enumerate(new):
                    pairs.extend((a, b) for b in new[i + 1:])
                    pairs.extend(
                        (min(a, b), max(a, b)) for b in ids
                    )
                ids = sorted(known | set(new))
            state.update((_json.dumps(ids), hot))
        band = int(key[0])
        yield pd.DataFrame(
            {
                "band": pd.Series([band] * len(pairs), dtype="int32"),
                "id_a": pd.Series([p[0] for p in pairs], dtype="int64"),
                "id_b": pd.Series([p[1] for p in pairs], dtype="int64"),
            }
        )

    return fn


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
    return bb.groupBy("band", "bucket").applyInPandasWithState(
        _lsh_fn_factory(int(max_bucket)),
        outputStructType=LSH_OUTPUT,
        stateStructType=LSH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
    return bb.groupBy("band", "bucket").applyInPandasWithState(
        _lsh_fn_factory(int(max_bucket)),
        outputStructType=LSH_OUTPUT,
        stateStructType=LSH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
    return bb.groupBy("band", "bucket").applyInPandasWithState(
        _lsh_fn_factory(int(max_bucket)),
        outputStructType=LSH_OUTPUT,
        stateStructType=LSH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
