"""Streaming CONTAINMENT candidate mining — the compacted foreachBatch
shape, completing the streaming-twin surface (MinHash, weighted MinHash,
SimHash, embeddings have theirs; containment was the last banded family
without one — round-9 verdict #7).

The batch operator (:func:`~esop_spark.operators.dedup.
containment_candidates`) is ASYMMETRIC: each document probes with its
bottom-k shingles against a df-capped inverted shingle index, and a pair
becomes a candidate at ≥ ``min_hits`` distinct probe hits. That shape
does not fit the (band, bucket) per-key state machinery of
``dedup_stream`` — the hit count aggregates ACROSS shingle keys, so a
per-key state function cannot decide emission alone. It fits the
compacted-table shape naturally: four JVM-side state tables maintained
by plain joins in a foreachBatch function, no Python in the loop —

- ``counts``  (did, n_sh): per-doc distinct-shingle counts; also the
  seen-doc set, so at-least-once redelivery of a document is a no-op
  (stronger than the LSH twins' documented re-emission caveat).
- ``post``    (h, dids, dead): the inverted index. A shingle whose
  cumulative document frequency exceeds ``max_df`` is marked dead —
  its posting list is DROPPED (state stays bounded: ≤ max_df ids per
  live shingle) and it stops generating hits from that batch on. The
  batch operator excludes such shingles globally, so a pair whose
  pre-death hits already crossed ``min_hits`` is an EXTRA the stream
  emitted and batch would not — the same superset-of-batch SET
  contract every LSH stream here documents, same consumer guidance
  (verification downstream prunes it).
- ``probe``   (h, pids): which prior docs probe with h. Probing docs
  contain h, so this is a subset of the posting list — bounded by the
  same cap; dead shingles' probe rows are dropped at the fold.
- ``pairs``   (id_a, id_b, hs, emitted): per-pair distinct hit
  shingles (≤ 2·probe_k by construction — hits come from the two
  docs' bottom-k probe sets) and whether the pair was already
  emitted, so each candidate pair is emitted EXACTLY once across the
  stream's lifetime.

State layout (round 11): each table is a DELTA LOG with periodic
compaction, sharing ``dedup_stream``'s version-dir machinery — but the
deltas are INCREMENTS (events), not merged values. A batch writes only
the facts it ADDED — this batch's postings per shingle, probes, new hit
shingles per pair, a dead/emitted event row when a flag latches —
so every posting/probe/hit traverses the log exactly once. (A first cut
wrote MERGED per-key values into the deltas, like the LSH twins do;
for containment a batch touches millions of shingle keys whose
cumulative posting lists then reappear in every subsequent delta, and
the measured sf10 16-batch replay cost GREW with chain length to 2×
the old full-rewrite design. The LSH twins keep merged-value deltas
because their per-key arrays are cap-bounded and their touched keys
are mostly fresh singletons — duplication there is O(1).)

Current state of a key = an AGGREGATION over the chain (union of the
newest base and subsequent deltas): posting/probe/hit arrays are the
distinct union across rows, dead/emitted flags are the max (latched
events). Per-batch reads restrict that aggregation to keys the batch
touched (left-semi prune first); every ``compact_every`` batches a full
fold writes the merged view as a new base and retention prunes the
folded deltas (``_retain_versions``), which also drops dead shingles'
posting/probe rows — bounded state. Untouched keys are never re-read,
re-aggregated, or rewritten: an untouched pair cannot newly cross
``min_hits`` (its hit set and its docs' shingle counts are immutable),
so touched-pair evaluation is exact, not an approximation.

Over a full replay every (probe-shingle of x) × (y contains it)
combination is generated exactly once — when the later of the two
arrives — so the accumulated per-pair hit set equals the batch
operator's and the emitted pair set equals ``containment_candidates``
whenever no shingle dies mid-stream (exact-parity tested; the capped
corpus gets the superset/bounded-state test). Verification (exact
containment on shingles) stays a batch job over the emitted pair log,
the same candidates-then-verify split as every twin here.

Exactly-once follows ``dedup_stream``'s compacted core: pair output
overwrites ``pairs_dir/batch=<id>``, per-table delta and base dirs
overwrite ``.../v=<id>``, and the compaction decision counts only
versions strictly below the replayed batch — all idempotent under
crash replay; Hadoop FileSystem I/O (file:/hdfs:/s3a:).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esop_spark.operators.dedup import doc_shingle_counts, shingles
from esop_spark.streaming.dedup_stream import (
    _EMPTY_IDS as _EMPTY,
    _live_versions,
    _read_versioned,
    _retain_versions,
)

_SCHEMAS = {
    "counts": "did long, n_sh int",
    "post": "h long, dids array<bigint>, dead int",
    "probe": "h long, pids array<bigint>",
    "pairs": "id_a long, id_b long, hs array<bigint>, emitted int",
}


def _bottom_k_probes(sh_hashed: DataFrame, k: int) -> DataFrame:
    """Per-doc bottom-k shingle hashes — identical rule to the batch
    operator (row_number over hash order per doc; doc-bounded groups)."""
    w_doc = Window.partitionBy("did").orderBy("h")
    return (
        sh_hashed.withColumn("_rn", F.row_number().over(w_doc))
        .filter(F.col("_rn") <= k)
        .select("did", "h")
    )


def _table_history(spark, state_dir: str, table: str, base_v, deltas):
    """Versioned increment history of one state table under the shared
    version bookkeeping (all four tables are written together every
    batch). The ``_v`` tag is bookkeeping only — increments aggregate,
    they don't supersede each other."""
    root = f"{state_dir}/{table}"
    schema = _SCHEMAS[table]
    return _read_versioned(
        spark, f"{root}/base", [base_v] if base_v is not None else [], schema
    ).unionByName(
        _read_versioned(spark, f"{root}/delta", deltas, schema)
    ).drop("_v")


def _agg_post(hist: DataFrame) -> DataFrame:
    """Merged inverted-index view of a post increment history: distinct
    posting union per shingle, latched dead flag, dead lists dropped."""
    merged = (
        hist.select("h", F.explode_outer("dids").alias("did"), "dead")
        .groupBy("h")
        .agg(
            F.sort_array(
                F.array_compact(F.collect_set("did"))
            ).alias("dids"),
            F.max("dead").alias("dead"),
        )
    )
    return merged.select(
        "h",
        F.when(F.col("dead") == 1, F.expr(_EMPTY)).otherwise(
            F.col("dids")
        ).alias("dids"),
        "dead",
    )


def _agg_probe(hist: DataFrame) -> DataFrame:
    return (
        hist.select("h", F.explode("pids").alias("pid"))
        .groupBy("h")
        .agg(F.sort_array(F.collect_set("pid")).alias("pids"))
    )


def _agg_pairs(hist: DataFrame) -> DataFrame:
    return (
        hist.select("id_a", "id_b", F.explode_outer("hs").alias("hh"), "emitted")
        .groupBy("id_a", "id_b")
        .agg(
            F.sort_array(F.array_compact(F.collect_set("hh"))).alias("hs"),
            F.max("emitted").alias("emitted"),
        )
    )


def read_containment_state(spark, state_dir: str, table: str) -> DataFrame:
    """Reconstruct the CURRENT merged value of one of the four containment
    state tables (counts/post/probe/pairs) — the external read surface
    for consumers and tests; equals what the next batch would see (probe
    rows of dead shingles excluded, as the fold does)."""
    base_v, deltas = _live_versions(spark, f"{state_dir}/{table}", 1 << 62)
    hist = _table_history(spark, state_dir, table, base_v, deltas)
    if table == "counts":  # append-only: versions hold disjoint keys
        return hist
    if table == "post":
        return _agg_post(hist)
    if table == "probe":
        bp, dp = _live_versions(spark, f"{state_dir}/post", 1 << 62)
        dead = _agg_post(
            _table_history(spark, state_dir, "post", bp, dp)
        ).filter(F.col("dead") == 1).select("h")
        return _agg_probe(hist).join(dead, "h", "left_anti")
    return _agg_pairs(hist)


def _containment_fn_factory(
    pairs_dir: str,
    state_dir: str,
    n: int,
    probe_k: int,
    min_hits: int,
    max_df: int,
    text_col: str,
    id_col: str,
    compact_every: int = 10,
):
    def fn(batch_docs: DataFrame, batch_id: int) -> None:
        spark = batch_docs.sparkSession
        # shared version bookkeeping: all four tables commit together, so
        # the counts table's version dirs are authoritative (a crashed
        # partial write sits at v=batch_id, which reads exclude)
        base_v, deltas = _live_versions(
            spark, f"{state_dir}/counts", batch_id
        )

        def hist(table: str) -> DataFrame:
            return _table_history(spark, state_dir, table, base_v, deltas)

        counts_prev = hist("counts")  # append-only: plain union

        # ---- batch projections (docs already seen are dropped whole) ----
        # persisted: five write actions consume this batch (pair output +
        # four table deltas); an unpersisted chain would re-run the
        # shingle projection and re-scan the counts chain per action
        docs = (
            batch_docs.dropDuplicates([id_col])
            .join(
                counts_prev.select(F.col("did").alias(id_col)),
                id_col,
                "left_anti",
            )
            .persist()
        )
        sh = (
            shingles(docs, n, text_col, id_col)
            .select(
                F.col(id_col).alias("did"),
                F.xxhash64("shingle").alias("h"),
            )
            .distinct()
            .persist()
        )
        counts_b = doc_shingle_counts(docs, n, text_col, id_col).select(
            F.col(id_col).alias("did"), F.col("n_sh").cast("int").alias("n_sh")
        )
        probes_b = _bottom_k_probes(sh, probe_k).persist()
        post_b = sh.groupBy("h").agg(
            F.sort_array(F.collect_set("did")).alias("bdids")
        ).persist()

        # prior merged state of TOUCHED shingles only (probes_b's h ⊆
        # post_b's h, so post_b keys cover every shingle this batch can
        # interact with); the chain rows are thin increments, each
        # posting appearing once across the whole log
        post_chain_t = hist("post").join(
            post_b.select("h"), "h", "left_semi"
        )
        prior_post_t = _agg_post(post_chain_t).select(
            "h",
            F.col("dids").alias("pdids"),
            F.col("dead").alias("pdead"),
        )
        post_m = (
            post_b.join(prior_post_t, "h", "left")
            .select(
                "h",
                F.coalesce("pdids", F.expr(_EMPTY)).alias("pdids"),
                "bdids",
                F.coalesce("pdead", F.lit(0)).alias("pdead"),
            )
            .select(
                "h",
                "pdids",
                "bdids",
                (
                    (F.col("pdead") == 1)
                    | (F.size("pdids") + F.size("bdids") > max_df)
                )
                .cast("int")
                .alias("dead"),
            )
            .persist()
        )
        probe_prev_t = None
        try:
            # hits flow only through shingles still LIVE after this merge
            live_touched = post_m.filter(F.col("dead") == 0)
            post_all_t = live_touched.select(
                "h",
                F.explode(F.concat("pdids", "bdids")).alias("iid"),
            )
            post_new_t = live_touched.select(
                "h", F.explode("bdids").alias("iid")
            )
            # prior probe lists of touched shingles (probers ⊆ containers,
            # so these h are all in post_m; dead ones are filtered at use)
            probe_prev_t = _agg_probe(
                hist("probe").join(post_b.select("h"), "h", "left_semi")
            ).persist()
            hits_b = (
                probes_b.selectExpr("h", "did AS pid")
                .join(post_all_t, "h")
                .unionByName(
                    probe_prev_t.join(
                        live_touched.select("h"), "h", "left_semi"
                    )
                    .select("h", F.explode("pids").alias("pid"))
                    .join(post_new_t, "h")
                )
                .filter(F.col("pid") != F.col("iid"))
                .select(
                    F.least("pid", "iid").alias("id_a"),
                    F.greatest("pid", "iid").alias("id_b"),
                    "h",
                )
                .distinct()
            )
            pair_b = hits_b.groupBy("id_a", "id_b").agg(
                F.sort_array(F.collect_set("h")).alias("bhs")
            )
            # prior state of TOUCHED pairs only: an untouched pair's hit
            # set and its docs' shingle counts are immutable, so its
            # crossed status cannot change — no need to re-evaluate it
            prior_pairs_t = _agg_pairs(
                hist("pairs").join(
                    pair_b.select("id_a", "id_b"),
                    ["id_a", "id_b"],
                    "left_semi",
                )
            )
            pairs_m = (
                pair_b.join(prior_pairs_t, ["id_a", "id_b"], "left")
                .select(
                    "id_a",
                    "id_b",
                    "bhs",
                    F.array_distinct(
                        F.concat(F.coalesce("hs", F.expr(_EMPTY)), "bhs")
                    ).alias("hs"),
                    F.coalesce("emitted", F.lit(0)).alias("pemit"),
                )
            )
            counts_all = counts_prev.unionByName(counts_b).persist()
            try:
                na = counts_all.select(
                    F.col("did").alias("id_a"), F.col("n_sh").alias("_na")
                )
                nb = counts_all.select(
                    F.col("did").alias("id_b"), F.col("n_sh").alias("_nb")
                )
                crossed = pairs_m.join(na, "id_a").join(nb, "id_b").select(
                    "id_a",
                    "id_b",
                    "bhs",
                    "pemit",
                    (
                        F.size("hs")
                        >= F.least(F.lit(min_hits), F.col("_na"), F.col("_nb"))
                    )
                    .cast("int")
                    .alias("crossed"),
                ).persist()
                try:
                    crossed.filter(
                        (F.col("crossed") == 1) & (F.col("pemit") == 0)
                    ).select("id_a", "id_b").write.mode("overwrite").parquet(
                        f"{pairs_dir}/batch={batch_id}"
                    )
                    # ---- per-table INCREMENT deltas: this batch's new
                    # facts only ----
                    counts_b.write.mode("overwrite").parquet(
                        f"{state_dir}/counts/delta/v={batch_id}"
                    )
                    post_delta = post_m.select(
                        "h",
                        # dead shingles stop accumulating postings; the
                        # event row tells the fold to drop the whole list
                        F.when(F.col("dead") == 1, F.expr(_EMPTY))
                        .otherwise(F.col("bdids"))
                        .alias("dids"),
                        "dead",
                    )
                    post_delta.write.mode("overwrite").parquet(
                        f"{state_dir}/post/delta/v={batch_id}"
                    )
                    dead_h = post_m.filter(F.col("dead") == 1).select("h")
                    probe_delta = (
                        probes_b.join(dead_h, "h", "left_anti")
                        .groupBy("h")
                        .agg(F.sort_array(F.collect_set("did")).alias("pids"))
                    )
                    probe_delta.write.mode("overwrite").parquet(
                        f"{state_dir}/probe/delta/v={batch_id}"
                    )
                    pairs_delta = crossed.select(
                        "id_a",
                        "id_b",
                        F.col("bhs").alias("hs"),
                        F.greatest("pemit", "crossed").alias("emitted"),
                    )
                    pairs_delta.write.mode("overwrite").parquet(
                        f"{state_dir}/pairs/delta/v={batch_id}"
                    )
                    # ---- periodic fold (decision counts only versions
                    # strictly below this batch — replay-deterministic) ----
                    compact = len(deltas) + 1 >= compact_every
                    if compact:
                        counts_all.write.mode("overwrite").parquet(
                            f"{state_dir}/counts/base/v={batch_id}"
                        )
                        folded_post = _agg_post(
                            hist("post").unionByName(post_delta)
                        ).persist()
                        try:
                            folded_post.write.mode("overwrite").parquet(
                                f"{state_dir}/post/base/v={batch_id}"
                            )
                            dead_all = folded_post.filter(
                                F.col("dead") == 1
                            ).select("h")
                            # dead shingles' probe rows fold away —
                            # bounded state
                            _agg_probe(
                                hist("probe").unionByName(probe_delta)
                            ).join(dead_all, "h", "left_anti").write.mode(
                                "overwrite"
                            ).parquet(f"{state_dir}/probe/base/v={batch_id}")
                        finally:
                            folded_post.unpersist()
                        _agg_pairs(
                            hist("pairs").unionByName(pairs_delta)
                        ).write.mode("overwrite").parquet(
                            f"{state_dir}/pairs/base/v={batch_id}"
                        )
                finally:
                    crossed.unpersist()
            finally:
                counts_all.unpersist()
        finally:
            post_m.unpersist()
            if probe_prev_t is not None:
                probe_prev_t.unpersist()
            post_b.unpersist()
            probes_b.unpersist()
            sh.unpersist()
            docs.unpersist()
        for table in _SCHEMAS:
            _retain_versions(
                spark, f"{state_dir}/{table}", base_v, deltas, compact
            )

    return fn


def containment_compacted_query(
    documents: DataFrame,
    pairs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    probe_k: int = 8,
    min_hits: int = 2,
    max_df: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    processing_time: str | None = None,
    compact_every: int = 10,
):
    """Start the streaming containment candidate query over a document
    stream. Emits each candidate pair (id_a, id_b) exactly once, into
    ``pairs_dir/batch=<id>``; a full replay's pair set equals the batch
    :func:`~esop_spark.operators.dedup.containment_candidates` whenever
    no shingle's cumulative df crosses ``max_df`` mid-stream (else the
    documented superset SET contract). State tables can be read back with
    :func:`read_containment_state`; ``compact_every`` is the
    read-amplification / write-amplification dial. Returns the started
    query."""
    fn = _containment_fn_factory(
        pairs_dir, state_dir, n, probe_k, int(min_hits), int(max_df),
        text_col, id_col, int(compact_every),
    )
    writer = (
        documents.writeStream.foreachBatch(fn)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
