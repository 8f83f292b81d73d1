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
  same cap; dead shingles' probe lists are dropped with them.
- ``pairs``   (id_a, id_b, hs, emitted): per-pair distinct hit
  shingles (≤ 2·probe_k by construction — hits come from the two
  docs' bottom-k probe sets) and whether the pair was already
  emitted, so each candidate pair is emitted EXACTLY once across the
  stream's lifetime.

Over a full replay every (probe-shingle of x) × (y contains it)
combination is generated exactly once — when the later of the two
arrives — so the accumulated per-pair hit set equals the batch
operator's and the emitted pair set equals ``containment_candidates``
whenever no shingle dies mid-stream (exact-parity tested; the capped
corpus gets the superset/bounded-state test). Verification (exact
containment on shingles) stays a batch job over the emitted pair log,
the same candidates-then-verify split as every twin here.

Exactly-once and state layout follow ``dedup_stream``'s compacted core:
pair output overwrites ``pairs_dir/batch=<id>``, the four tables
snapshot under ``state_dir/v=<id>/<table>``, both idempotent under
crash replay; Hadoop FileSystem I/O (file:/hdfs:/s3a:).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esop_spark.operators.dedup import doc_shingle_counts, shingles
from esop_spark.streaming.dedup_stream import (
    _EMPTY_IDS as _EMPTY,
    _hadoop_fs,
    _state_versions,
)


def _bottom_k_probes(sh_hashed: DataFrame, k: int) -> DataFrame:
    """Per-doc bottom-k shingle hashes — identical rule to the batch
    operator (row_number over hash order per doc; doc-bounded groups)."""
    w_doc = Window.partitionBy("did").orderBy("h")
    return (
        sh_hashed.withColumn("_rn", F.row_number().over(w_doc))
        .filter(F.col("_rn") <= k)
        .select("did", "h")
    )


def _read_or_empty(spark, path: str, schema: str) -> DataFrame:
    fs, p = _hadoop_fs(spark, path)
    if fs.exists(p):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def _containment_fn_factory(
    pairs_dir: str,
    state_dir: str,
    n: int,
    probe_k: int,
    min_hits: int,
    max_df: int,
    text_col: str,
    id_col: str,
):
    def fn(batch_docs: DataFrame, batch_id: int) -> None:
        spark = batch_docs.sparkSession
        versions = _state_versions(spark, state_dir)
        prior = max((v for v in versions if v < batch_id), default=None)

        def tbl(name: str, schema: str) -> DataFrame:
            if prior is None:
                return spark.createDataFrame([], schema)
            return _read_or_empty(
                spark, f"{state_dir}/v={prior}/{name}", schema
            )

        counts_prev = tbl("counts", "did long, n_sh int")
        post_prev = tbl("post", "h long, dids array<bigint>, dead int")
        probe_prev = tbl("probe", "h long, pids array<bigint>")
        pairs_prev = tbl(
            "pairs", "id_a long, id_b long, hs array<bigint>, emitted int"
        )

        # ---- batch projections (docs already seen are dropped whole) ----
        docs = (
            batch_docs.dropDuplicates([id_col])
            .join(
                counts_prev.select(F.col("did").alias(id_col)),
                id_col,
                "left_anti",
            )
        )
        sh = (
            shingles(docs, n, text_col, id_col)
            .select(
                F.col(id_col).alias("did"),
                F.xxhash64("shingle").alias("h"),
            )
            .distinct()
        )
        counts_b = doc_shingle_counts(docs, n, text_col, id_col).select(
            F.col(id_col).alias("did"), F.col("n_sh").cast("int").alias("n_sh")
        )
        probes_b = _bottom_k_probes(sh, probe_k)

        post_b = sh.groupBy("h").agg(
            F.sort_array(F.collect_set("did")).alias("bdids")
        )
        post_m = (
            post_prev.join(post_b, "h", "full_outer")
            .select(
                "h",
                F.coalesce("dids", F.expr(_EMPTY)).alias("pdids"),
                F.coalesce("bdids", F.expr(_EMPTY)).alias("bdids"),
                F.coalesce("dead", F.lit(0)).alias("pdead"),
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
        try:
            # hits flow only through shingles still LIVE after this merge;
            # restrict state-side explodes to shingles the batch touched
            live_touched = post_m.filter(
                (F.col("dead") == 0) & (F.size("bdids") > 0)
            )
            post_all_t = live_touched.select(
                "h",
                F.explode(F.concat("pdids", "bdids")).alias("iid"),
            )
            post_new_t = live_touched.select(
                "h", F.explode("bdids").alias("iid")
            )
            probe_prev_t = (
                probe_prev.join(live_touched.select("h"), "h", "left_semi")
                .select("h", F.explode("pids").alias("pid"))
            )
            hits_b = (
                probes_b.selectExpr("h", "did AS pid")
                .join(post_all_t, "h")
                .unionByName(probe_prev_t.join(post_new_t, "h"))
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
            pairs_m = (
                pairs_prev.join(pair_b, ["id_a", "id_b"], "full_outer")
                .select(
                    "id_a",
                    "id_b",
                    F.array_distinct(
                        F.concat(
                            F.coalesce("hs", F.expr(_EMPTY)),
                            F.coalesce("bhs", F.expr(_EMPTY)),
                        )
                    ).alias("hs"),
                    F.coalesce("emitted", F.lit(0)).alias("pemit"),
                )
                .persist()
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
                    "hs",
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
                    out = f"{state_dir}/v={batch_id}"
                    counts_all.write.mode("overwrite").parquet(f"{out}/counts")
                    post_m.select(
                        "h",
                        # dead posting lists are dropped — bounded state
                        F.when(F.col("dead") == 1, F.expr(_EMPTY))
                        .otherwise(F.sort_array(F.concat("pdids", "bdids")))
                        .alias("dids"),
                        "dead",
                    ).write.mode("overwrite").parquet(f"{out}/post")
                    probe_all = (
                        probe_prev.select("h", F.explode("pids").alias("pid"))
                        .unionByName(probes_b.selectExpr("h", "did AS pid"))
                        .join(
                            post_m.filter(F.col("dead") == 1).select("h"),
                            "h",
                            "left_anti",
                        )
                        .groupBy("h")
                        .agg(F.sort_array(F.collect_set("pid")).alias("pids"))
                    )
                    probe_all.write.mode("overwrite").parquet(f"{out}/probe")
                    crossed.select(
                        "id_a",
                        "id_b",
                        "hs",
                        F.greatest("pemit", "crossed").alias("emitted"),
                    ).write.mode("overwrite").parquet(f"{out}/pairs")
                finally:
                    crossed.unpersist()
            finally:
                counts_all.unpersist()
                pairs_m.unpersist()
        finally:
            post_m.unpersist()
        if prior is not None:
            fs, _ = _hadoop_fs(spark, state_dir)
            jvm = spark._jvm
            for v in versions:
                if v < prior:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v={v}"),
                        True,
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
):
    """Start the streaming containment candidate query over a document
    stream. Emits each candidate pair (id_a, id_b) exactly once, into
    ``pairs_dir/batch=<id>``; a full replay's pair set equals the batch
    :func:`~esop_spark.operators.dedup.containment_candidates` whenever
    no shingle's cumulative df crosses ``max_df`` mid-stream (else the
    documented superset SET contract). Returns the started query."""
    fn = _containment_fn_factory(
        pairs_dir, state_dir, n, probe_k, int(min_hits), int(max_df),
        text_col, id_col,
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
