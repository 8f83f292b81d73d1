"""Streaming corpus curation: the batch release-gate signals applied to a
document stream (continuous ingestion — the shape a crawl/firehose pipeline
runs, as opposed to the batch backfill in operators.text).

Everything here reuses the BATCH column expressions from operators.text
(quality score, language-ID, content key) — the definitions are Column
builders, so the identical JVM expressions run in both engines' plans.
Streaming-specific parts: watermarked content-key dedup (bounded state) and
per-batch acceptance counters through foreachBatch.

Scale: the filter/scoring stage is stateless and narrow (scales with input
partitions); the only state is the dedup key store, bounded by the
watermark horizon. State store scale-out = shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esop_spark.operators.text import (
    lang_pred_cols,
    quality_score_col,
    tokenset_key,
)


def curate_stream(
    documents: DataFrame,
    min_quality: int = 55,
    lang: str = "en",
    watermark: str = "10 minutes",
    ts_col: str = "ingest_ts",
    text_col: str = "text",
) -> DataFrame:
    """Quality gate → language gate → watermarked content dedup over a
    streaming documents relation (needs an event-time column ``ts_col``).

    Returns the curated stream (original columns + quality_score +
    pred_lang); duplicates of a content key arriving within the watermark
    are dropped with bounded state.
    """
    score = quality_score_col(text_col)
    pred, _best = lang_pred_cols(text_col)

    gated = (
        documents.withColumn("quality_score", score)
        .withColumn("pred_lang", pred)
        .filter(
            (F.col("quality_score") >= min_quality) & (F.col("pred_lang") == lang)
        )
        .withColumn("content_key", tokenset_key(text_col))
    )
    return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_key"]
    )


def run_to_sink(
    curated: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drive the curated stream to a parquet sink (availableNow: drain all
    pending input then stop — the incremental-backfill trigger), exactly-once
    via the checkpoint."""
    (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def decontaminate_stream(
    documents: DataFrame,
    bloom_words: list[int],
    m_bits: int,
    k: int = 4,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Streaming decontamination prefilter: drop incoming documents whose
    text contains ANY shingle that passes the benchmark bloom filter
    (dedup.bloom_build over the eval set, built once in batch and shipped
    as the broadcast word list).

    Stateless and narrow — the bloom probe is a pure column expression over
    the doc's shingle array (exists/forall on JVM arrays), so it composes
    with any streaming source without extra state or shuffle. Bloom false
    positives mean a small over-drop (tunable via m/k); false negatives
    cannot happen, so nothing contaminated survives the gate at shingle
    granularity. A stricter pipeline routes the flagged docs to a batch
    exact verify (dedup.bloom_contamination) instead of dropping."""
    from esop_spark.operators.dedup import _shingle_array_expr, bloom_probe_col

    words_arr = documents.select(
        "*", F.split(F.col(text_col), " ").alias("words")
    )
    flagged = F.exists(
        F.expr(_shingle_array_expr(n)),
        lambda sh: bloom_probe_col(sh, bloom_words, m_bits, k),
    )
    return (
        words_arr.withColumn("_contaminated", flagged)
        .filter(~F.col("_contaminated"))
        .drop("words", "_contaminated")
    )
