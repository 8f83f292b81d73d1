"""Streaming curation: quality/lang gates + watermarked dedup over a file
stream, drained with availableNow and checked against the batch semantics."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from esop_spark.streaming import curation_stream


def test_curate_stream_matches_batch_gates(spark, tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    rows = [
        # passes gates; duplicated content -> second copy deduped
        (1, "the quick brown fox jumps over a lazy dog", "2024-01-01 00:00:01"),
        (2, "the quick brown fox jumps over a lazy dog", "2024-01-01 00:00:02"),
        # all-stopword -> quality fail
        (3, "the the the the the the the the", "2024-01-01 00:00:03"),
        # no marker tokens -> lang fail
        (4, "zzz yyy xxx www vvv uuu", "2024-01-01 00:00:04"),
        # distinct passing doc
        (5, "a second passing document with the required varied words", "2024-01-01 00:00:05"),
    ]
    batch = spark.createDataFrame(
        rows, "doc_id bigint, text string, ts string"
    ).withColumn("ingest_ts", F.col("ts").cast("timestamp")).drop("ts")
    batch.write.parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id bigint, text string, ingest_ts timestamp")
        .parquet(str(src))
    )
    curated = curation_stream.curate_stream(stream, min_quality=55, lang="en")
    curation_stream.run_to_sink(curated, str(out), str(ckpt))

    got = spark.read.parquet(str(out))
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # one of {1, 2} survives dedup (either copy is a valid canonical within
    # the watermark), 3 and 4 are gated out, 5 survives
    assert len(ids) == 2 and ids[1] == 5 and ids[0] in (1, 2)
    assert {r["pred_lang"] for r in got.collect()} == {"en"}

    # restart with same checkpoint: no new input -> no duplicate output
    curation_stream.run_to_sink(curated, str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == 2


def test_decontaminate_stream_drops_contaminated(spark, tmp_path):
    from esop_spark.operators import dedup
    from esop_spark.streaming import curation_stream

    eval_docs = spark.createDataFrame(
        [(100, "secret bench mark answer tokens")], "doc_id long, text string"
    )
    eval_sh = dedup.shingles(eval_docs, 3).select("shingle").distinct()
    words = dedup.bloom_build(eval_sh, "shingle", m_bits=1 << 14, k=4)

    src_dir = str(tmp_path / "decon_in")
    spark.createDataFrame(
        [
            (0, "clean text with harmless words only here"),
            (1, "contains secret bench mark answer tokens inline"),
            (2, "another clean document streaming through fine"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    out = curation_stream.decontaminate_stream(stream, words, 1 << 14, 4)
    q = (
        out.writeStream.format("memory")
        .queryName("decon_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    kept = sorted(
        r["doc_id"] for r in spark.sql("select * from decon_test").collect()
    )
    assert kept == [0, 2]
