"""Corpus interchange I/O: JSONL (the de-facto LLM training-corpus
format) and CSV document readers/writers with an explicit, stable schema.

Explicit schemas everywhere — schema inference is nondeterministic under
corpus drift (a batch where every `lang` is null infers string vs void) and
costs an extra full scan at 100 TB. Readers project and cast to the
canonical documents layout (doc_id bigint, text string, lang string,
source string, n_chars bigint), so every operator in this engine runs on
JSONL corpora unchanged.

Reference parity: the reference's sources are storage trees + manifest
JSON (SURVEY.md §2.1); JSONL/CSV corpus interchange is part of the
LLM-pipeline extension surface (§6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _canonical(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    out = df
    if "n_chars" not in cols:
        out = out.withColumn("n_chars", F.length("text").cast("bigint"))
    return out.select(
        F.col("doc_id").cast("bigint"),
        F.col("text").cast("string"),
        F.col("lang").cast("string"),
        F.col("source").cast("string"),
        F.col("n_chars").cast("bigint"),
    )


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL documents corpus with the explicit schema (no
    inference scan); missing n_chars is derived from the text."""
    return _canonical(spark.read.schema(DOCUMENTS_SCHEMA).json(path))


def write_documents_jsonl(
    df: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Write the canonical documents layout as JSONL. ``partitions``
    controls output file count (shard sizing); omitted = upstream
    partitioning."""
    out = _canonical(df)
    if partitions is not None:
        out = out.repartition(partitions)
    out.write.mode("overwrite").json(path)


def read_documents_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """CSV fallback reader with the same explicit schema and canonical
    projection. Multiline/quoted text is handled by the csv source's
    quoting — but JSONL is the recommended interchange for text with
    embedded newlines."""
    return _canonical(
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
