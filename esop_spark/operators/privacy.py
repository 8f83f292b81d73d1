"""Privacy operators: pseudonymization and k-anonymity auditing.

A training-data pipeline that ships user-derived tables needs (a) stable
key pseudonymization that provably preserves identity structure, and (b)
re-identification risk audits over quasi-identifier combinations. Both are
pure relational constructions:

- ``pseudonymize_audit`` — keyed-hash pseudonyms (md5 of salt||key) with a
  collision/cardinality audit proving the mapping is injective on this
  corpus (distinct keys == distinct pseudonyms) — the check that makes
  hash-based pseudonymization shippable.
- ``k_anonymity_audit`` — group sizes over a quasi-identifier tuple; rows
  in groups smaller than k are re-identifiable. Reports the risk histogram
  and the minimum group size.

Reference parity: the content-addressed `<generation>-<digest>` identity
scheme (SSTableUtils.java:48-74) is the same keyed-rename idea applied to
sstables; these operators generalize it to entity keys with an audit leg.

Scale: both are one map-side-combined aggregation to the key/QI grain;
the audits live on tiny derived grains. No windows, no floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame, key_col: str, salt: str = "s1"
) -> DataFrame:
    """Replace ``key_col`` with a salted-hash pseudonym column
    ``<key_col>_pseudo`` (md5 of salt||key) — deterministic within a salt,
    unlinkable across salts. Pure projection."""
    return df.withColumn(
        f"{key_col}_pseudo",
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
    )


def pseudonymize_audit(
    df: DataFrame, key_col: str, salt: str = "s1"
) -> DataFrame:
    """Injectivity audit of the pseudonym mapping: distinct keys, distinct
    pseudonyms, colliding pseudonyms (≥2 source keys), and rows touched.
    Shippable iff collisions == 0."""
    p = pseudonymize(df, key_col, salt)
    pairs = p.select(
        F.col(key_col).alias("k"), F.col(f"{key_col}_pseudo").alias("ps")
    )
    per_pseudo = pairs.groupBy("ps").agg(
        F.countDistinct("k").alias("n_keys"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_pseudo.agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_pseudonyms"),
        F.sum("n_keys").cast("bigint").alias("n_keys"),
        F.sum((F.col("n_keys") > 1).cast("bigint"))
        .cast("bigint")
        .alias("n_collisions"),
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """K-anonymity risk report over a quasi-identifier tuple: per QI-group
    size bucket (1, 2-4, 5-9, 10+), how many GROUPS and how many ROWS —
    plus each bucket's share of total rows in ppm. Rows in buckets below
    ``k`` are the re-identification exposure.

    One aggregation to the QI grain; the histogram lives on ≤4 rows."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("gs"))
    bucket = (
        F.when(F.col("gs") == 1, "1")
        .when(F.col("gs") < k, f"2-{k - 1}")
        .when(F.col("gs") < 2 * k, f"{k}-{2 * k - 1}")
        .otherwise(f"{2 * k}+")
    )
    hist = groups.select(bucket.alias("bucket"), "gs").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("gs").alias("n_rows"),
        F.min("gs").alias("min_group"),
    )
    return hist.withColumn(
        "total", F.sum("n_rows").over(Window.partitionBy())
    ).select(
        "bucket",
        F.col("n_groups").cast("bigint").alias("n_groups"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.expr("(n_rows * 1000000) div total").cast("bigint").alias("rows_ppm"),
        F.col("min_group").cast("bigint").alias("min_group"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """L-diversity companion to :func:`k_anonymity_audit`: per
    quasi-identifier group, how many DISTINCT sensitive values appear —
    a group can be k-anonymous yet leak its sensitive attribute outright
    when every member shares one value (the homogeneity attack).

    One two-level agg: (QI, sensitive) distinct pairs, then the QI grain
    with a distinct-value count; the report histogram lives on the ≤3
    diversity-bucket grain. Output per bucket:
    (bucket, n_groups, n_rows, rows_ppm)."""
    pairs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    groups = pairs.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("gs"),
    )
    bucket = (
        F.when(F.col("n_distinct") == 1, "1")
        .when(F.col("n_distinct") < l, f"2-{l - 1}")
        .otherwise(f"{l}+")
    )
    hist = groups.select(bucket.alias("bucket"), "gs").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("gs").alias("n_rows"),
    )
    return hist.withColumn(
        "total", F.sum("n_rows").over(Window.partitionBy())
    ).select(
        "bucket",
        F.col("n_groups").cast("bigint").alias("n_groups"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.expr("(n_rows * 1000000) div total")
        .cast("bigint")
        .alias("rows_ppm"),
    )


def deletion_impact(
    events: DataFrame,
    purge_ppm: int = 20_000,
    seed: str = "gdpr0",
    user_col: str = "user_id",
) -> DataFrame:
    """Right-to-be-forgotten impact report: if the (deterministically
    hash-selected) ``purge_ppm``-per-million user set exercised deletion,
    how much of each day's event volume and value disappears — the
    blast-radius estimate a compliance team needs BEFORE running the
    purge, and the regression baseline for re-validating downstream
    aggregates after it.

    Deterministic: the purge set is the md5 bucket < purge_ppm rule (the
    q50 sampling family), so the report is reproducible and the oracle
    replays it exactly.

    Scale shape: a narrow per-row flag (no join — the flag is a hash of
    the user key) folded in ONE mergeable agg to the bounded day grain.

    Output per day: (day, n_events, n_purged, purged_ppm,
    purged_value_cents)."""
    from esop_spark.operators.sampling import BUCKETS, sample_bucket

    flagged = events.select(
        F.expr("unix_timestamp(ts) div 86400").cast("bigint").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        (
            sample_bucket(F.col(user_col), seed)
            < int(purge_ppm * BUCKETS / 1_000_000)
        ).alias("purged"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("purged"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_purged"),
            F.sum(F.when(F.col("purged"), F.col("vc")).otherwise(0))
            .cast("bigint")
            .alias("purged_value_cents"),
        )
        .select(
            "day",
            "n_events",
            "n_purged",
            # integer floor division — a double quotient landing one ulp
            # above an integer would truncate differently across engines
            F.expr("n_purged * 1000000 div n_events").alias("purged_ppm"),
            "purged_value_cents",
        )
    )
