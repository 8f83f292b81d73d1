"""Z-order (Morton) clustering advisor: would interleaved-key layout let a
two-dimensional filter skip files?

At 100 TB the difference between scanning 2% and 100% of a table is the
file-level min/max zone map — and min/max only prunes on the clustering
key. Linear layout (sort by one column) prunes that column alone; Z-order
interleaves the bits of two columns so files become axis-aligned rectangles
in (x, y) space and BOTH predicates prune. This module computes the
Morton key as a pure JVM column expression (no UDF), buckets rows into
would-be files by the key's top bits, and reports each bucket's min/max
envelope plus whether a given query box would have to read it — the
measured skip ratio IS the advisor's answer ("Z-order these two columns:
a point-ish query reads k of n files instead of all n").

Exactness: normalization uses integer math only — u = ((v - min) << bits)
div (max - min + 1) on bigints — so Spark and the DuckDB oracle agree
bit-for-bit; no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_expr(prefix: str, bits: int) -> str:
    """SQL for exact integer normalization into [0, 2**bits): ((v − min) ·
    2^bits) div (max − min + 1). ``div`` (not ``/`` + floor) keeps the
    arithmetic in bigints end-to-end — ``/`` would detour through a
    double and lose exactness past 2^53, which a 100 TB key range can
    reach. Expects columns ``{p}``, ``{p}_min``, ``{p}_max``."""
    return (
        f"(({prefix} - {prefix}_min) * {1 << bits}) "
        f"div ({prefix}_max - {prefix}_min + 1)"
    )


def morton_key(ux: Column, uy: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two normalized bigints —
    x in even positions, y in odd. Built as a sum of shift/mask terms,
    entirely whole-stage-codegen-able."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(ux, i).bitwiseAND(F.lit(1)), 2 * i
        ).cast("bigint")
        z = z + F.shiftleft(
            F.shiftright(uy, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ).cast("bigint")
    return z


def zorder_cell_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    cell_bits: int = 3,
    box: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Bucket rows into 4**cell_bits would-be files by the top interleaved
    bits of their Morton key; report each bucket's row count and (x, y)
    min/max envelope, plus ``must_read`` = whether the envelope overlaps
    ``box`` = (x_lo, x_hi, y_lo, y_hi). sum(n WHERE must_read=0)/sum(n)
    is the fraction of data a zone-map scan skips under this layout.

    Scale shape: the min/max frame is a 1-row broadcast; the key is a
    scan-stage projection; the only shuffle is the 4**cell_bits-row
    bucket agg (map-side partial). On a real lakehouse the same key feeds
    a range-partitioned write (repartitionByRange on the key) — this
    audit measures what that write buys before paying for it."""
    frame = df.agg(
        F.min(x_col).cast("bigint").alias("x_min"),
        F.max(x_col).cast("bigint").alias("x_max"),
        F.min(y_col).cast("bigint").alias("y_min"),
        F.max(y_col).cast("bigint").alias("y_max"),
    )
    w = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).crossJoin(F.broadcast(frame))
    ux = F.expr(_norm_expr("x", bits)).cast("bigint")
    uy = F.expr(_norm_expr("y", bits)).cast("bigint")
    # top cell_bits of each dimension == top 2*cell_bits of the z key
    bucket = F.shiftright(
        morton_key(ux, uy, bits), 2 * (bits - cell_bits)
    ).cast("bigint")
    stats = (
        w.select("x", "y", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )
    if box is None:
        return stats
    x_lo, x_hi, y_lo, y_hi = box
    overlap = (
        (F.col("max_x") >= x_lo)
        & (F.col("min_x") <= x_hi)
        & (F.col("max_y") >= y_lo)
        & (F.col("min_y") <= y_hi)
    )
    return stats.select(
        "bucket", "n", "min_x", "max_x", "min_y", "max_y",
        F.when(overlap, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias(
            "must_read"
        ),
    )


def morton_sql(ux: str, uy: str, bits: int) -> str:
    """DuckDB expression computing the same Morton key — for oracles."""
    terms = []
    for i in range(bits):
        terms.append(f"((({ux} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({uy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def layout_skip_compare(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    cell_bits: int = 3,
    box: tuple[int, int, int, int] = (0, 0, 0, 0),
) -> DataFrame:
    """Sort-key advisor: for the three candidate layouts — linear on x,
    linear on y, Z-order on (x, y) — bucket rows into the same number of
    would-be files (4**cell_bits), compute each file's (x, y) min/max
    envelope, and mark whether the query ``box`` = (x_lo, x_hi, y_lo, y_hi)
    forces a read. Aggregating must_read·n over each layout gives the
    zone-map scan fraction per layout — the measured answer to "which sort
    key should this table be written with", not a heuristic one.

    Linear buckets use the SAME integer range normalization as the Morton
    key (value-range buckets, i.e. what repartitionByRange + file split
    approximates), at resolution ``bits`` truncated to the top
    ``2·cell_bits`` bits, so all three layouts produce 4**cell_bits files
    and skip ratios compare apples-to-apples. Requires bits ≥ 2·cell_bits.

    Scale shape: one scan computes all three bucket keys in the same
    projection (the 1-row min/max frame broadcasts); the union is three
    file-count-sized aggs. Output: (layout, bucket, n, min_x, max_x,
    min_y, max_y, must_read)."""
    if bits < 2 * cell_bits:
        raise ValueError("bits must be >= 2*cell_bits for equal file counts")
    frame = df.agg(
        F.min(x_col).cast("bigint").alias("x_min"),
        F.max(x_col).cast("bigint").alias("x_max"),
        F.min(y_col).cast("bigint").alias("y_min"),
        F.max(y_col).cast("bigint").alias("y_max"),
    )
    w = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).crossJoin(F.broadcast(frame))
    ux = F.expr(_norm_expr("x", bits)).cast("bigint")
    uy = F.expr(_norm_expr("y", bits)).cast("bigint")
    shift = bits - 2 * cell_bits
    keyed = w.select(
        "x",
        "y",
        F.shiftright(ux, shift).cast("bigint").alias("b_x"),
        F.shiftright(uy, shift).cast("bigint").alias("b_y"),
        F.shiftright(morton_key(ux, uy, bits), 2 * (bits - cell_bits))
        .cast("bigint")
        .alias("b_z"),
    )
    x_lo, x_hi, y_lo, y_hi = box
    out = []
    for layout, bcol in (("linear_x", "b_x"), ("linear_y", "b_y"), ("zorder", "b_z")):
        stats = (
            keyed.groupBy(F.col(bcol).alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.min("x").cast("bigint").alias("min_x"),
                F.max("x").cast("bigint").alias("max_x"),
                F.min("y").cast("bigint").alias("min_y"),
                F.max("y").cast("bigint").alias("max_y"),
            )
        )
        overlap = (
            (F.col("max_x") >= x_lo)
            & (F.col("min_x") <= x_hi)
            & (F.col("max_y") >= y_lo)
            & (F.col("min_y") <= y_hi)
        )
        out.append(
            stats.select(
                F.lit(layout).alias("layout"),
                "bucket",
                "n",
                "min_x",
                "max_x",
                "min_y",
                "max_y",
                F.when(overlap, F.lit(1))
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("must_read"),
            )
        )
    return out[0].unionByName(out[1]).unionByName(out[2])
