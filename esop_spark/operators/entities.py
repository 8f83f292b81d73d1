"""Entity filtering / classification / renaming DSL.

Reference semantics:
- P1 entity-expression parse: ``"ks1,ks2"`` (keyspace level) XOR
  ``"ks1.t1,ks2.t2"`` (table level), whitespace-sanitized
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/DatabaseEntities.java:140-173).
- P4 classification: 5 hardcoded system keyspaces → entity_type
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/KeyspaceTable.java:63-94).
- P12 rename remap: ``--rename=ks.a=ks.b`` rewrites the processing set
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/CassandraData.java:442-499,
   /root/reference/core/src/main/java/com/instaclustr/esop/impl/RenamedEntities.java:26-63).

Scale notes: entity predicates are driver-parsed into `isin` filters that
Catalyst pushes into the parquet scan; rename maps are tiny → broadcast join.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SYSTEM_KEYSPACES = {"system", "system_schema", "system_auth", "system_distributed", "system_traces"}


def parse_entities(expr: str) -> tuple[list[str], list[tuple[str, str]]]:
    """P1: parse an entity expression into (keyspaces XOR (ks, table) pairs).

    Whitespace is sanitized as in DatabaseEntities.java:140-152; mixing the
    two forms is rejected (XOR validation, :156-168).
    """
    cleaned = re.sub(r"\s+", "", expr or "")
    if not cleaned:
        return [], []
    items = [s for s in cleaned.split(",") if s]
    dotted = [s for s in items if "." in s]
    if dotted and len(dotted) != len(items):
        raise ValueError(f"Invalid entities format: {expr!r} (mixes ks and ks.t forms)")
    if dotted:
        pairs = []
        for s in items:
            ks, _, tbl = s.partition(".")
            if not ks or not tbl or "." in tbl:
                raise ValueError(f"Invalid entity {s!r} in {expr!r}")
            pairs.append((ks, tbl))
        return [], pairs
    return items, []


def format_entities(keyspaces: list[str], pairs: list[tuple[str, str]]) -> str:
    """F9: inverse of parse_entities — ``"ks1,ks2"`` or ``"ks1.t1,ks2.t2"``
    (DatabaseEntities.java:282-317). XOR enforced like the parser."""
    if keyspaces and pairs:
        raise ValueError("entities are keyspaces XOR (keyspace, table) pairs")
    if pairs:
        return ",".join(f"{ks}.{t}" for ks, t in pairs)
    return ",".join(keyspaces)


def classify_keyspace(col: F.Column | str) -> F.Column:
    """P4: entity_type column — SYSTEM / SYSTEM_AUTH / SCHEMA / OTHER
    (KeyspaceTable.java:63-94)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "system_auth", F.lit("SYSTEM_AUTH"))
        .when(c == "system_schema", F.lit("SCHEMA"))
        .when(c.isin("system", "system_distributed", "system_traces"), F.lit("SYSTEM"))
        .otherwise(F.lit("OTHER"))
    )


def entity_filter(
    df: DataFrame,
    expr: str,
    keyspace_col: str = "keyspace",
    table_col: str = "table_name",
    include_system: bool = False,
) -> DataFrame:
    """P2/P3/P5: filter a DataFrame by an entity expression + system policy."""
    keyspaces, pairs = parse_entities(expr)
    out = df
    if keyspaces:
        out = out.filter(F.col(keyspace_col).isin(keyspaces))
    elif pairs:
        cond = F.lit(False)
        for ks, tbl in pairs:
            cond = cond | ((F.col(keyspace_col) == ks) & (F.col(table_col) == tbl))
        out = out.filter(cond)
    if not include_system:
        out = out.filter(classify_keyspace(keyspace_col) == "OTHER")
    return out


def missing_entities(
    requested: DataFrame,
    catalog: DataFrame,
    keyspace_col: str = "keyspace",
    table_col: str = "table_name",
) -> DataFrame:
    """J7: requested entities absent from the on-disk/table catalog — raise
    if non-empty (KeyspaceTable.java:126-149, CassandraData.java:409-435)."""
    return requested.select(keyspace_col, table_col).distinct().join(
        catalog.select(keyspace_col, table_col).distinct(),
        [keyspace_col, table_col],
        "left_anti",
    )


def import_join(
    entities_df: DataFrame,
    local_tables: DataFrame,
    keyspace_col: str = "keyspace",
    table_col: str = "table_name",
) -> DataFrame:
    """J9: restore entities ⨝ local table catalog on (ks, table) to pick up
    the live tableId/path; rows without a local table are dropped
    (RestorationPhase.java:437-451). local_tables is a broadcast-size dim."""
    cat = local_tables.select(
        keyspace_col, table_col, F.col("table_id").alias("local_table_id"), "path"
    )
    return entities_df.join(F.broadcast(cat), [keyspace_col, table_col], "inner")


def rename_remap(
    df: DataFrame,
    rename_pairs: list[tuple[str, str, str, str]],
    keyspace_col: str = "keyspace",
    table_col: str = "table_name",
) -> DataFrame:
    """P12/Q9: remap (keyspace, table) via a broadcast rename map; unmatched
    rows keep their original identity (left join + coalesce)."""
    if not rename_pairs:
        return df
    spark = df.sparkSession
    rm = spark.createDataFrame(
        rename_pairs, "from_ks string, from_t string, to_ks string, to_t string"
    )
    joined = df.join(
        F.broadcast(rm),
        (df[keyspace_col] == rm["from_ks"]) & (df[table_col] == rm["from_t"]),
        "left",
    )
    return joined.withColumn(
        keyspace_col, F.coalesce(rm["to_ks"], df[keyspace_col])
    ).withColumn(table_col, F.coalesce(rm["to_t"], df[table_col])).drop(
        "from_ks", "from_t", "to_ks", "to_t"
    )
