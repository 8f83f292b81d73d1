"""Scale-rehearsal data generator: build sfN as an N× replication of
sf0.1 with consistent key shifts, so bench can run at 10× data without
touching the read-only driver testdata.

Replication rules keep per-operator work scaling honest:
- join keys shift together (orderkey/custkey/partkey/suppkey all move by
  replica*STRIDE), so join fan-outs scale linearly, not quadratically;
- dimension tables (region, nation) stay single-copy, like real dims;
- document text gets a per-replica vocabulary suffix (every word w →
  w_r<i>), so replicas are NOT near-duplicates of each other and dedup
  candidate volume scales with corpus size rather than exploding on
  10-way replica clusters the real corpus wouldn't have;
- embeddings rotate by replica index — norms and coordinate distributions
  preserved, cross-replica cosine ≈ random, so ANN/near-dup workloads
  scale linearly too.

Usage: python tools/gen_sf.py [factor] [out_dir]   (defaults: 10,
/root/repo/.scratch/sf1). Output layout mirrors the testdata dirs:
<out>/<table>.parquet as a parquet DIRECTORY (spark.read handles both).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from esop_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000


def replicate(df: DataFrame, factor: int, shift_cols: list[str]) -> DataFrame:
    out = None
    for i in range(factor):
        rep = df
        for c in shift_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * STRIDE))
        rep = rep.withColumn("_rep", F.lit(i))
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen-sf")
    r = lambda name: spark.read.parquet(f"{SRC}/{name}.parquet")
    w = lambda df, name, parts: df.drop("_rep").repartition(parts).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/{name}.parquet")

    # dims: single copy
    for name in ("region", "nation"):
        r(name).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    w(replicate(r("customer"), factor, ["c_custkey"]), "customer", 8)
    w(replicate(r("supplier"), factor, ["s_suppkey"]), "supplier", 4)
    w(replicate(r("part"), factor, ["p_partkey"]), "part", 8)
    w(replicate(r("orders"), factor, ["o_orderkey", "o_custkey"]), "orders", 16)
    w(
        replicate(r("lineitem"), factor, ["l_orderkey", "l_partkey", "l_suppkey"]),
        "lineitem",
        32,
    )
    w(replicate(r("events"), factor, ["event_id", "user_id"]), "events", 16)

    docs = replicate(r("documents"), factor, ["doc_id"])
    docs = docs.withColumn(
        "text",
        F.when(F.col("_rep") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(x, F.lit("_r"), F.col("_rep").cast("string")),
                ),
                " ",
            )
        ),
    ).withColumn("n_chars", F.length("text").cast(r("documents").schema["n_chars"].dataType))
    w(docs, "documents", 16)

    emb = replicate(r("embeddings"), factor, ["vec_id"])
    dim = len(r("embeddings").select("embedding").first()["embedding"])
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
            F.concat(
                F.slice(F.col("embedding"), (F.col("_rep") % dim) + 1, dim),
                F.slice(F.col("embedding"), F.lit(1), F.col("_rep") % dim),
            )
        ),
    )
    w(emb, "embeddings", 8)
    print("WROTE", out_dir, "factor", factor)


if __name__ == "__main__":
    main()
