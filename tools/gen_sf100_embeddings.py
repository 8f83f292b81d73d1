"""sf100-shaped EMBEDDINGS-ONLY probe corpus: 10× replication of the
.scratch/sf10 embeddings table (2M vectors), so the cheapest scale twin —
q301 banded-LSH cosine, 8.5 s at sf10 — gets a second measured decade under
the 100 TB claim without replicating the whole corpus (round-8 verdict #8).

Same replication rules as tools/gen_sf.py: vec_ids shift by replica·STRIDE²
(the sf10 ids already carry one STRIDE shift), vectors rotate by replica
index so cross-replica cosine ≈ random and candidate volume scales linearly
rather than exploding on 10-way replica clusters a real corpus wouldn't
have.

Usage: python tools/gen_sf100_embeddings.py
Writes /root/repo/.scratch/sf100emb/embeddings.parquet (~320 MB).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esop_spark.session import get_spark

SRC = "/root/repo/.scratch/sf10/embeddings.parquet"
OUT_DIR = "/root/repo/.scratch/sf100emb"
STRIDE2 = 10_000_000_000  # clear of gen_sf's 1e8-stride sf10 id range


def main() -> None:
    spark = get_spark("gen-sf100-emb")
    src = spark.read.parquet(SRC)
    dim = len(src.select("embedding").first()["embedding"])
    out = None
    for i in range(10):
        rep = src.withColumn("vec_id", F.col("vec_id") + F.lit(i * STRIDE2))
        if i:
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), i + 1, dim),
                    F.slice(F.col("embedding"), 1, i),
                ),
            )
        out = rep if out is None else out.unionByName(rep)
    os.makedirs(OUT_DIR, exist_ok=True)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{OUT_DIR}/embeddings.parquet"
    )
    print("WROTE", OUT_DIR)


if __name__ == "__main__":
    main()
