"""Third measured decade for the cheapest scale twin: q301 banded-LSH
cosine on an sf100-shaped embeddings corpus (2M vectors — 10× the sf10
rehearsal, 1000× the bench SF). Round-8 verdict #8.

The q301 entry point can't be pointed at the probe dir (load_base_tables
registers every base table and the probe corpus is embeddings-only by
design — replicating 10× of everything buys nothing for this query), so
this times the operator directly with the q301 parameters: a SINGLE
documented trial (the multi-minute demonstration; the best-of-3 decades
are sf0.1/sf10 in SCALE.md).

Heap note: the run forces SPARK_DRIVER_MEMORY=48g and raises
broadcast_verify_rows to 4M — at 2M vectors the two broadcast verify legs
don't fit the default 8 GiB single-JVM heap, and the alternative shuffle
chain's per-node spill (candidates × vector-bytes ≈ 500 GB) exceeds the
one-box disk. On a cluster either regime is per-node small; only the
single-box probe needs the bigger heap, the same caveat the round-6
q266 row carried.

Usage: python tools/sf100_probe.py   (expects tools/gen_sf100_embeddings.py
output at .scratch/sf100emb)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esop_spark.operators.similarity import cosine_pairs_lsh
from esop_spark.session import get_spark

SRC = "/root/repo/.scratch/sf100emb/embeddings.parquet"


def main() -> None:
    spark = get_spark("sf100-probe", shuffle_partitions=256)
    emb = spark.read.parquet(SRC)
    n = emb.count()
    t0 = time.perf_counter()
    pairs = cosine_pairs_lsh(
        emb, threshold=0.45, bands=8, band_planes=3, dim=64,
        broadcast_verify_rows=4_000_000,
    ).count()
    print(
        f"SF100EMB vectors={n} pairs={pairs} "
        f"wall={round(time.perf_counter() - t0, 1)}s (1 trial, 48g heap)"
    )


if __name__ == "__main__":
    main()
