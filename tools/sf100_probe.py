"""Third measured decade for the cheapest scale twin: q301 banded-LSH
cosine on an sf100-shaped embeddings corpus (2M vectors — 10× the sf10
rehearsal, 1000× the bench SF). Round-8 verdict #8.

The q301 entry point can't be pointed at the probe dir (load_base_tables
registers every base table and the probe corpus is embeddings-only by
design — replicating 10× of everything buys nothing for this query), so
this times the operator directly with the q301 parameters and the
rehearse.py protocol (1 untimed warmup, best-of-3, noop sink, the sf>=5
shuffle sizing).

Usage: python tools/sf100_probe.py   (expects tools/gen_sf100_embeddings.py
output at .scratch/sf100emb)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esop_spark.operators.similarity import cosine_pairs_lsh
from esop_spark.session import get_spark

SRC = "/root/repo/.scratch/sf100emb/embeddings.parquet"


def main() -> None:
    spark = get_spark("sf100-probe", shuffle_partitions=256)
    emb = spark.read.parquet(SRC)
    n = emb.count()

    def q():
        cosine_pairs_lsh(
            emb, threshold=0.45, bands=8, band_planes=3, dim=64
        ).write.format("noop").mode("overwrite").save()

    q()  # untimed warmup
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        q()
        trials.append(round(time.perf_counter() - t0, 2))
    pairs = cosine_pairs_lsh(
        emb, threshold=0.45, bands=8, band_planes=3, dim=64
    ).count()
    print(f"vectors={n} pairs={pairs}")
    print(f"q301_cosine_pairs_lsh @ sf100emb: best-of-3 {min(trials)}s trials={trials}")


if __name__ == "__main__":
    main()
