"""One-off stage decomposition for q304_weighted_minhash_lsh (round 12):
time each pipeline stage through the noop sink in one session — where do
the ~4.6 s go? Stages: base materialization (replicated elements),
signature aggregation, band buckets, candidate pairs, full query.

Usage: python tools/q304_decompose.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import _pinned_shuffle_partitions
from esop_spark.operators import dedup
from esop_spark.operators.dedup import (
    _band_buckets,
    _bucket_pairs,
    _weighted_lsh_candidates,
    minhash_signatures,
    release_shared_relations,
)
from esop_spark.session import get_spark
from esop_spark.sources import fixtures


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        "q304-decompose",
        shuffle_partitions=_pinned_shuffle_partitions(sf),
        console_progress=False,
    )
    qs = entry_mod.queries()
    docs = fixtures.load_base_tables(spark, sf_dir)["documents"]

    from __spark_entry__ import WMH_BANDS, WMH_HASHES

    def stages():
        tf = dedup.word_tf(docs)
        cands, base = _weighted_lsh_candidates(
            docs, WMH_HASHES, WMH_BANDS, 10, "text", "doc_id", "md5"
        )
        sig = minhash_signatures(
            docs, WMH_HASHES, id_col="doc_id", hash_family="md5", base=base
        )
        buckets = _band_buckets(sig, WMH_HASHES, WMH_BANDS, "md5", "doc_id")
        return {
            "word_tf": tf,
            "base_only": base,
            "signatures": sig,
            "buckets": buckets,
            "candidates": cands,
            "full_q304": qs["q304_weighted_minhash_lsh"](spark, sf_dir),
        }

    for name, df in stages().items():
        release_shared_relations()
        spark.catalog.clearCache()
        fixtures.reset_registration_cache()
        # rebuild lazily per stage so shared persists start cold, then
        # warm once and time 3
        noop(df)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            noop(df)
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name:12s} warm trials {ts}", flush=True)


if __name__ == "__main__":
    main()
