"""Scale-rehearsal timer: time a named query list at two SF dirs and print
the ratio table SCALE.md records (best-of-3 after one untimed warmup, noop
sink — the bench.py protocol). A ratio at or below the row-count multiple
means at-worst-linear scaling.

Usage:
  python tools/rehearse.py q21_dedup_exact,q22_dedup_minhash_lsh \
      /root/testdata/sf0.1 /root/repo/.scratch/sf10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import _pinned_shuffle_partitions
from esop_spark.session import get_spark


def _sf_of(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return -1.0


def time_queries(spark, names, sf_dir):
    qs = entry_mod.queries()
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_pinned_shuffle_partitions(_sf_of(sf_dir))),
    )
    out = {}
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trials.append(time.perf_counter() - t0)
        out[name] = round(min(trials), 3)
        print(f"  {name} @ {sf_dir}: {out[name]}s", file=sys.stderr)
    return out


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    base_dir, big_dir = sys.argv[2], sys.argv[3]
    spark = get_spark("rehearse")
    base = time_queries(spark, names, base_dir)
    big = time_queries(spark, names, big_dir)
    mult = _sf_of(big_dir) / _sf_of(base_dir)
    print(f"| query | {base_dir} (s) | {big_dir} (s) | ratio (linear={mult:g}) |")
    print("|---|---|---|---|")
    for name in names:
        ratio = round(big[name] / base[name], 2) if base[name] else float("nan")
        print(f"| {name} | {base[name]} | {big[name]} | {ratio} |")


if __name__ == "__main__":
    main()
