"""Per-query profiler for the optimization rounds: isolated timing (same
session confs + reset regime as bench.py), Spark JOB COUNT per trial (the
local-mode cost model is jobs × scheduling overhead + exchanges), and
``explain("formatted")`` capture to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python tools/qprof.py q301_cosine_pairs_lsh q48_dedup_clusters \
      [--sf /root/testdata/sf0.1] [--plans r11:before] [--trials 5]

The job count comes from running each timed trial in its own job group and
asking the status tracker for the group's job ids — one number that explains
"why is this 5 s on 2,000 rows" faster than any timeline.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from esop_spark.operators.dedup import release_shared_relations
from esop_spark.session import get_spark
from esop_spark.sources import fixtures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument(
        "--plans",
        default="",
        help="tag:suffix, e.g. r11:before -> plans/r11/<q>_before.txt",
    )
    args = ap.parse_args()

    sf = float(args.sf.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in args.sf else -1.0
    from bench import _pinned_shuffle_partitions

    spark = get_spark(
        "esop-qprof",
        shuffle_partitions=_pinned_shuffle_partitions(sf),
        console_progress=False,
    )
    sc = spark.sparkContext
    qs = entry_mod.queries()
    names = []
    for pat in args.queries:
        if pat.endswith("*"):
            names.extend(q for q in qs if q.startswith(pat[:-1]))
        else:
            names.append(pat)

    # same warmup ritual as bench.py
    for _ in range(2):
        qs["q01_list_backups"](spark, args.sf).write.format("noop").mode("overwrite").save()

    def reset() -> None:
        release_shared_relations()
        spark.catalog.clearCache()
        fixtures.reset_registration_cache()
        jmap = sc._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist(False)

    plan_dir = None
    suffix = ""
    if args.plans:
        tag, suffix = args.plans.split(":")
        plan_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            tag,
        )
        os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        reset()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        if plan_dir is not None:
            df = qs[name](spark, args.sf)
            txt = spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(txt)
        trials = []
        jobs = []
        for t in range(args.trials):
            group = f"qprof-{name}-{t}-{uuid.uuid4().hex[:6]}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
        trials_r = [round(x, 3) for x in trials]
        print(
            f"{name}: min={min(trials_r)} med={sorted(trials_r)[len(trials_r)//2]}"
            f" trials={trials_r} jobs/trial={jobs}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
