"""Golden-fixture generator for queries with no SQL oracle (binary codec
paths DuckDB cannot run: q93 image dHash, q184 audio near-dup — see
esop_spark/operators/multimodal.py; the stand-in codecs are deterministic,
so their outputs are stable golden values, not snapshots of chance).

Writes tools/golden/<sf_tail>/<query>.json with the SAME normalization
tools/check_oracle.py applies to oracle comparisons (columns sorted by
name, floats rounded to 6dp, rows sorted), so the sweep can value-compare
instead of rows-only.

Usage: python tools/make_golden.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from esop_spark.session import get_spark
from check_oracle import normalize  # noqa: E402  (same dir)


def golden_path(sf_dir: str, name: str) -> str:
    tail = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "golden", tail, f"{name}.json"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    spark = get_spark("make-golden")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        cols = df.columns
        rows = normalize([tuple(r) for r in df.collect()], cols)
        path = golden_path(sf_dir, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(
                {"query": name, "sf_dir_tail": os.path.basename(sf_dir.rstrip("/")),
                 "cols": sorted(cols), "rows": [list(r) for r in rows]},
                fh,
                separators=(",", ":"),
            )
            fh.write("\n")
        print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
