"""Guard the TPC-H fill-in wave's fixture constants (q241-q255).

The queries pin selective literals (nation names, brands, a region, a market
segment, a part type) that were hand-verified against the generated parquet
fixtures. A future fixture regeneration could silently remove one and turn a
query into a correct-looking empty result. This test asserts every pinned
constant still selects rows — via DuckDB, so it runs in milliseconds with no
SparkSession.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

# (table, column, constant) for every literal the TPC-H wave pins.
PINNED = [
    ("customer", "c_mktsegment", entry_mod.Q3_SEGMENT),
    ("nation", "n_name", entry_mod.Q7_NATION_A),
    ("nation", "n_name", entry_mod.Q7_NATION_B),
    ("nation", "n_name", entry_mod.Q8_NATION),
    ("nation", "n_name", entry_mod.Q11_NATION),
    ("region", "r_name", entry_mod.Q8_REGION),
    ("part", "p_type", entry_mod.Q8_TYPE),
    ("part", "p_type", entry_mod.Q2_TYPE),
    ("part", "p_brand", entry_mod.Q17_BRAND),
    *[("part", "p_brand", b[0]) for b in entry_mod.Q19_BRANCHES],
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pinned_constants_exist_in_fixtures(sf_dir: str) -> None:
    con = duckdb.connect()
    for table, column, value in PINNED:
        path = os.path.join(sf_dir, f"{table}.parquet")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet(?) WHERE {column} = ?",
            [path, value],
        ).fetchone()[0]
        assert n > 0, (
            f"{sf_dir}/{table}.{column} has no rows equal to {value!r}; "
            "a fixture regeneration broke a q241-q255 pinned constant"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q9_name_token_matches_parts(sf_dir: str) -> None:
    con = duckdb.connect()
    path = os.path.join(sf_dir, "part.parquet")
    n = con.execute(
        "SELECT COUNT(*) FROM read_parquet(?) WHERE p_name LIKE ?",
        [path, f"%{entry_mod.Q9_TOKEN}%"],
    ).fetchone()[0]
    assert n > 0, f"no part name contains {entry_mod.Q9_TOKEN!r} in {sf_dir}"
