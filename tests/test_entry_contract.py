"""Driver-contract surface: entry() smoke, queries()/oracle_sql() shape, and
a fast spot-check of two oracle pairs at sf0.001 (the full 36-pair sweep
runs via tools/check_oracle.py at sf0.01)."""
from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"conv_id", "n_turns", "conv_md"}


def test_oracle_keys_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) >= 35


@pytest.mark.parametrize("name", ["q1_pricing_summary", "x4_kie_fields"])
def test_oracle_spot_check(spark, name):
    from tools.check_oracle import table_digest
    q = entry.queries()[name]
    sdf = q(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in entry.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    rel = con.sql(entry.oracle_sql()[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert len(srows) == len(drows)
    assert sorted(sdf.columns) == sorted(dcols)
    assert table_digest(sdf.columns, srows) == table_digest(dcols, drows)


def test_approx_distinct_within_tolerance(spark):
    row = entry.queries()["a15_approx_distinct"](spark, SF).collect()[0]
    assert abs(row["approx_parts"] - row["exact_parts"]) <= 0.05 * row["exact_parts"]
