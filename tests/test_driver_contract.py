"""Simulate the driver contract: ray already initialized, import
__ray_entry__, call entry()/queries()/oracle_sql(); spot-check a few
queries against DuckDB at sf0.001 (the driver runs the full comparison
at sf0.01)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__

    return __ray_entry__


def _to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_entry_returns_rows(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "doc_id" in df.columns and "spans" in df.columns


def test_queries_and_oracles_consistent(entry_mod):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()
    assert len(qs) >= 25
    assert set(sql) <= set(qs)
    assert len(sql) >= 15


@pytest.mark.parametrize("name", ["g1_lineitem_agg", "dedup_exact",
                                  "tokens_by_lang", "m9_status_filter"])
def test_query_matches_duckdb(entry_mod, name):
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    got = _to_pandas(qs[name](SF))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(sqls[name]).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    got = got[cols].sort_values(cols, ignore_index=True)
    exp = exp[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
