"""Driver-gate rehearsal: every queries() entry vs its oracle_sql() in DuckDB.

Mirrors what the driver does at sf=0.01: run the Ray pipeline and the
SQL on the same parquet tables, compare row count, schema (column
names), and values (order-insensitive, columns sorted by name).
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("VFR_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _normalize(_to_pandas(qfn(SF_DIR)))
    con = _duck(SF_DIR)
    want = _normalize(con.sql(sql).df())
    con.close()

    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        if g.dtype.kind in "fc" or w.dtype.kind in "fc":
            np.testing.assert_array_equal(
                g.astype(np.float64), w.astype(np.float64),
                err_msg=f"{name}.{col} float mismatch",
            )
        else:
            assert (g == w).all(), f"{name}.{col} mismatch"


ROWS_ONLY = [k for k in entrymod.queries() if k not in entrymod.oracle_sql()]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    res = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert res is not None and len(res) >= 0


def test_entry_smoke():
    res = _to_pandas(entrymod.entry())
    assert len(res) > 0
    assert {"doc_id", "window_id", "ts_ms", "window_sum"} <= set(res.columns)
