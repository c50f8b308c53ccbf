"""global_ntile (stages/rank.py): exact SQL NTILE parity on adversarial
value distributions — the counting-sort scan must survive skew, single
values, and remainder tiles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.rank import global_ntile


def _sql_ntile(df: pd.DataFrame, n: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.sql(
        f"SELECT id, v, CAST(NTILE({n}) OVER (ORDER BY v, id) AS BIGINT) "
        "AS tile FROM t"
    ).df()


def _run(df: pd.DataFrame, n: int, num_buckets: int) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(4)
    out = global_ntile(ds, "v", "id", n=n, num_buckets=num_buckets)
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    return got[["id", "v", "tile"]]


@pytest.mark.parametrize("n,num_buckets", [(10, 8), (4, 3), (7, 16)])
def test_uniform_matches_sql(ray_session, n, num_buckets):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"id": np.arange(257, dtype=np.int64),
                       "v": rng.integers(-50, 50, 257).astype(np.int64)})
    got = _run(df, n, num_buckets)
    want = _sql_ntile(df, n).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[["id", "v", "tile"]])


def test_heavy_tie_skew(ray_session):
    # 90% of rows share ONE value — ties broken by id, all in one
    # range bucket (the documented skew case must stay CORRECT)
    df = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "v": np.where(np.arange(200) < 180, 5, np.arange(200)).astype(np.int64),
    })
    got = _run(df, 10, 8)
    want = _sql_ntile(df, 10).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[["id", "v", "tile"]])


def test_single_value_and_remainder(ray_session):
    # all-equal values; 23 rows into 5 tiles → first 3 tiles get 5 rows
    df = pd.DataFrame({"id": np.arange(23, dtype=np.int64),
                       "v": np.full(23, 42, dtype=np.int64)})
    got = _run(df, 5, 4)
    want = _sql_ntile(df, 5).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[["id", "v", "tile"]])
    sizes = got.groupby("tile").size().to_numpy()
    assert list(sizes) == [5, 5, 5, 4, 4]


def test_empty(ray_session):
    df = pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                       "v": pd.Series([], dtype=np.int64)})
    ds = ray.data.from_pandas(df)
    out = global_ntile(ds, "v", "id", n=10, num_buckets=8)
    assert len(out.to_pandas()) == 0
