"""Planted proofs for the cohort-retention matrix and pair-lift ops.

The live events table is dense (every user active every week), so its
oracle row only exercises the full-retention diagonal.  Here a sparse
synthetic events table with known churn pins the non-trivial cells,
and pair_lift is cross-checked against a brute-force pandas basket
computation on sf0.001.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
WEEK = 604800


@pytest.fixture(scope="module")
def sparse_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("retention")
    # anchor at an exact epoch-week boundary so cells are unambiguous
    w0 = 2_800 * WEEK
    rows = []
    # cohort week 2800: users 1,2,3 start; 1 active wks 0,1,2;
    # 2 active wks 0,2; 3 active wk 0 only
    for u, offs in [(1, [0, 1, 2]), (2, [0, 2]), (3, [0])]:
        for o in offs:
            rows.append((u, w0 + o * WEEK + 17))
    # cohort week 2801: users 4,5; 4 active wks 0,1; 5 active wk 0
    for u, offs in [(4, [0, 1]), (5, [0])]:
        for o in offs:
            rows.append((u, w0 + WEEK + o * WEEK + 99))
    # duplicate events within a week must not double-count
    rows.append((1, w0 + 42))
    uid = pa.array([r[0] for r in rows], pa.int64())
    ts = pa.array(
        np.array([r[1] for r in rows], dtype="int64").view("datetime64[s]")
        .astype("datetime64[us]"))
    pq.write_table(pa.table({"event_id": uid, "ts": ts, "user_id": uid}),
                   d / "events.parquet")
    return str(d)


def test_weekly_retention_planted(sparse_events_dir):
    from video_features_ray.pipelines.queries import q_weekly_retention

    df = q_weekly_retention(sparse_events_dir)
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in df.itertuples()}
    assert got == {
        (2800, 0): 3, (2800, 1): 1, (2800, 2): 2,
        (2801, 0): 2, (2801, 1): 1,
    }


def test_pair_lift_matches_bruteforce():
    from video_features_ray.pipelines.queries import q_pair_lift

    got = q_pair_lift(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    d = li.drop_duplicates()
    n_orders = d["l_orderkey"].nunique()
    ic = d.groupby("l_partkey").size()
    p = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
    p = p[p["l_partkey_a"] < p["l_partkey_b"]]
    pc = p.groupby(["l_partkey_a", "l_partkey_b"]).size()
    pc = pc[pc >= 3]
    assert len(got) == len(pc)
    for (a, b), n_ab in pc.items():
        row = got[(got["part_a"] == a) & (got["part_b"] == b)].iloc[0]
        assert row["n_ab"] == n_ab
        assert row["n_a"] == ic[a] and row["n_b"] == ic[b]
        expect = float(np.int64(n_ab) * np.int64(n_orders)) / float(
            np.int64(ic[a]) * np.int64(ic[b]))
        assert row["lift"] == expect
        assert row["lift"] > 0
