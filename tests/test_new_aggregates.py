"""sliding_aggregate / distinct_count_per_group / stratified_bottom_k —
edge semantics + block-layout invariance (the SQL-hash parity for the
wired queries lives in test_oracle_parity via oracle_sql())."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.functions.sketches import stratified_bottom_k
from video_features_ray.stages.dedup import distinct_count_per_group
from video_features_ray.stages.joins import sliding_aggregate


def test_sliding_window_membership():
    """t=0 belongs to starts {0, -step}; a row on a window edge belongs
    to the window starting there but not the one ending there."""
    t = pa.table({"ts": pa.array([0.0, 100.0, 200.0, 199.999])})
    out = (sliding_aggregate(
        ray.data.from_arrow(t.append_column("v", pa.array([1, 1, 1, 1]))),
        "ts", "v", window=200.0, step=100.0)
        .to_pandas().sort_values("window_start").reset_index(drop=True))
    got = dict(zip(out["window_start"], out["n"]))
    assert got[-100.0] == 1          # only t=0 — windows are end-exclusive
    assert got[0.0] == 3             # 0, 100, 199.999
    assert got[100.0] == 3           # 100, 199.999, 200
    assert got[200.0] == 1           # 200 only


def test_distinct_count_partition_invariant():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 5000),
                       "v": rng.integers(0, 300, 5000)})
    want = df.groupby("g")["v"].nunique()
    for nblocks in (2, 17):
        out = distinct_count_per_group(
            ray.data.from_pandas(df).repartition(nblocks), "g", "v"
        ).to_pandas().set_index("g")["n_distinct"]
        for g in want.index:
            assert out[g] == want[g], (nblocks, g)


def test_stratified_bottom_k_partition_invariant_and_exact():
    import hashlib

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"src": rng.choice(["w", "x", "y"], 900),
                       "id": np.arange(900)})
    a = stratified_bottom_k(ray.data.from_pandas(df).repartition(3), "src", "id", k=4)
    b = stratified_bottom_k(ray.data.from_pandas(df).repartition(19), "src", "id", k=4)
    pd.testing.assert_frame_equal(a, b)
    # matches the naive definition exactly
    df2 = df.assign(h=[hashlib.md5(str(i).encode()).hexdigest() for i in df["id"]])
    want = (df2.sort_values(["h", "id"]).groupby("src", sort=False).head(4))
    for src in ("w", "x", "y"):
        assert sorted(a[a.src == src]["id"]) == sorted(want[want.src == src]["id"])
