"""Z-order layout tests: Morton code correctness, write/read
round-trip equality, and the multi-dimensional pruning advantage the
curve exists for (a y-only box prunes files under Z-order but cannot
prune under an x-sorted 1-D layout)."""

import numpy as np
import pandas as pd
import ray.data


def _morton_scalar(x: int, y: int) -> int:
    out = 0
    for i in range(31):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton2_matches_scalar_interleave():
    from video_features_ray.sources.zonemap import morton2

    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 20, 500).astype(np.int64)
    y = rng.integers(0, 1 << 20, 500).astype(np.int64)
    got = morton2(x, y)
    want = np.array([_morton_scalar(int(a), int(b))
                     for a, b in zip(x, y)], np.int64)
    np.testing.assert_array_equal(got, want)


def test_morton2_rejects_out_of_range():
    import pytest

    from video_features_ray.sources.zonemap import morton2

    with pytest.raises(ValueError):
        morton2(np.array([-1], np.int64), np.array([0], np.int64))
    with pytest.raises(ValueError):
        morton2(np.array([1 << 31], np.int64), np.array([0], np.int64))


def _grid_df(n=4096, side=64, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "x": rng.integers(0, side, n).astype(np.int64),
        "y": rng.integers(0, side, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64)})


def test_zorder_roundtrip_and_both_dim_pruning(tmp_path):
    from video_features_ray.sources.zonemap import (read_zordered,
                                                    write_zordered)

    df = _grid_df()
    man = write_zordered(ray.data.from_pandas(df).repartition(8),
                         str(tmp_path), "x", "y", num_files_hint=64)
    assert man["rows"].sum() == len(df)
    # box on BOTH dims: result equals the direct filter, rows exact
    got, files_read, files_total = read_zordered(
        str(tmp_path), "x", "y", 8, 24, 8, 24)
    gdf = got.to_pandas().sort_values("id").reset_index(drop=True)
    want = (df[(df.x >= 8) & (df.x < 24) & (df.y >= 8) & (df.y < 24)]
            .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        gdf[["x", "y", "id"]], want[["x", "y", "id"]])
    assert files_read < files_total


def test_zorder_prunes_where_1d_layout_cannot(tmp_path):
    """A y-only box (all x): the x-sorted 1-D layout overlaps every
    file; the Z-order quadtree cells bound y too, so most skip."""
    from video_features_ray.sources.zonemap import (read_zonemapped,
                                                    read_zordered,
                                                    write_zonemapped,
                                                    write_zordered)

    df = _grid_df()
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(ray.data.from_pandas(df).repartition(8), zdir,
                   "x", "y", num_files_hint=64)
    # 1-D layout: one file per x-range bucket (width 1 -> 64 files)
    write_zonemapped(ray.data.from_pandas(df).repartition(8), ldir,
                     "x", bucket_width=1)
    _, zread, ztotal = read_zordered(zdir, "x", "y", 0, 64, 0, 16)
    _, lread, ltotal = read_zonemapped(ldir, "x", 0, 64)
    assert lread == ltotal          # 1-D on x cannot skip a y-box
    assert zread < ztotal           # the Z-curve can
    assert zread / ztotal <= 0.5    # and skips at least half the files
