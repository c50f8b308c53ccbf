"""Referential-integrity audit: planted-corruption proof.

The live testdata is FK-consistent, so ``q_fk_audit``'s green oracle
row there only proves the zero case.  This test clones sf0.001 and
corrupts ``customer.c_nationkey`` — planting NULLs and two distinct
orphan keys — then asserts the audit pinpoints exactly that relation
with exact orphan/null counts while every other relation stays clean.
"""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["customer", "events", "lineitem", "nation", "orders",
          "part", "region", "supplier"]


@pytest.fixture(scope="module")
def corrupted_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("fk_corrupt")
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(d / "customer.parquet")
    nk = tbl["c_nationkey"].to_numpy(zero_copy_only=False).astype("float64")
    # rows 0-2 -> NULL fk; rows 3-4 -> orphan key 777; row 5 -> orphan 888
    nk[0:3] = np.nan
    nk[3:5] = 777.0
    nk[5] = 888.0
    col = pa.array(
        [None if np.isnan(v) else int(v) for v in nk], pa.int64())
    tbl = tbl.set_column(tbl.schema.get_field_index("c_nationkey"),
                         "c_nationkey", col)
    pq.write_table(tbl, d / "customer.parquet")
    return str(d)


def test_fk_audit_flags_planted_corruption(corrupted_sf):
    from video_features_ray.pipelines.queries import q_fk_audit

    df = q_fk_audit(corrupted_sf).set_index("relation")
    row = df.loc["customer.c_nationkey->nation"]
    n_cust = pq.ParquetFile(f"{corrupted_sf}/customer.parquet") \
               .metadata.num_rows
    assert row["child_rows"] == n_cust
    assert row["null_fk_rows"] == 3
    assert row["orphan_keys"] == 2          # 777 and 888
    assert row["orphan_rows"] == 3          # two 777 rows + one 888 row
    # distinct_keys counts non-null distinct values incl. the orphans
    real = pq.read_table(f"{corrupted_sf}/customer.parquet",
                         columns=["c_nationkey"])["c_nationkey"]
    expect_distinct = len(set(v.as_py() for v in real
                              if v.is_valid))
    assert row["distinct_keys"] == expect_distinct
    # every other relation is untouched
    clean = df.drop(index="customer.c_nationkey->nation")
    assert (clean["orphan_keys"] == 0).all()
    assert (clean["orphan_rows"] == 0).all()
    assert (clean["null_fk_rows"] == 0).all()


def test_fk_audit_clean_on_live_data():
    from video_features_ray.pipelines.queries import q_fk_audit

    df = q_fk_audit(SF)
    assert len(df) == 8
    assert (df["orphan_keys"] == 0).all()
    assert (df["orphan_rows"] == 0).all()
    assert (df["null_fk_rows"] == 0).all()
    assert (df["child_rows"] >= df["distinct_keys"]).all()
