"""HLL distinct sketch, bottom-k sampling, dense token frequencies."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.functions.sketches import (
    HyperLogLog,
    _hash_values,
    approx_distinct,
    bottom_k_sample,
    token_frequencies,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(5)
    vals_a = [f"u{i}" for i in range(5000)]
    vals_b = [f"u{i}" for i in range(2500, 7500)]  # overlap 2500
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_hashes(_hash_values(vals_a))
    b.add_hashes(_hash_values(vals_b))
    merged = a.merge(b)
    est = merged.estimate()
    assert abs(est - 7500) / 7500 < 0.05  # p=12 → ~1.6% std error
    # merge == adding everything to one sketch
    c = HyperLogLog(12)
    c.add_hashes(_hash_values(vals_a + vals_b))
    assert np.array_equal(merged.registers, c.registers)


def test_approx_distinct_dataset():
    t = pa.table({"user_id": pa.array(np.arange(3000, dtype=np.int64) % 1000)})
    est = approx_distinct(ray.data.from_arrow(t).repartition(8), "user_id")
    assert abs(est - 1000) / 1000 < 0.06


def test_bottom_k_deterministic_and_partition_invariant():
    from video_features_ray.functions.sketches import duckdb_hash_int64

    t = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64)),
                  "x": pa.array(np.arange(500, dtype=np.int64) * 2)})
    s1 = bottom_k_sample(ray.data.from_arrow(t).repartition(2), "doc_id", 10)
    s2 = bottom_k_sample(ray.data.from_arrow(t).repartition(16), "doc_id", 10)
    pd.testing.assert_frame_equal(s1, s2)  # invariant to block layout
    h = duckdb_hash_int64(np.arange(500, dtype=np.int64))
    want = np.arange(500)[np.lexsort((np.arange(500), h))][:10]
    assert sorted(s1["doc_id"]) == sorted(want.tolist())


def test_ddsketch_ignores_nan_like_sql():
    from video_features_ray.functions.sketches import DDSketch

    sk = DDSketch(0.01)
    sk.add(np.concatenate([np.arange(1.0, 101.0), np.full(100, np.nan)]))
    assert sk.n == 100
    true = np.quantile(np.arange(1.0, 101.0), 0.5, method="inverted_cdf")
    assert abs(sk.quantile(0.5) - true) / true <= 0.011
    assert sk.quantile(0.99) <= 100 * 1.011   # no fall-off-the-end 0.0


def test_count_min_never_underestimates():
    from video_features_ray.functions.sketches import (
        CountMinSketch, _hash_values, cms_counts)

    rng = np.random.default_rng(3)
    # zipf-ish: few heavy keys, long tail
    keys = rng.zipf(1.5, 50_000).astype(np.int64)
    true = pd.Series(keys).value_counts()
    h_all = _hash_values(pa.array(keys))
    cms = CountMinSketch(width=1 << 14, depth=4)
    cms.add_hashes(h_all)
    uniq = true.index.to_numpy()
    est = cms.estimate_hashes(_hash_values(pa.array(uniq)))
    tv = true.loc[uniq].to_numpy()
    assert (est >= tv).all()                          # never underestimates
    eps = np.e / (1 << 14)
    assert (est - tv <= 3 * eps * cms.n).all()        # CM bound (slack 3x)
    # merge of shards == one sketch
    a, b = CountMinSketch(1 << 14, 4), CountMinSketch(1 << 14, 4)
    a.add_hashes(h_all[:25_000]); b.add_hashes(h_all[25_000:])
    m = a.merge(b)
    assert np.array_equal(m.counts, cms.counts) and m.n == cms.n
    # distributed build
    t = pa.table({"k": pa.array(keys)})
    dist = cms_counts(ray.data.from_arrow(t).repartition(8), "k",
                      width=1 << 14, depth=4)
    assert np.array_equal(dist.counts, cms.counts)


def test_ddsketch_relative_error_and_merge():
    from video_features_ray.functions.sketches import DDSketch, approx_quantile

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.lognormal(3, 2, 20000),
                        -rng.lognormal(1, 1, 5000),
                        np.zeros(100)])
    sk = DDSketch(alpha=0.01)
    sk.add(x)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        true = np.quantile(x, q, method="inverted_cdf")
        got = sk.quantile(q)
        if true != 0:
            assert abs(got - true) / abs(true) <= 0.011, (q, got, true)
    # merge of shards == one sketch
    a, b = DDSketch(0.01), DDSketch(0.01)
    a.add(x[:10000]); b.add(x[10000:])
    m = a.merge(b)
    assert m.n == sk.n and m.zero == sk.zero
    for q in (0.1, 0.5, 0.95):
        assert m.quantile(q) == sk.quantile(q)
    # distributed path over a dataset
    t = pa.table({"v": pa.array(x)})
    got = approx_quantile(ray.data.from_arrow(t).repartition(8), "v",
                          qs=[0.5, 0.99], alpha=0.01)
    for q, g in got.items():
        true = np.quantile(x, q, method="inverted_cdf")
        assert abs(g - true) / abs(true) <= 0.011


def test_approx_quantiles_price_vs_exact():
    """Driver query emits exact_q (bit-matching quantile_cont on the
    cents grid) + a within_alpha guarantee flag; both checked here."""
    import os

    import duckdb

    from video_features_ray.pipelines.queries import q_approx_quantiles_price

    sf = os.environ.get("VFR_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = q_approx_quantiles_price(sf).set_index("q")
    assert bool(got["within_alpha"].all())
    for q in (0.5, 0.9, 0.99):
        exact = duckdb.sql(
            f"SELECT quantile_cont(CAST(round(o_totalprice * 100.0) AS "
            f"BIGINT), {q}) / 100.0 FROM "
            f"read_parquet('{sf}/orders.parquet')").fetchone()[0]
        assert got.loc[q, "exact_q"] == exact, (q, got.loc[q, "exact_q"], exact)


def test_approx_distinct_users_vs_exact():
    """The driver query's HLL estimate must land within 5% of the exact
    DISTINCT count on the real events table (rows-only in the driver
    gate, so this is its accuracy oracle)."""
    import os

    import duckdb

    from video_features_ray.pipelines.queries import q_approx_distinct_users

    sf = os.environ.get("VFR_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = q_approx_distinct_users(sf)
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert int(out["exact_distinct"][0]) == exact
    assert bool(out["within_rel"][0])


def test_token_frequencies():
    toks = [[1, 2, 2, 3], [3, 3, 7], []]
    flat = np.array([x for t in toks for x in t], np.int32)
    off = np.array([0, 4, 7, 7], np.int32)
    t = pa.table({"tokens": pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                                     pa.array(flat, pa.int32()))})
    out = token_frequencies(ray.data.from_arrow(t).repartition(2), top_k=3, vocab_size=10)
    assert list(out["token"]) == [3, 2, 1]   # counts 3,2,1; tie 1 vs 7 → lower id
    assert list(out["n"]) == [3, 2, 1]
