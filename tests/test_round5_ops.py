"""Round-5 operators: merged duplicated-span intervals, k-anonymity
suppression, watermark late-data accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.stages.events import watermark_late_stats
from video_features_ray.stages.spans import dup_span_ranges


# ---------------------------------------------------------- dup span ranges
def test_dup_span_ranges_planted_merged_interval():
    # two docs share one 60-char span: every 40-gram inside it is
    # duplicated, and the 21 duplicated positions merge to ONE interval
    span = "0123456789" * 6                     # 60 chars
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["AAA" + span + "BBB",          # span at 1-based pos 4
                 span + "CCCC",                 # span at pos 1
                 "x" * 80],                     # unique
    })
    out = (dup_span_ranges(ray.data.from_pandas(docs), k=40,
                           num_buckets=4, doc_buckets=4)
           .to_pandas().sort_values(["doc_id", "span_start"])
           .reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]
    r1, r2 = out.iloc[0], out.iloc[1]
    assert (r1["span_start"], r1["span_end"], r1["n_dup_pos"]) == (4, 63, 21)
    assert (r2["span_start"], r2["span_end"], r2["n_dup_pos"]) == (1, 60, 21)


def test_dup_span_ranges_disjoint_spans_stay_split():
    # two shared 40-char spans separated by >k unique chars per doc ->
    # two intervals per doc, not one
    s1, s2 = "A" * 40, "B" * 40
    gap1, gap2 = "u" * 50, "v" * 50
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [s1 + gap1 + s2, s1 + gap2 + s2],
    })
    out = (dup_span_ranges(ray.data.from_pandas(docs), k=40,
                           num_buckets=2, doc_buckets=2)
           .to_pandas().sort_values(["doc_id", "span_start"])
           .reset_index(drop=True))
    assert len(out) == 4
    d1 = out[out["doc_id"] == 1]
    assert d1["span_start"].tolist() == [1, 91]
    assert d1["span_end"].tolist() == [40, 130]


def test_dup_span_ranges_within_doc_repeat_not_marked():
    t = ("Z" * 40) + "m" + ("Z" * 40)
    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": [t, "w" * 45]})
    out = dup_span_ranges(ray.data.from_pandas(docs), k=40,
                          num_buckets=2, doc_buckets=2).to_pandas()
    assert len(out) == 0


# ------------------------------------------------------------- k-anonymity
def test_kanon_suppresses_small_groups():
    from video_features_ray.pipelines.queries import q_kanon_docs
    import duckdb
    sf = "/root/testdata/sf0.001"
    got = (q_kanon_docs(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    n_docs = con.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    # suppression really filters, and every surviving group has >= 5
    assert 0 < len(got) < n_docs
    sizes = got.groupby(["source", "size_bin"]).size()
    assert (sizes >= 5).all()


# ------------------------------------------------------ watermark lateness
def test_watermark_late_stats_bruteforce():
    rng = np.random.default_rng(17)
    n = 3000
    # timestamps wander so late events genuinely occur
    ts = np.cumsum(rng.integers(-800, 1000, size=n)).astype(np.int64)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts_us": ts,
        "etype": rng.choice(["a", "b", "c"], size=n),
    })
    L = 500
    out = watermark_late_stats(
        ray.data.from_pandas(df).repartition(7), order_col="event_id",
        ts_col="ts_us", group_col="etype", lateness_us=L,
        num_partitions=5)
    # brute force: global exclusive running max in arrival order
    wm = np.concatenate(([np.iinfo(np.int64).min],
                         np.maximum.accumulate(ts)[:-1]))
    late = (np.arange(n) > 0) & (ts + L < wm)
    want = (pd.DataFrame({"etype": df["etype"], "late": late})
            .groupby("etype").agg(n_events=("late", "size"),
                                  n_late=("late", "sum"))
            .reset_index())
    got = out.sort_values("etype").reset_index(drop=True)
    assert got["etype"].tolist() == want["etype"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["n_late"].tolist() == want["n_late"].tolist()
    assert got["n_late"].sum() > 0           # fixture exercises lateness
    np.testing.assert_array_equal(
        got["late_frac"].to_numpy(),
        want["n_late"].to_numpy(np.int64)
        / want["n_events"].to_numpy(np.int64).astype(np.float64))


def test_watermark_first_event_never_late():
    df = pd.DataFrame({
        "event_id": [10, 20, 30],
        "ts_us": [1_000_000, 10, 2_000_000],
        "etype": ["x", "x", "x"],
    })
    out = watermark_late_stats(ray.data.from_pandas(df),
                               order_col="event_id", ts_col="ts_us",
                               group_col="etype", lateness_us=100,
                               num_partitions=3)
    # event 20 is 999990us behind the watermark -> late; others not
    assert out.iloc[0]["n_events"] == 3
    assert out.iloc[0]["n_late"] == 1


def test_user_status_intervals_planted():
    from video_features_ray.pipelines.queries import q_user_status_intervals
    import duckdb
    sf = "/root/testdata/sf0.01"
    got = (q_user_status_intervals(sf).to_pandas()
           .sort_values(["user_id", "valid_from_us"])
           .reset_index(drop=True))
    # intervals tile each user's timeline: every run's valid_to equals
    # the next run's valid_from, and exactly one run per user is open
    for uid, g in got.groupby("user_id"):
        vt = g["valid_to_us"].to_numpy()
        vf = g["valid_from_us"].to_numpy()
        assert np.isnan(vt[-1].astype(np.float64)) or pd.isna(vt[-1])
        if len(g) > 1:
            assert (vt[:-1].astype(np.int64) == vf[1:]).all()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    n_users = con.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert got["valid_to_us"].isna().sum() == n_users
    n_ev = con.sql("SELECT COUNT(*) FROM events").fetchone()[0]
    assert got["n_events"].sum() == n_ev


# ---------------------------------------------------- weighted median
def test_grouped_weighted_median_hand_case():
    from video_features_ray.stages.joins import grouped_weighted_median
    # group a: values 1(w3), 2(w1), 5(w2) -> tot 6, half 3 -> cw(1)=3
    #   -> 2*3 >= 6 at value 1 => median 1
    # group b: tie run at value 4: 3(w1), 4(w1), 4(w2), 9(w4) -> tot 8,
    #   crossing lands INSIDE the 4-run (cw 2 then 4; 2*4 >= 8) => 4
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "b", "b"],
        "v": [1, 2, 5, 3, 4, 4, 9],
        "w": [3, 1, 2, 1, 1, 2, 4],
    })
    out = (grouped_weighted_median(ray.data.from_pandas(df),
                                   "g", "v", "w", num_buckets=3)
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["g"].tolist() == ["a", "b"]
    assert out["wmedian"].tolist() == [1, 4]


def test_grouped_weighted_median_unit_weights_match_quantile_disc():
    from video_features_ray.stages.joins import (grouped_quantile_disc,
                                                 grouped_weighted_median)
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 400),
        "v": rng.integers(-50, 50, 400),
    })
    df["w"] = 1
    ds = ray.data.from_pandas(df)
    wm = (grouped_weighted_median(ds, "g", "v", "w", num_buckets=4)
          .to_pandas().sort_values("g").reset_index(drop=True))
    qd = grouped_quantile_disc(ds, "g", "v", q=0.5)
    # lower weighted median with unit weights = element at rank
    # ceil(n/2) = quantile_disc(0.5)
    assert wm["wmedian"].tolist() == qd["q0.5"].astype(np.int64).tolist()


def test_alloc_docs_budget_sums_to_budget_and_is_proportional():
    from video_features_ray.pipelines.queries import q_alloc_docs_budget
    out = q_alloc_docs_budget("/root/testdata/sf0.001")
    assert out["alloc"].sum() == 10_000
    # every quota within 1 of the exact proportional share
    tot = out["n_docs"].sum()
    exact = 10_000 * out["n_docs"].to_numpy() / tot
    assert (np.abs(out["alloc"].to_numpy() - exact) < 1.0).all()


def test_proportional_sample_budget_exact_and_proportional():
    from video_features_ray.pipelines.queries import (q_proportional_sample,
                                                      _hamilton)
    out = q_proportional_sample("/root/testdata/sf0.001")
    assert len(out) == 200                      # budget-exact
    per = out.groupby("source").size()
    # each source's draw equals its Hamilton quota (within 1 of share)
    import duckdb
    con = duckdb.connect()
    cnt = con.sql("SELECT source, COUNT(*) n FROM read_parquet("
                  "'/root/testdata/sf0.001/documents.parquet') "
                  "GROUP BY source ORDER BY source").df()
    quota = _hamilton(cnt["n"].to_numpy(np.int64), 200)
    got = per.reindex(cnt["source"]).fillna(0).to_numpy(np.int64)
    assert (got == quota).all()


def test_hamilton_ties_break_by_index():
    from video_features_ray.pipelines.queries import _hamilton
    # equal remainders: the +1 goes to the LOWER index (source asc)
    cnt = np.array([3, 3, 3, 3], dtype=np.int64)   # tot 12, budget 6
    # shares 1.5 each -> floors 1, remainders all 6 -> k=2 -> idx 0,1
    assert _hamilton(cnt, 6).tolist() == [2, 2, 1, 1]
    assert _hamilton(cnt, 6).sum() == 6


def test_grouped_weighted_quantile_extremes():
    from video_features_ray.stages.joins import grouped_weighted_median
    df = pd.DataFrame({"g": ["a"] * 4, "v": [1, 5, 7, 9],
                       "w": [1, 2, 3, 4]})
    ds = ray.data.from_pandas(df)
    hi = grouped_weighted_median(ds, "g", "v", "w", pct=100).to_pandas()
    assert hi["wmedian"].tolist() == [9]        # pct=100 -> max
    lo = grouped_weighted_median(ds, "g", "v", "w", pct=1).to_pandas()
    assert lo["wmedian"].tolist() == [1]        # tiny pct -> min
    # pct=90: tot=10, need cw >= 9 -> value 9
    p90 = grouped_weighted_median(ds, "g", "v", "w", pct=90).to_pandas()
    assert p90["wmedian"].tolist() == [9]


def test_grouped_weighted_quantile_property_vs_bruteforce():
    from video_features_ray.stages.joins import grouped_weighted_median
    rng = np.random.default_rng(123)
    for trial in range(3):
        n = int(rng.integers(50, 300))
        df = pd.DataFrame({
            "g": rng.integers(0, 8, n),
            "v": rng.integers(-100, 100, n),
            "w": rng.integers(1, 9, n),
        })
        pct = int(rng.choice([10, 25, 50, 75, 99]))
        got = (grouped_weighted_median(ray.data.from_pandas(df),
                                       "g", "v", "w", pct=pct,
                                       num_buckets=4)
               .to_pandas().sort_values("g").reset_index(drop=True))
        want = []
        for gk, gdf in df.groupby("g"):
            gdf = gdf.sort_values("v", kind="mergesort")
            cw = gdf["w"].cumsum().to_numpy(np.int64)
            tot = int(gdf["w"].sum())
            pick = np.flatnonzero(100 * cw >= pct * tot)[0]
            want.append((gk, int(gdf["v"].to_numpy()[pick])))
        want = pd.DataFrame(want, columns=["g", "wm"]).sort_values(
            "g").reset_index(drop=True)
        assert got["g"].tolist() == want["g"].tolist(), trial
        assert got["wmedian"].tolist() == want["wm"].tolist(), (trial, pct)


def test_k_core_trickle_frontier_bounded_and_exact():
    # sparse ring-of-cliques: peeling trickles a few nodes per round,
    # the historical geometric block blow-up made each round ~6x
    # slower than the last; with coalesced anti joins + max_iter
    # forced finish the result must equal the pure-local fixpoint
    from video_features_ray.stages.graph import k_core
    # 60-node path feeding a 4-clique: only the free path end has
    # degree < 2, so each distributed round peels ONE node — the
    # trickle. The 2-core is exactly the clique.
    edges = [(i, i + 1) for i in range(59)]
    edges += [(59, 60), (59, 61), (59, 62), (60, 61), (60, 62), (61, 62)]
    e = pd.DataFrame(edges, columns=["src", "dst"])
    ds = ray.data.from_pandas(e)
    mixed = k_core(ds, k=2, num_buckets=4, local_finish=8, max_iter=3)
    pure = k_core(ds, k=2, num_buckets=4, local_finish=10**6)
    assert mixed[0].count() == pure[0].count() == 6   # the 4-clique
    assert mixed[2] == pure[2] == 4
    assert mixed[1] <= 4  # 3 distributed rounds + forced local finish
