"""Property tests for the model-evaluation family (exact AUC,
calibration bins), the Pareto-frontier skyline and the one-pass
correlation matrix — brute-force oracles plus partition invariance.
(The DuckDB value-hash parity for the four driver queries runs in
test_oracle_parity.py.)"""

import numpy as np
import pandas as pd
import ray.data


def _brute_auc(score: np.ndarray, label: np.ndarray) -> float:
    """O(P·N) pairwise Mann-Whitney with half-credit ties."""
    pos = score[label == 1]
    neg = score[label == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (float(wins) + 0.5 * float(ties)) / (len(pos) * len(neg))


def test_auc_matches_bruteforce_with_ties():
    from video_features_ray.stages.mleval import auc_exact

    rng = np.random.default_rng(7)
    score = rng.integers(0, 50, size=800).astype(np.int64)  # heavy ties
    label = (rng.random(800) < 0.3).astype(np.int64)
    df = pd.DataFrame({"sc": score, "lab": label})
    out = auc_exact(ray.data.from_pandas(df), "sc", "lab")
    assert int(out["n_pos"][0]) == int(label.sum())
    assert int(out["n_neg"][0]) == int((1 - label).sum())
    assert abs(float(out["auc"][0]) - _brute_auc(score, label)) < 1e-12


def test_auc_perfect_separation_and_partition_invariance():
    from video_features_ray.stages.mleval import auc_exact

    score = np.r_[np.arange(100, 200), np.arange(100)].astype(np.int64)
    label = np.r_[np.ones(100), np.zeros(100)].astype(np.int64)
    df = pd.DataFrame({"sc": score, "lab": label})
    a1 = auc_exact(ray.data.from_pandas(df), "sc", "lab")
    a2 = auc_exact(ray.data.from_pandas(df).repartition(7), "sc", "lab")
    assert float(a1["auc"][0]) == 1.0
    assert float(a1["auc"][0]) == float(a2["auc"][0])
    # degenerate single-class input -> -1.0 sentinel
    onecls = pd.DataFrame({"sc": score, "lab": np.ones(200, np.int64)})
    assert float(auc_exact(ray.data.from_pandas(onecls),
                           "sc", "lab")["auc"][0]) == -1.0


def test_calibration_bins_invariants():
    from video_features_ray.stages.mleval import calibration_bins

    rng = np.random.default_rng(11)
    score = rng.integers(0, 10_000, size=2_000).astype(np.int64)
    label = (rng.random(2_000) < (score / 10_000)).astype(np.int64)
    df = pd.DataFrame({"sc": score, "lab": label})
    out = calibration_bins(ray.data.from_pandas(df), "sc", "lab",
                           n_bins=10)
    assert int(out["n"].sum()) == 2_000
    # lift * overall == pos_rate (same floats, same op order)
    overall = float(label.sum()) / 2_000.0
    np.testing.assert_allclose(out["lift"] * overall, out["pos_rate"],
                               rtol=1e-12)
    # a score correlated with the label must produce increasing lift
    assert float(out["pos_rate"].iloc[-1]) > float(out["pos_rate"].iloc[0])
    # partition invariance
    out2 = calibration_bins(ray.data.from_pandas(df).repartition(5),
                            "sc", "lab", n_bins=10)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def _brute_frontier(df: pd.DataFrame) -> set:
    keep = set()
    rows = list(df.itertuples(index=False))
    for a in rows:
        dominated = any(
            b.lo <= a.lo and b.hi >= a.hi and (b.lo < a.lo or b.hi > a.hi)
            for b in rows)
        if not dominated:
            keep.add((a.id, a.lo, a.hi))
    return keep


def test_pareto_frontier_matches_bruteforce():
    from video_features_ray.stages.skyline import pareto_frontier

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": np.arange(400, dtype=np.int64),
                       "lo": rng.integers(0, 60, 400).astype(np.int64),
                       "hi": rng.integers(0, 60, 400).astype(np.int64)})
    out = pareto_frontier(ray.data.from_pandas(df).repartition(6),
                          "lo", "hi")
    got = set(zip(out["id"].astype(np.int64),
                  out["lo"].astype(np.int64),
                  out["hi"].astype(np.int64)))
    assert got == _brute_frontier(df)


def test_pareto_keeps_all_duplicates_of_a_frontier_point():
    from video_features_ray.stages.skyline import pareto_frontier

    df = pd.DataFrame({"id": np.arange(5, dtype=np.int64),
                       "lo": np.array([1, 1, 2, 3, 3], np.int64),
                       "hi": np.array([9, 9, 5, 9, 1], np.int64)})
    # rows 0 and 1 are identical frontier points -> both kept; row 2 is
    # dominated by them; row 3 ties hi=9 but is pricier -> dominated
    out = pareto_frontier(ray.data.from_pandas(df).repartition(3),
                          "lo", "hi")
    assert sorted(out["id"].astype(int)) == [0, 1]


def test_corr_matrix_matches_numpy():
    from video_features_ray.stages.joins import corr_matrix

    rng = np.random.default_rng(5)
    n = 3_000
    a = rng.integers(0, 100, n).astype(np.int64)
    b = (a * 3 + rng.integers(0, 50, n)).astype(np.int64)
    c = rng.integers(0, 1_000, n).astype(np.int64)
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    out = corr_matrix(ray.data.from_pandas(df).repartition(4),
                      ["a", "b", "c"])
    ref = np.corrcoef(np.stack([a, b, c]))
    want = {("a", "b"): ref[0, 1], ("a", "c"): ref[0, 2],
            ("b", "c"): ref[1, 2]}
    assert len(out) == 3
    for _, row in out.iterrows():
        assert row["n"] == n
        assert abs(row["corr"] - want[(row["col_x"], row["col_y"])]) < 1e-10
    # zero-variance column -> -1.0 sentinel
    dfz = pd.DataFrame({"a": a, "z": np.ones(n, np.int64)})
    outz = corr_matrix(ray.data.from_pandas(dfz), ["a", "z"])
    assert float(outz["corr"][0]) == -1.0


def test_node_clustering_matches_bruteforce():
    from video_features_ray.stages.graph import node_clustering

    rng = np.random.default_rng(13)
    # random oriented distinct edges over 40 nodes
    raw = set()
    for _ in range(200):
        a, b = sorted(rng.integers(0, 40, 2).tolist())
        if a != b:
            raw.add((a, b))
    edges = pd.DataFrame(sorted(raw), columns=["src", "dst"]).astype(
        {"src": np.int64, "dst": np.int64})
    out = (node_clustering(ray.data.from_pandas(edges).repartition(4),
                           num_buckets=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # brute force: adjacency sets
    adj = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _, row in out.iterrows():
        v = int(row["node"])
        nbrs = sorted(adj[v])
        assert int(row["degree"]) == len(nbrs)
        tri = sum(1 for i, x in enumerate(nbrs) for y in nbrs[i + 1:]
                  if y in adj[x])
        assert int(row["triangles"]) == tri, v
        d = len(nbrs)
        want = 0.0 if d < 2 else 2.0 * tri / (d * (d - 1))
        assert abs(float(row["coeff"]) - want) < 1e-12
    assert set(out["node"]) == set(adj)


def test_readability_run_counting_row_boundaries():
    """A row beginning with punctuation must start its own run even
    when the previous row ENDED with punctuation (the flat-codepoint
    carry bug this guards against), and distinct-word counts are
    exact per row."""
    import pyarrow as pa

    from video_features_ray.stages.text import readability_stats

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["end with dots...", "...start! with? dots.",
                          "a a b aa a"]),
    })
    out = readability_stats(batch).to_pandas()
    # doc1 ends with "..." and doc2 BEGINS with "..." — in the flat
    # codepoint stream these are adjacent, and doc2's leading run must
    # still count (runs: "...", "!", "?", "." -> 4)
    assert out["n_sentences"].tolist() == [1, 4, 0]
    assert out["n_words"].tolist() == [3, 3, 5]
    # doc 3: words = [a a b aa a] -> 3 distinct of 5 words
    assert out["n_distinct_words"].tolist() == [3, 3, 3]
    assert abs(out["ttr"][2] - 3 / 5) < 1e-15
    # vowel groups: e,i,o / a,i,o / a,a,aa,a
    assert out["n_vowel_groups"].tolist() == [3, 3, 4]
