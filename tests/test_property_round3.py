"""Property-based checks (hypothesis) for the round-3 operators:
range_join vs a naive cross-filter, distributed connected components vs
driver union-find, sessionize_stats vs sessionize→pandas aggregate, and
term_df_topk's tf/df identities — on arbitrary small inputs."""

import pytest
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from video_features_ray.stages.dedup import cluster_pairs, cluster_pairs_distributed
from video_features_ray.stages.events import sessionize, sessionize_stats
from video_features_ray.stages.joins import range_join

_SETTINGS = dict(max_examples=12, deadline=None)


@st.composite
def interval_case(draw):
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    nl = draw(st.integers(1, 40))
    nr = draw(st.integers(1, 20))
    left = pd.DataFrame({
        "k": rng.integers(0, 4, nl).astype(np.int64),
        "ts": rng.integers(-20, 20, nl).astype(np.int64),
        "lid": np.arange(nl, dtype=np.int64),
    })
    lo = rng.integers(-20, 20, nr).astype(np.int64)
    right = pd.DataFrame({
        "k": rng.integers(0, 4, nr).astype(np.int64),
        "lo": lo,
        "hi": lo + rng.integers(0, 15, nr).astype(np.int64),
        "rid": np.arange(nr, dtype=np.int64) + 1000,
    })
    return left, right


@given(interval_case(), st.sampled_from(["both", "left", "right", "neither"]))
@settings(**_SETTINGS)
def test_range_join_property(case, inclusive):
    left, right = case
    got = range_join(ray.data.from_pandas(left).repartition(3),
                     ray.data.from_pandas(right).repartition(2),
                     key="k", left_ts="ts", right_start="lo", right_end="hi",
                     num_buckets=4, inclusive=inclusive).to_pandas()
    # naive reference: full cross product + mask
    ref = left.merge(right, on="k", how="inner")
    lo_ok = ref["lo"] <= ref["ts"] if inclusive in ("both", "left") else ref["lo"] < ref["ts"]
    hi_ok = ref["ts"] <= ref["hi"] if inclusive in ("both", "right") else ref["ts"] < ref["hi"]
    ref = ref[lo_ok & hi_ok]
    want = sorted(zip(ref["lid"], ref["rid"]))
    if len(got) == 0:
        # Ray drops the schema on an all-empty result (0 matching rows)
        assert want == []
        return
    assert sorted(zip(got["lid"], got["rid"])) == want


@st.composite
def edge_case(draw):
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    n = draw(st.integers(1, 60))
    a = rng.integers(0, 25, n)
    b = rng.integers(0, 25, n)
    df = pd.DataFrame({"id_a": [f"n{x}" for x in a], "id_b": [f"n{x}" for x in b]})
    return df[df["id_a"] != df["id_b"]]


@given(edge_case())
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_distributed_cc_property(pairs):
    if len(pairs) == 0:
        return
    want = cluster_pairs(pairs)
    want_losers = {k: v for k, v in zip(want["doc_id"], want["root"]) if k != v}
    got = cluster_pairs_distributed(
        ray.data.from_pandas(pairs).repartition(2), num_buckets=4).to_pandas()
    assert dict(zip(got["doc_id"], got["root"])) == want_losers


@st.composite
def event_stream(draw):
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    n = draw(st.integers(1, 80))
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 5, n).astype(np.int64),
        "t": rng.integers(-40, 40, n).astype(np.int64),
    })


@given(event_stream(), st.integers(1, 20))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_sessionize_stats_property(df, gap):
    ds = ray.data.from_pandas(df).repartition(3)
    got = (sessionize_stats(ds, "k", "t", gap=gap, num_buckets=4,
                            tie_cols=["eid"]).to_pandas()
           .sort_values(["k", "session_id"]).reset_index(drop=True))
    sess = sessionize(ds, "k", "t", gap=gap, num_buckets=4,
                      tie_cols=["eid"]).to_pandas()
    want = (sess.groupby(["k", "session_id"], sort=False)
            .agg(n_events=("t", "size"), t_start=("t", "min"), t_end=("t", "max"))
            .reset_index().sort_values(["k", "session_id"]).reset_index(drop=True))
    want["n_events"] = want["n_events"].astype(np.int64)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_term_df_topk_identities():
    """df of a term == number of docs whose text contains it as a
    space-separated token; tf of a reported term == its count in that
    doc; k bound respected."""
    from video_features_ray.stages.text import term_df_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a b a", "b c", "a a a", "", "c c b", "a"],
    })
    out = term_df_topk(ray.data.from_pandas(docs).repartition(3), k=2,
                       num_buckets=4).to_pandas()
    texts = dict(zip(docs["doc_id"].astype(str), docs["text"]))
    for _, r in out.iterrows():
        toks = texts[r["doc_id"]].split(" ")
        assert r["tf"] == toks.count(r["term"])
        assert r["df"] == sum(r["term"] in t.split(" ") for t in docs["text"])
    assert out.groupby("doc_id").size().max() <= 2
