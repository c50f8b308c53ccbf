"""Property-based tests: vectorized window stage ≡ oracle loops for
arbitrary geometry (hypothesis). No Ray — pure stage-function checks."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from video_features_ray.oracle import windows_for_doc
from video_features_ray.specs import EncoderSpec
from video_features_ray.stages.windows import slide_windows


def _table(tokens_list):
    flat = np.concatenate(tokens_list) if tokens_list else np.array([], np.int32)
    offs = np.concatenate(([0], np.cumsum([len(t) for t in tokens_list])))
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(tokens_list))]),
        "tokens": pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()),
                                           pa.array(flat, pa.int32())),
        "n_tok": pa.array(np.diff(offs).astype(np.int32)),
        "source": pa.array(["s"] * len(tokens_list)),
    })


kind_st = st.sampled_from(["w1", "w2", "framewise", "flow"])


@settings(max_examples=60, deadline=None)
@given(
    kind=kind_st,
    stack=st.integers(1, 24),
    step=st.integers(1, 24),
    lengths=st.lists(st.integers(0, 120), min_size=1, max_size=6),
    resample=st.sampled_from([None, ("fps", 10.0), ("fps", 40.0), ("total", 7)]),
    data=st.data(),
)
def test_stage_equals_oracle(kind, stack, step, lengths, resample, data):
    if kind == "flow":
        stack, step = 2, 1
    if kind == "framewise":
        stack, step = 1, 1
    kw = {}
    if resample is not None:
        if resample[0] == "fps":
            kw["resample_fps"] = resample[1]
        else:
            kw["resample_total"] = resample[1]
    spec = EncoderSpec(f"prop_{kind}_{stack}_{step}", kind, stack, step, 4, **kw)

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    toks = [rng.integers(0, 49408, n, dtype=np.int32) for n in lengths]
    got = slide_windows(_table(toks), spec)

    want_rows = []
    for i, t in enumerate(toks):
        for r in windows_for_doc(t, spec):
            r["doc_id"] = f"d{i}"
            want_rows.append(r)

    assert len(got) == len(want_rows)
    if not want_rows:
        return
    got_sorted = got.to_pandas().sort_values(["doc_id", "window_id"]).reset_index(drop=True)
    want_sorted = sorted(want_rows, key=lambda r: (r["doc_id"], r["window_id"]))
    for grow, wrow in zip(got_sorted.itertuples(), want_sorted):
        assert grow.doc_id == wrow["doc_id"]
        assert grow.window_id == wrow["window_id"]
        assert abs(grow.ts_ms - wrow["ts_ms"]) < 1e-9
        assert np.array_equal(np.asarray(grow.window_tokens), wrow["window_tokens"])


@settings(max_examples=30, deadline=None)
@given(
    stack=st.integers(1, 10),
    step=st.integers(1, 10),
    inner_win=st.integers(2, 30),
    inner_hop=st.integers(1, 20),
    n=st.integers(0, 400),
    seed=st.integers(0, 2**31),
)
def test_vggish_property(stack, step, inner_win, inner_hop, n, seed):
    spec = EncoderSpec("prop_vgg", "vggish", stack, step, 4,
                       inner_win=inner_win, inner_hop=inner_hop)
    rng = np.random.default_rng(seed)
    toks = [rng.integers(0, 49408, n, dtype=np.int32)]
    got = slide_windows(_table(toks), spec).to_pandas()
    want = windows_for_doc(toks[0], spec)
    assert len(got) == len(want)
    for g, w in zip(got.sort_values("window_id").itertuples(), want):
        assert np.array_equal(np.asarray(g.window_tokens), w["window_tokens"])
        assert abs(g.ts_ms - w["ts_ms"]) < 1e-9
