"""pad/truncate, clean_text, clamp-quantize, top-k predictions, summary,
validation (SURVEY §2.2 / §2.6 operators)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.stages.prep import (
    EOT,
    SOT,
    clamp_quantize,
    clean_text,
    pad_truncate,
    summarize_features,
    topk_predictions,
    validate_sequences,
)


def _seq_table(lens):
    toks = [np.arange(n, dtype=np.int32) % 49000 for n in lens]
    flat = np.concatenate(toks) if toks else np.array([], np.int32)
    offs = np.concatenate(([0], np.cumsum([len(t) for t in toks])))
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(lens))]),
        "tokens": pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()),
                                           pa.array(flat, pa.int32())),
    })


def test_pad_truncate():
    t = pad_truncate(_seq_table([0, 5, 75, 80]), context_length=77)
    rows = t["tokens"].to_pylist()
    assert all(len(r) == 77 for r in rows)
    assert rows[0][:2] == [SOT, EOT]
    assert rows[1][0] == SOT and rows[1][6] == EOT and rows[1][7] == 0
    assert rows[2][76] == EOT             # exactly fits: 75 + SOT + EOT
    assert rows[3][76] == EOT and rows[3][75] == 74  # truncated, EOT last
    with pytest.raises(ValueError):
        pad_truncate(_seq_table([80]), context_length=77, truncate=False)


def test_clean_text():
    t = pa.table({"text": pa.array(["  Hello &amp; World\n\tTwice  ", None])})
    out = clean_text(t)["text"].to_pylist()
    assert out[0] == "hello & world twice"
    assert out[1] == ""


def test_fix_mojibake():
    from video_features_ray.stages.prep import fix_mojibake

    assert fix_mojibake("Ã©tÃ©") == "été"                  # utf-8 read as cp1252
    assert fix_mojibake("naÃ¯ve â€” ok") == "naïve — ok"   # cp1252 punct range
    assert fix_mojibake("ÃƒÂ©") == "é"                     # doubly mangled
    assert fix_mojibake("plain ascii") == "plain ascii"    # untouched
    assert fix_mojibake("déjà vu") == "déjà vu"            # real accents survive
    assert fix_mojibake("中文 unchanged") == "中文 unchanged"  # non-latin1 untouched
    # through the batch stage (repair before unescape/lower)
    t = pa.table({"text": pa.array(["CafÃ© &amp; Bar"])})
    assert clean_text(t)["text"].to_pylist() == ["café & bar"]


def test_clamp_quantize():
    x = np.array([-100.0, -20.0, 0.0, 20.0, 100.0])
    q = clamp_quantize(x)
    assert q.tolist() == [0, 0, 128, 255, 255]
    assert q.dtype == np.uint8


def test_topk_predictions():
    scores = np.zeros((4, 10), dtype=np.float32)
    for i in range(4):
        scores[i, i] = 5.0
        scores[i, 9] = 2.0
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(4)],
                       "feature": list(scores)})
    labels = {i: f"L{i}" for i in range(10)}
    out = topk_predictions(ray.data.from_pandas(df), labels, k=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i in range(4):
        assert out.loc[i, "topk_labels"][0] == f"L{i}"
        assert out.loc[i, "topk_labels"][1] == "L9"
        p = out.loc[i, "topk_probs"]
        assert p[0] > p[1] > 0


def test_summarize_features():
    mats = [np.array([1.0, -2.0, 3.0], np.float32), np.array([10.0, 0.0, -1.0], np.float32)]
    flat = np.concatenate(mats)
    off = np.array([0, 3, 6], np.int32)
    t = pa.table({"feature": pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                                      pa.array(flat, pa.float32()))})
    s = summarize_features(ray.data.from_arrow(t))
    assert s["max"] == 10.0 and s["min"] == -2.0 and s["count"] == 6
    np.testing.assert_allclose(s["mean"], flat.astype(np.float64).mean())


def test_validate_sequences_rejects_dupes():
    good = pa.table({"doc_id": pa.array(["a", "b", "c"])})
    validate_sequences(ray.data.from_arrow(good))  # no raise
    bad = pa.table({"doc_id": pa.array(["a", "b", "a"])})
    with pytest.raises(ValueError, match="non-unique"):
        validate_sequences(ray.data.from_arrow(bad))


def test_profile_columns_report():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.prep import profile_columns

    df = pd.DataFrame({
        "i": np.array([1, 2, 2, 3], dtype=np.int64),
        "f": [1.5, np.nan, 2.5, 2.5],
        "s": ["b", "a", None, "c"],
    })
    # NaN must be a true Arrow null for the null count
    import pyarrow as pa
    t = pa.table({"i": pa.array(df["i"]),
                  "f": pa.array(df["f"], from_pandas=True),
                  "s": pa.array(df["s"])})
    out = profile_columns(ray.data.from_arrow(t).repartition(2),
                          ["i", "f", "s"]).set_index("column")
    assert out.loc["i", "n_rows"] == 4 and out.loc["i", "n_nulls"] == 0
    assert out.loc["i", "min"] == 1.0 and out.loc["i", "max"] == 3.0
    assert out.loc["f", "n_nulls"] == 1
    assert out.loc["f", "min"] == 1.5 and out.loc["f", "max"] == 2.5
    assert out.loc["s", "n_nulls"] == 1
    assert out.loc["s", "min"] == "a" and out.loc["s", "max"] == "c"
    # approx distinct within HLL error of truth (tiny counts are exact)
    assert abs(out.loc["i", "approx_distinct"] - 3) < 0.5
    assert abs(out.loc["s", "approx_distinct"] - 3) < 0.5
