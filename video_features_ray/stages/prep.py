"""Preprocessing / validation / prediction-surface operators.

Rounds out the reference's per-record map family (SURVEY §2.2/§2.6):

- ``pad_truncate``      — M14: SOT + tokens + EOT, zero-pad to context
  length, truncate-on-overflow (reference
  ``models/clip/clip_src/clip.py:221-240``: context 77, error or
  truncate keeping EOT last).
- ``clean_text``        — M15: html unescape, whitespace collapse,
  lowercase (reference ``simple_tokenizer.py:50-59, 123``; ftfy is not
  in this container → unescape+collapse only, documented).
- ``normalize_tokens``  — M6: the canonical (x-mean)/std scalar map
  (reference ``models/transforms.py:38-42``) over a numeric column.
- ``clamp_quantize``    — M8/M9: clip to [lo,hi] then
  ``round(128 + 255/(hi-lo)·x)`` flow-style uint8 quantizer
  (reference ``transforms.py:158-176``, flow range [-20,20]).
- ``topk_predictions``  — G3 + J1/A5: softmax over a score vector,
  top-k indices mapped through a broadcast label dict (reference
  ``utils/utils.py:28-46`` ``show_predictions_on_dataset``).
- ``summarize_features``— G2/S9: global max/mean/min of a feature
  column (reference prints these per key, ``base_extractor.py:79-82``).
- ``validate_sequences``— M20/G6: unique-doc_id assertion
  (reference ``utils/utils.py:91-92``) + schema check; raises on
  duplicates like the reference's sanity_check.
"""

from __future__ import annotations

import html
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

SOT = 49406  # start-of-text token id (clip.py:226 '<|startoftext|>')
EOT = 49407  # end-of-text token id


def pad_truncate(batch: pa.Table, context_length: int = 77,
                 truncate: bool = True) -> pa.Table:
    """tokens → fixed-length [SOT, *tokens, EOT, 0...] rows.

    Mirrors clip.tokenize: overflow either raises (truncate=False) or
    keeps the first context-2 tokens with EOT forced last.
    """
    col = batch["tokens"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_rows = len(batch)
    out = np.zeros((n_rows, context_length), dtype=np.int32)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    over = lens > context_length - 2
    if over.any() and not truncate:
        i = int(np.argmax(over))
        raise ValueError(
            f"row {i}: {int(lens[i])} tokens exceed context {context_length}"
        )
    # offset-scatter (no per-row Python): gather each row's first
    # min(len, context-2) tokens into columns 1..cap
    cap = np.minimum(lens, context_length - 2)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), cap)
    local = np.arange(int(cap.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(cap) - cap, cap)
    out[row_of, 1 + local] = values[offsets[:-1][row_of] + local]
    out[:, 0] = SOT
    out[np.arange(n_rows), 1 + cap] = EOT
    flat = out.reshape(-1)
    off = np.arange(0, (n_rows + 1) * context_length, context_length, dtype=np.int32)
    padded = pa.ListArray.from_arrays(pa.array(off, pa.int32()), pa.array(flat, pa.int32()))
    return batch.set_column(batch.schema.get_field_index("tokens"), "tokens", padded)


_WS = re.compile(r"\s+")


def fix_mojibake(t: str, max_depth: int = 2) -> str:
    """ftfy's core heuristic (public: ftfy docs §'fixing mojibake'):
    text whose cp1252/latin-1 re-encoding is VALID UTF-8 was almost
    certainly UTF-8 read through the wrong codec — decode it back.
    Applied up to ``max_depth`` times for doubly-mangled text; a string
    that fails either codec round-trip is returned unchanged."""
    for _ in range(max_depth):
        try:
            b = t.encode("cp1252")
        except UnicodeEncodeError:
            try:
                b = t.encode("latin-1")
            except UnicodeEncodeError:
                return t
        try:
            u = b.decode("utf-8")
        except UnicodeDecodeError:
            return t
        if u == t:
            return t
        t = u
    return t


def clean_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """mojibake repair → html unescape → whitespace collapse → strip →
    lower (M15, reference ``simple_tokenizer.py:50-59`` whose ftfy call
    is replaced by the self-contained :func:`fix_mojibake`). ASCII rows
    skip the repair entirely (``str.isascii`` is a C check)."""
    texts = batch[text_col].to_pylist()
    cleaned = [
        _WS.sub(" ", html.unescape(
            t if t.isascii() else fix_mojibake(t))).strip()
        for t in (t or "" for t in texts)
    ]
    arr = pc.utf8_lower(pa.array(cleaned, pa.string()))
    return batch.set_column(batch.schema.get_field_index(text_col), text_col, arr)


def normalize_tokens(batch: pa.Table, col: str, mean: float, std: float,
                     out_col: str | None = None) -> pa.Table:
    x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    return batch.append_column(out_col or f"{col}_norm", pa.array((x - mean) / std))


def clamp_quantize(x: np.ndarray, lo: float = -20.0, hi: float = 20.0) -> np.ndarray:
    """Clamp + flow-style uint8 quantize (transforms.py:158-176)."""
    c = np.clip(x, lo, hi)
    return np.round(128.0 + (255.0 / (hi - lo)) * c).clip(0, 255).astype(np.uint8)


def topk_predictions(
    ds: "ray.data.Dataset",
    labels: dict[int, str],
    score_col: str = "feature",
    k: int = 5,
) -> "ray.data.Dataset":
    """softmax → per-row top-k (argpartition) → broadcast label lookup."""
    ref = ray.put(labels)

    class _TopK:
        def __init__(self):
            self.labels = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[score_col]])
            mat = mat - mat.max(axis=1, keepdims=True)
            e = np.exp(mat)
            p = e / e.sum(axis=1, keepdims=True)
            kk = min(k, p.shape[1])
            part = np.argpartition(-p, kk - 1, axis=1)[:, :kk]
            order = np.argsort(np.take_along_axis(-p, part, axis=1), axis=1)
            idx = np.take_along_axis(part, order, axis=1)
            batch = batch.drop(columns=[score_col])
            batch["topk_ids"] = list(idx.astype(np.int64))
            batch["topk_probs"] = list(np.take_along_axis(p, idx, axis=1))
            batch["topk_labels"] = [
                [self.labels.get(int(i), f"class_{i}") for i in row] for row in idx
            ]
            return batch

    return ds.map_batches(_TopK, batch_format="pandas", concurrency=(1, 8))


def summarize_features(ds: "ray.data.Dataset", col: str = "feature") -> dict:
    """Global max/mean/min over a list<float> column (G2), computed as
    per-batch partials + a tiny final combine — never materializes."""

    def _partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        flat = c.values.to_numpy(zero_copy_only=False)
        if len(c):
            # a SLICED list array's .values spans the whole parent
            # buffer — trim to this block's offsets or out-of-slice
            # rows pollute the stats
            lo, hi = c.offsets[0].as_py(), c.offsets[-1].as_py()
            flat = flat[lo:hi]
        if len(flat) == 0:
            return pa.table({"mx": pa.array([], pa.float64()),
                             "mn": pa.array([], pa.float64()),
                             "sm": pa.array([], pa.float64()),
                             "ct": pa.array([], pa.int64())})
        return pa.table({"mx": [float(flat.max())], "mn": [float(flat.min())],
                         "sm": [float(flat.sum(dtype=np.float64))], "ct": [int(len(flat))]})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return {"max": None, "min": None, "mean": None, "count": 0}
    return {
        "max": float(parts["mx"].max()),
        "min": float(parts["mn"].min()),
        "mean": float(parts["sm"].sum() / max(parts["ct"].sum(), 1)),
        "count": int(parts["ct"].sum()),
    }


def validate_sequences(ds: "ray.data.Dataset") -> None:
    """Raise on duplicate doc_ids (reference asserts unique stems,
    utils/utils.py:91-92). One skinny groupby over ids only."""
    from ray.data.aggregate import Count

    dupes = (
        ds.select_columns(["doc_id"])
        .groupby("doc_id")
        .aggregate(Count(alias_name="n"))
        .filter(lambda r: r["n"] > 1)
        .take(5)
    )
    if dupes:
        ids = [d["doc_id"] for d in dupes]
        raise ValueError(f"non-unique doc_id values (first 5): {ids}")


def profile_columns(ds: "ray.data.Dataset", columns, p: int = 12) -> pd.DataFrame:
    """One-pass table profile — per column: row count, null count,
    min/max, HLL approx-distinct — the pre-training hygiene report
    (null-rate and range checks before features are fit).

    Per batch each column emits ONE skinny partial row (counts, local
    min/max, 2^p HLL registers); the driver merges O(batches × cols)
    partials.  Numeric min/max ride a float64 field, string min/max a
    string field, so the partial schema is uniform across dtypes.
    Everything except approx_distinct is exact (and SQL-mirrorable);
    the HLL carries its usual ~1.6% standard error."""
    from ..functions.sketches import HyperLogLog, _hash_values, _mix64

    columns = list(columns)

    def _hash_any(col):
        # floats: hash the exact bit pattern (distinctness of doubles);
        # temporal/bool: their integer representation; ints/strings:
        # the shared vectorized kernels
        t = col.type
        if pa.types.is_floating(t):
            filled = col.fill_null(0.0) if col.null_count else col
            v = (filled.cast(pa.float64())
                 .to_numpy(zero_copy_only=False).view(np.uint64))
            valid = (col.is_valid().to_numpy(zero_copy_only=False)
                     if col.null_count else np.ones(len(col), dtype=bool))
            return _mix64(v.copy()), valid
        if (pa.types.is_temporal(t) or pa.types.is_boolean(t)):
            as_int = col.cast(pa.int64() if t.bit_width >= 32
                              else pa.int32()).cast(pa.int64())
            return _hash_values(as_int, with_valid=True)
        return _hash_values(col, with_valid=True)

    def _partial(batch: pa.Table) -> pa.Table:
        out = {"column": [], "n_rows": [], "n_nulls": [],
               "min_num": [], "max_num": [], "min_str": [], "max_str": [],
               "regs": []}
        for c in columns:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h, valid = _hash_any(col)
            hll = HyperLogLog(p)
            hll.add_hashes(h[valid])
            mn = mx = None
            if valid.any():
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            is_num = pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
            out["column"].append(c)
            out["n_rows"].append(len(col))
            out["n_nulls"].append(int((~valid).sum()))
            out["min_num"].append(float(mn) if is_num and mn is not None else None)
            out["max_num"].append(float(mx) if is_num and mx is not None else None)
            # non-numeric min/max ride the string field; timestamps
            # stringify to ISO, whose lexicographic order is
            # chronological, so the driver-side min/max stays right
            out["min_str"].append(None if is_num or mn is None else str(mn))
            out["max_str"].append(None if is_num or mx is None else str(mx))
            out["regs"].append(hll.registers.tobytes())
        return pa.table({
            "column": pa.array(out["column"]),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "min_num": pa.array(out["min_num"], pa.float64()),
            "max_num": pa.array(out["max_num"], pa.float64()),
            "min_str": pa.array(out["min_str"], pa.string()),
            "max_str": pa.array(out["max_str"], pa.string()),
            "regs": pa.array(out["regs"], pa.binary()),
        })

    parts = (ds.select_columns(columns)
             .map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    rows = []
    for c in columns:
        g = parts[parts["column"] == c]
        hll = HyperLogLog(p)
        for rb in g["regs"]:
            hll.registers = np.maximum(hll.registers,
                                       np.frombuffer(rb, dtype=np.uint8))
        nums = g["min_num"].dropna()
        strs = g["min_str"].dropna()
        mn = float(nums.min()) if len(nums) else (strs.min() if len(strs) else None)
        nums = g["max_num"].dropna()
        strs = g["max_str"].dropna()
        mx = float(nums.max()) if len(nums) else (strs.max() if len(strs) else None)
        rows.append({
            "column": c,
            "n_rows": int(g["n_rows"].sum()),
            "n_nulls": int(g["n_nulls"].sum()),
            "min": mn, "max": mx,
            "approx_distinct": hll.estimate(),
        })
    return pd.DataFrame(rows)
