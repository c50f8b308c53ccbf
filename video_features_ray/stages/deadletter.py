"""Row-level error isolation — the reference's per-video try/except made
a first-class stage.

The reference wraps each video in try/except, logs the traceback, and
continues (``models/_base/base_extractor.py:40-53``). Ray gives
task-level retries for free, but a *semantic* error (corrupt row,
impossible geometry) would fail the whole block. ``isolating`` wraps a
batch function so that a failing batch is bisected down to the
offending rows: good rows flow on, bad rows become dead-letter records
``(doc_id?, error, stage)`` collected through a side output.

Cost model: the happy path pays ZERO overhead (one try/except around
the vectorized call); bisection (log₂ n extra calls) happens only on
batches that actually contain a poison row.
"""

from __future__ import annotations

import traceback
from typing import Callable

import pyarrow as pa

DEADLETTER_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("stage", pa.string()), ("error", pa.string())]
)


def _empty_like(fn, batch: pa.Table) -> pa.Table:
    """Schema-stable empty output for an all-bad batch.  If ``fn``
    itself cannot handle a zero-row table, fall back to the INPUT
    schema — an exception here would fail the whole block, the exact
    outcome this stage exists to prevent."""
    try:
        return fn(batch.slice(0, 0))
    except Exception:
        return batch.slice(0, 0)


def isolating(fn: Callable[[pa.Table], pa.Table], stage_name: str | None = None,
              id_col: str = "doc_id"):
    """Wrap a pyarrow batch fn: returns (good_output ++ dead_letter rows
    marked by an ``_error`` column). Split downstream with
    ``split_deadletters``."""
    stage = stage_name or getattr(fn, "__name__", "stage")

    def _run(batch: pa.Table) -> tuple[pa.Table | None, list[dict]]:
        try:
            return fn(batch), []
        except Exception:
            if len(batch) <= 1:
                doc = (str(batch[id_col][0].as_py())
                       if id_col in batch.column_names and len(batch) else "")
                err = traceback.format_exc(limit=3)
                return None, [dict(doc_id=doc, stage=stage, error=err)]
            mid = len(batch) // 2
            left_ok, left_bad = _run(batch.slice(0, mid))
            right_ok, right_bad = _run(batch.slice(mid))
            oks = [t for t in (left_ok, right_ok) if t is not None and len(t)]
            merged = pa.concat_tables(oks) if oks else None
            return merged, left_bad + right_bad

    def _wrapped(batch: pa.Table) -> pa.Table:
        ok, bad = _run(batch)
        if ok is None:
            ok = _empty_like(fn, batch)
        n = len(ok)
        cols = {name: ok[name] for name in ok.column_names}
        cols["_error"] = pa.nulls(n, pa.string())
        good = pa.table(cols)
        if not bad:
            return good
        dead_cols = {}
        for name in good.column_names:
            if name == "_error":
                dead_cols[name] = pa.array([b["error"] for b in bad], pa.string())
            elif name == id_col and good.schema.field(name).type == pa.string():
                dead_cols[name] = pa.array([b["doc_id"] for b in bad], pa.string())
            else:
                dead_cols[name] = pa.nulls(len(bad), good.schema.field(name).type)
        return pa.concat_tables([good, pa.table(dead_cols)])

    _wrapped.__name__ = f"isolating_{stage}"
    return _wrapped


def split_deadletters(ds, materialize: bool = True):
    """(good rows without _error col, dead-letter rows).

    ``materialize=True`` (default) pins the upstream blocks first —
    the two returned datasets both consume ``ds``, and two lazy
    branches would re-execute the whole upstream pipeline (including
    the failing fn and its bisection) once per side."""
    import pyarrow.compute as pc

    if materialize:
        ds = ds.materialize()
    good = ds.map_batches(
        lambda b: b.filter(pc.is_null(b["_error"])).drop_columns(["_error"]),
        batch_format="pyarrow",
    )
    dead = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b["_error"])),
        batch_format="pyarrow",
    )
    return good, dead
