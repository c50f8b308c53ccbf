"""Shared tagged-union hash-shuffle — the ONE physical plan behind every
two-sided keyed operator (equi/semi/anti join, as-of join).

Plan: tag each side (``_side`` 0/1), pad both to the union schema with
TYPED nulls (identical block schemas, no per-block unification), bucket
by a deterministic hash of the key, union, optionally coalesce, then
``groupby(_bucket).map_groups`` a caller-supplied pandas combiner. A
key never splits across buckets, so per-bucket logic is globally exact.

The subtle part both callers need and must agree on: the union's null
padding promotes the other side's int columns to float64 in pandas, so
each combiner restores its side's true dtypes — skipping columns with
GENUINE nulls (``astype(int)`` on NaN raises; such a column was
nullable upstream and stays float).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .events import stable_bucket, stable_bucket_multi


class TaggedUnion:
    """Holds the two sides' schema facts + the shuffled dataset.
    ``key`` may be a single column or a list (composite keys bucket by a
    combined hash — a key tuple never splits across buckets)."""

    def __init__(self, left: "ray.data.Dataset", right: "ray.data.Dataset",
                 key, num_buckets: int,
                 ts_cols: tuple[str, str] | None = None,
                 coalesce_blocks: int | None = None,
                 schemas: tuple[pa.Schema, pa.Schema] | None = None,
                 salt_hot: tuple[list, int] | None = None):
        # ``salt_hot=(hot_keys, n_salts)``: skew escape hatch for joins.
        # A hot key's bucket would otherwise hold ALL its rows in one
        # task (per-bucket memory ∝ the hot key's row count — the one
        # case byte-sized bucket counts can't fix).  Hot LEFT rows are
        # spread round-robin across ``n_salts`` private sub-buckets;
        # hot RIGHT rows are REPLICATED to all of them, so every left
        # row still sees the full right-side set of its key exactly
        # once.  Valid for per-row-independent combiners (inner/semi/
        # anti equi-join); NOT for as-of/windowed combiners, which need
        # a key's rows co-located — those must chunk, not salt.  Cost:
        # right hot rows ship n_salts×; use when the right side of each
        # hot key is small (dimension rows) and the left is huge.
        # ``schemas``: caller-supplied (left, right) Arrow schemas. When
        # given, ``Dataset.schema()`` is never called — that call can
        # EXECUTE the upstream pipeline's first block just to infer
        # column types, a double-execution tax on every shuffled join
        # whose input is a transformed (schema-unknown) dataset.
        if salt_hot is not None:
            if not isinstance(key, str):
                raise ValueError("salt_hot supports single-column keys")
            if ts_cols is not None:
                raise ValueError("salt_hot is invalid for as-of combiners "
                                 "(a key's rows must stay co-located)")
            hot_list, n_salts = salt_hot
            hot_arr = np.asarray(sorted(hot_list))
        if schemas is not None:
            # either side may be None → fall back to Dataset.schema()
            # for THAT side only (callers often know one side exactly —
            # a projected fit table — while the payload side is the
            # caller's problem to thread through)
            l_schema, r_schema = schemas
            if l_schema is None:
                l_schema = left.schema()
            if r_schema is None:
                r_schema = right.schema()
        else:
            l_schema, r_schema = left.schema(), right.schema()
        self.left_cols = l_schema.names
        self.right_cols = r_schema.names
        self.arrow_types: dict[str, pa.DataType] = {}
        for sch in (l_schema, r_schema):
            for name, typ in zip(sch.names, sch.types):
                if isinstance(typ, pa.DataType):
                    self.arrow_types.setdefault(name, typ)
        arrow_types = self.arrow_types

        # canonical output column order shared by BOTH sides (left cols,
        # right-only cols, then the meta columns) — per-side orders made
        # Ray's executor log a schema-mismatch warning on every block
        union_cols = list(self.left_cols)
        union_cols += [c for c in self.right_cols if c not in self.left_cols]

        def _tag(side: int, own_ts: str | None):
            def _fn(batch: pa.Table) -> pa.Table:
                n = len(batch)
                have = set(batch.column_names)
                cols = {c: (batch[c] if c in have
                            else pa.nulls(n, type=arrow_types.get(c)))
                        for c in union_cols}
                cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
                keys = [key] if isinstance(key, str) else list(key)
                if len(keys) == 1:
                    b = stable_bucket(
                        batch[keys[0]].to_numpy(zero_copy_only=False), num_buckets)
                else:
                    b = stable_bucket_multi(
                        [batch[c].to_numpy(zero_copy_only=False) for c in keys],
                        num_buckets)
                if salt_hot is not None and n > 0 and len(hot_arr):
                    kv = batch[keys[0]].to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(hot_arr, kv)
                    posc = np.minimum(pos, len(hot_arr) - 1)
                    hot = hot_arr[posc] == kv
                    b = b.astype(np.int64)
                    if side == 0:
                        # spread hot left rows round-robin over the key's
                        # private sub-bucket range; OFFSET the start by a
                        # per-batch value — a round-robin that restarts at
                        # salt 0 every batch sends a hot key arriving
                        # one-row-per-block entirely to sub-bucket 0,
                        # silently undoing the mitigation
                        ih = np.flatnonzero(hot)
                        # fresh entropy per batch: a shape-derived offset
                        # is CONSTANT across equally-shaped batches, so a
                        # hot key arriving one-row-per-block collapsed
                        # onto one sub-bucket; placement doesn't affect
                        # results, so randomness is safe here
                        off = np.int64(np.random.default_rng()
                                       .integers(0, n_salts))
                        b[ih] = (num_buckets + posc[ih] * n_salts
                                 + (np.arange(len(ih), dtype=np.int64) + off)
                                 % n_salts)
                    else:
                        # replicate hot right rows into every sub-bucket
                        ih = np.flatnonzero(hot)
                        if len(ih):
                            rep = np.repeat(ih, n_salts)
                            salts = np.tile(np.arange(n_salts, dtype=np.int64),
                                            len(ih))
                            tbl = pa.table(cols)
                            idx = np.concatenate([np.flatnonzero(~hot), rep])
                            out = tbl.take(pa.array(idx))
                            bk = np.concatenate([
                                b[~hot],
                                num_buckets + posc[rep] * n_salts + salts])
                            return out.append_column(
                                "_bucket", pa.array(bk.astype(np.int32)))
                cols["_bucket"] = pa.array(np.asarray(b, dtype=np.int32))
                return pa.table(cols)

            return _fn

        l_ts, r_ts = ts_cols if ts_cols else (None, None)
        both = left.map_batches(_tag(0, l_ts),
                                batch_format="pyarrow").union(
            right.map_batches(_tag(1, r_ts),
                              batch_format="pyarrow"))
        if coalesce_blocks:
            both = both.repartition(coalesce_blocks)
        self.both = both

    def np_dtypes(self, cols) -> dict[str, np.dtype]:
        out = {}
        for name in cols:
            t = self.arrow_types.get(name)
            if t is not None and (pa.types.is_integer(t) or pa.types.is_floating(t)
                                  or pa.types.is_boolean(t)):
                out[name] = np.dtype(t.to_pandas_dtype())
        return out

    @staticmethod
    def restore_dtypes(df: pd.DataFrame, dtypes: dict[str, np.dtype]) -> pd.DataFrame:
        for c, dt in dtypes.items():
            if c in df.columns and df[c].dtype != dt and not df[c].isna().any():
                df[c] = df[c].astype(dt)
        return df

    def map_buckets(self, fn: Callable,
                    batch_format: str = "pandas") -> "ray.data.Dataset":
        # combiners that don't need pandas merge semantics can take the
        # bucket as a zero-copy Arrow table (batch_format="pyarrow")
        return self.both.groupby("_bucket").map_groups(
            fn, batch_format=batch_format)
