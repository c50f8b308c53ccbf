"""Sequence sources.

The engine's primary input is the Parquet table
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
(BASELINE.json input_hint). Two ways to get one:

- ``read_sequences(path)``      — read an existing sequences parquet
  (column-pruned at the read).
- ``sequences_from_documents``  — derive sequences deterministically from
  the driver's ``documents`` table by codepoint tokenization
  (``tokens = [ord(c) for c in text]``). This is the analogue of the
  reference's manifest reader + decoder front end
  (``utils/utils.py:135-175`` + ``utils/io.py:109-154``) and is exactly
  reproducible in DuckDB SQL
  (``list_transform(string_split(text,''), c -> unicode(c))``) so the
  whole downstream pipeline is oracle-checkable.
- ``synthetic_sequences``       — seeded generator for the FIXTURES.md T1
  edge-case corpus (empty docs, sub-stack docs, ragged-tail boundaries,
  one giant skew doc, hot ``source``).

All transforms are vectorized: codepoints for a whole batch are obtained
with ONE utf-32 encode of the concatenated strings (no per-char Python
loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..specs import VOCAB_SIZE

SEQUENCE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def read_sequences(path: str | list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(path, columns=["doc_id", "tokens", "n_tok", "source"])


def _codepoints_batch(texts: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """All codepoints of a string column → (flat int32, int64 offsets).

    Fast path: when the batch is pure ASCII with no nulls (byte length
    == codepoint length for every row — two vectorized Arrow kernels),
    the utf-8 data buffer IS the codepoint array: one uint8 view + one
    int32 widen, no Python string materialization at all. Otherwise one
    ``str.encode('utf-32-le')`` over the concatenated batch.
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if (len(texts) and texts.null_count == 0
            and (pa.types.is_string(texts.type) or pa.types.is_large_string(texts.type))):
        if texts.type == pa.large_string():
            texts = texts.cast(pa.string())
        blen = pc.binary_length(texts)
        ulen = pc.utf8_length(texts)
        if pc.all(pc.equal(blen, ulen)).as_py():
            arr = texts.slice(0)
            offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                                    count=len(arr) + 1 + arr.offset)[arr.offset:]
            offsets = offsets.astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            start = offsets[0]
            flat = data[start : offsets[-1]].astype(np.int32)
            return flat, offsets - start
    pylist = texts.to_pylist()
    joined = "".join(t or "" for t in pylist)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    lengths = np.fromiter((len(t or "") for t in pylist), dtype=np.int64, count=len(pylist))
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    return flat, offsets


def tokenize_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, text, ..., source) → sequences batch.

    doc_id is cast to string (``CAST(doc_id AS VARCHAR)`` in SQL);
    tokens are unicode codepoints of ``text``.
    """
    flat, offsets = _codepoints_batch(batch["text"])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int64), type=pa.int64()).cast(pa.int32()),
        pa.array(flat, type=pa.int32()),
    )
    n_tok = pa.array(np.diff(offsets).astype(np.int32), type=pa.int32())
    doc_id = batch["doc_id"].cast(pa.string())
    # explicit string type: an EMPTY batch would otherwise infer a
    # null-typed column and clash with string blocks at schema union
    source = (batch["source"] if "source" in batch.column_names
              else pa.array(["doc"] * len(batch), type=pa.string()))
    return pa.table(
        {"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok, "source": source}
    )


def sequences_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """Read documents.parquet (pruned to doc_id/text/source) → sequences."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    return ds.map_batches(tokenize_documents, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# synthetic corpus (FIXTURES.md T1)
# ---------------------------------------------------------------------------

def synthetic_sequences_table(
    n_docs: int = 200,
    mean_n_tok: int = 128,
    seed: int = 42,
    max_n_tok: int = 4096,
    edge_stack: int = 32,
    edge_step: int = 16,
) -> pa.Table:
    """Deterministic seeded corpus with the edge rows FIXTURES.md requires.

    First rows pin the boundary behaviors: n_tok == 0, n_tok < stack,
    n_tok == stack, n_tok = k*step+stack ± 1, one giant doc at
    ``max_n_tok``; the rest are log-normal lengths with a hot "web"
    source (~70%) for skew tests.  The 7 edge rows are always emitted
    (FIXTURES.md requires them), so the table has max(n_docs, 7) rows.
    """
    rng = np.random.default_rng(seed)
    edge_lengths = [
        0,
        edge_stack - 1,
        edge_stack,
        2 * edge_step + edge_stack - 1,
        2 * edge_step + edge_stack,
        2 * edge_step + edge_stack + 1,
        max_n_tok,
    ]
    lengths = list(edge_lengths)
    remaining = max(n_docs - len(lengths), 0)
    body = np.clip(
        rng.lognormal(mean=np.log(mean_n_tok), sigma=1.0, size=remaining), 0, max_n_tok
    ).astype(np.int64)
    lengths.extend(body.tolist())

    sources = rng.choice(
        ["web", "books", "code", "chat"], size=len(lengths), p=[0.7, 0.1, 0.1, 0.1]
    )
    doc_ids, token_lists = [], []
    for i, ln in enumerate(lengths):
        doc_ids.append(f"doc{i:08d}")
        doc_rng = np.random.default_rng((seed << 16) ^ i)
        token_lists.append(doc_rng.integers(0, VOCAB_SIZE, size=int(ln), dtype=np.int32))

    flat = np.concatenate(token_lists) if token_lists else np.array([], dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum([len(t) for t in token_lists])))
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()), pa.array(flat, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array([len(t) for t in token_lists], type=pa.int32()),
            "source": pa.array(sources.tolist(), type=pa.string()),
        }
    )


def synthetic_sequences(**kw) -> "ray.data.Dataset":
    return ray.data.from_arrow(synthetic_sequences_table(**kw))
