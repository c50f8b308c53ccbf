"""PII detection / redaction over text columns — the compliance scrub
every web-scale training-data pipeline runs before tokenization.

Generalizes the reference's per-item cleanup maps (M15,
``simple_tokenizer.py:50-59`` whitespace/control-char scrub) into the
pattern-scrub family.  Design points:

- **RE2 end-to-end.** Both the engine (``pyarrow.compute
  .count_substring_regex`` / ``replace_substring_regex``) and the
  DuckDB oracle (``regexp_extract_all`` / ``regexp_replace(..., 'g')``)
  run Google RE2, so counts and redacted strings are BIT-IDENTICAL —
  the patterns below deliberately avoid anything outside the RE2
  common subset (no lookarounds, no backrefs).
- **Zero-shuffle.** Detection and redaction are stateless per-row maps;
  the only non-map op is the optional per-source rollup, a standard
  ``partial_agg`` (O(sources) combine).
- **Counts are of the ORIGINAL text** (overlaps between pattern
  families each count), replacement is sequential email → ipv4 →
  phone; both sides apply the same order so results agree even when a
  later pattern could match inside an earlier replacement.
- NULL text propagates as NULL counts / NULL redaction on both sides
  (RE2 kernels and DuckDB share SQL NULL semantics).

Scale: pure ``map_batches`` over zero-copy Arrow — no state, no
shuffle, no driver materialization; throughput is regex-kernel-bound
and embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: RE2-safe patterns, shared verbatim with the DuckDB oracle SQL.
#: Dict order IS the replacement order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
}

PII_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def redact_pii(batch: pa.Table, text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Per-row PII counts + fully-redacted text (one RE2 pass per
    pattern, all-Arrow, zero-copy in).

    Output columns: ``id_col``, ``n_email``, ``n_ipv4``, ``n_phone``
    (int64, NULL text -> NULL), ``text_redacted``.
    """
    txt = batch[text_col]
    cols: dict[str, pa.ChunkedArray | pa.Array] = {id_col: batch[id_col]}
    red = txt
    for name, pat in PII_PATTERNS.items():
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(txt, pattern=pat), pa.int64())
        red = pc.replace_substring_regex(
            red, pattern=pat, replacement=PII_REPLACEMENTS[name])
    cols["text_redacted"] = red
    return pa.table(cols)


def pii_flags(batch: pa.Table, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """Detection-only variant (no redaction string built): per-row
    counts plus ``has_pii`` — the cheap pre-filter for routing clean
    docs around the redaction stage."""
    txt = batch[text_col]
    cols: dict[str, pa.ChunkedArray | pa.Array] = {id_col: batch[id_col]}
    any_hit = None
    for name, pat in PII_PATTERNS.items():
        c = pc.cast(pc.count_substring_regex(txt, pattern=pat), pa.int64())
        cols[f"n_{name}"] = c
        hit = pc.greater(c, 0)
        any_hit = hit if any_hit is None else pc.or_(any_hit, hit)
    cols["has_pii"] = any_hit
    return pa.table(cols)


def _mod(ids: pa.ChunkedArray | pa.Array, m: int):
    """Non-negative int64 modulo via truncating integer divide
    (``pc.divide`` on integers truncates), matching SQL ``%`` for the
    non-negative ids this fixture uses."""
    return pc.subtract(ids, pc.multiply(pc.divide(ids, m), m))


def augment_with_pii(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Deterministically inject synthetic PII into ``text_col`` keyed
    on ``id_col`` — the fixture generator the oracle SQL mirrors
    exactly (string-for-string), so redaction parity is exercised on
    REAL matches even when the base corpus contains none:

    - every id % 3 == 0 doc gains `` reach user<id>@mail.example.com``
    - every id % 4 == 0 doc gains `` from 192.168.<id%256>.<id*3%256>``
    - every id % 5 == 0 doc gains `` call 415-555-<lpad(id%10000, 4)>``
    """
    ids = pc.cast(batch[id_col], pa.int64())
    txt = pc.fill_null(batch[text_col], "")
    s_id = pc.cast(ids, pa.string())
    empty = pa.array([""] * len(batch), pa.string())

    email = pc.if_else(
        pc.equal(_mod(ids, 3), 0),
        pc.binary_join_element_wise(
            " reach user", s_id, "@mail.example.com", ""),
        empty)
    ip = pc.if_else(
        pc.equal(_mod(ids, 4), 0),
        pc.binary_join_element_wise(
            " from 192.168.",
            pc.cast(_mod(ids, 256), pa.string()),
            ".",
            pc.cast(_mod(pc.multiply(ids, 3), 256), pa.string()),
            ""),
        empty)
    phone = pc.if_else(
        pc.equal(_mod(ids, 5), 0),
        pc.binary_join_element_wise(
            " call 415-555-",
            pc.utf8_lpad(pc.cast(_mod(ids, 10000), pa.string()), 4, "0"),
            ""),
        empty)
    out = pc.binary_join_element_wise(txt, email, ip, phone, "")
    cols = {f.name: batch[f.name] for f in batch.schema
            if f.name != text_col}
    cols[text_col] = out
    return pa.table(cols)
