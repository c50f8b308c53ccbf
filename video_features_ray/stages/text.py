"""Text-analysis operators over the ``documents`` table.

These generalize the reference's string/cleanup maps (M15,
``simple_tokenizer.py:50-59``) into the scoring family a training-data
pipeline needs. Every function here is carefully written so a DuckDB
SQL expression produces BIT-IDENTICAL results (the driver's correctness
gate hashes values): splits use ``text.split(' ')`` semantics
(= DuckDB ``string_split(text, ' ')``), counts are exact integers, and
ratios are single IEEE divisions of those integers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# matches the DuckDB literal list in __ray_entry__.oracle_sql
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")
PUNCT = set(".!?,;:")


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_words (split on single space), n_chars, mean word length."""
    texts = batch[text_col].to_pylist()
    n_words = np.empty(len(texts), dtype=np.int64)
    n_chars = np.empty(len(texts), dtype=np.int64)
    sum_wlen = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        parts = t.split(" ")
        n_words[i] = len(parts)
        n_chars[i] = len(t)
        sum_wlen[i] = sum(len(p) for p in parts)
    out = {
        "doc_id": batch["doc_id"].cast(pa.string()),
        "n_words": pa.array(n_words),
        "n_chars": pa.array(n_chars),
        "mean_word_len": pa.array(sum_wlen / np.maximum(n_words, 1)),
    }
    return pa.table(out)


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer punctuation / uppercase / space counts + exact ratios."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_punct = np.empty(n, dtype=np.int64)
    n_upper = np.empty(n, dtype=np.int64)
    n_space = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        n_punct[i] = sum(c in PUNCT for c in t)
        n_upper[i] = sum(c.isupper() for c in t)
        n_space[i] = t.count(" ")
        n_stop[i] = sum(w in STOPWORDS for w in t.lower().split(" "))
    denom = np.maximum(n_chars, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.string()),
            "n_chars": pa.array(n_chars),
            "n_punct": pa.array(n_punct),
            "n_upper": pa.array(n_upper),
            "n_space": pa.array(n_space),
            "n_stop": pa.array(n_stop),
            "punct_ratio": pa.array(n_punct / denom),
            "upper_ratio": pa.array(n_upper / denom),
        }
    )


class LangId:
    """Tiny n-gram/stopword language heuristic (stateful: tables compiled
    once per actor). Not SQL-expressible → rows-only oracle check."""

    MARKERS = {
        "en": {"the", "and", "is", "of", "to", "in", "that", "it", "with", "for"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"},
        "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "pour", "que"},
        "es": {"el", "la", "de", "que", "los", "una", "por", "con", "para", "es"},
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tables = {k: frozenset(v) for k, v in self.MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs, scores = [], []
        for t in texts:
            words = (t or "").lower().split()
            counts = {k: sum(w in tb for w in words) for k, tb in self.tables.items()}
            best = max(counts, key=lambda k: (counts[k], k))
            total = max(len(words), 1)
            langs.append(best if counts[best] > 0 else "unknown")
            scores.append(counts[best] / total)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.string()),
                "lang_pred": pa.array(langs),
                "lang_score": pa.array(scores, type=pa.float64()),
            }
        )


def fingerprint(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Rolling-hash document fingerprint: min blake2b over char windows
    (winnowing-style; deterministic). Rows-only oracle check."""
    texts = batch[text_col].to_pylist()
    fps = []
    for t in texts:
        t = t or ""
        if len(t) <= window:
            spans = [t]
        else:
            spans = [t[i : i + window] for i in range(0, len(t) - window + 1, max(window // 2, 1))]
        hs = [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little") for s in spans]
        fps.append(min(hs) if hs else 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.string()),
            "fingerprint": pa.array(np.array(fps, dtype=np.uint64)),
        }
    )
