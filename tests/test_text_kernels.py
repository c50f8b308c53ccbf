"""Vectorized text kernels vs independent naive Python references.

The batch kernels in ``stages/text.py`` are cumsum/pack tricks over one
flat codepoint array; these tests pin them against straightforward
per-row loops (the round-1 implementations' semantics) on an edge-case
corpus: empties, nulls, runs of spaces, tabs/newlines, non-ASCII,
uppercase Latin-1, long texts.
"""

import re

import numpy as np
import pyarrow as pa

from video_features_ray.stages.text import (
    FP_BASE,
    STOPWORDS,
    LangId,
    fingerprint,
    quality_score,
    token_stats,
)

TEXTS = [
    "The quick brown fox.  Jumps!", "", " ", "a  b",
    "der die und das ist nicht für", "le la et les des est une", None,
    "THE the To to", "ünïcode 中文 mixed THE", "x" * 40,
    "one\ttab\nand newline the fox", "trailing space ", " leading",
    "DER DIE UND FÜR", "el la de que los por con para es si",
    "punct.:;!?,,,", "exactly sixteen!",  # len==window boundary
]


def _batch():
    return pa.table({"doc_id": pa.array([str(i) for i in range(len(TEXTS))]),
                     "text": pa.array(TEXTS, pa.string())})


def test_token_stats_matches_naive():
    out = token_stats(_batch()).to_pandas()
    for i, t in enumerate(TEXTS):
        t = t or ""
        parts = t.split(" ")
        assert out.n_words[i] == len(parts)
        assert out.n_chars[i] == len(t)
        assert out.mean_word_len[i] == sum(len(p) for p in parts) / max(len(parts), 1)


def test_quality_score_matches_naive():
    out = quality_score(_batch()).to_pandas()
    punct = set(".!?,;:")
    for i, t in enumerate(TEXTS):
        t = t or ""
        assert out.n_punct[i] == sum(c in punct for c in t)
        assert out.n_upper[i] == sum("A" <= c <= "Z" for c in t)
        assert out.n_space[i] == t.count(" ")
        assert out.n_stop[i] == sum(w in STOPWORDS for w in t.lower().split(" "))
        assert out.punct_ratio[i] == out.n_punct[i] / max(len(t), 1)


def test_langid_matches_naive():
    out = LangId()(_batch()).to_pandas()
    for i, t in enumerate(TEXTS):
        t = t or ""
        words = [w for w in re.split(r"[ \t\n\x0b\x0c\r]", t.lower()) if w]
        counts = {k: sum(w in tb for w in words) for k, tb in LangId.MARKERS.items()}
        best = max(counts, key=lambda k: (counts[k], k))
        assert out.lang_pred[i] == (best if counts[best] > 0 else "unknown")
        assert out.lang_score[i] == counts[best] / max(len(words), 1)


def test_fingerprint_matches_naive_rolling_hash():
    out = fingerprint(_batch()).to_pandas()
    M = 1 << 64

    def naive(t, w=16):
        if not t:
            return 0
        spans = [t] if len(t) < w else [t[i: i + w] for i in range(len(t) - w + 1)]
        hs = []
        for s in spans:
            h = 0
            for c in s:
                h = (h * FP_BASE + ord(c)) % M
            hs.append(h)
        return min(hs)

    for i, t in enumerate(TEXTS):
        assert int(out.fingerprint[i]) == naive(t or ""), i
