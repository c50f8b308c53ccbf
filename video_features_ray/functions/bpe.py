"""Byte-level BPE tokenizer — the engine's own implementation of the
reference's tokenizer component (``models/clip/clip_src/simple_tokenizer.py``):
merge-rank greedy encoding with a per-word LRU cache, loaded once per
actor (A3). The reference ships a fixed gz merge table; here the merge
table is LEARNED deterministically from a seed corpus (classic BPE
training: repeatedly merge the most frequent adjacent pair, ties broken
lexicographically), so everything is reproducible without bundled data.

Word splitting uses a BPE-ish regex (contractions / letter-runs /
digit-runs / other-runs, mirroring the reference's pattern at
``simple_tokenizer.py:76``); end-of-word is marked with ``</w>`` like
the reference (``:99-106``).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pyarrow as pa

_WORD_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+"
)

EOW = "</w>"


def _words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def train_bpe(corpus: list[str], num_merges: int = 256) -> list[tuple[str, str]]:
    """Deterministic BPE training: most-frequent pair first, ties by
    lexicographic pair order."""
    from collections import Counter

    vocab: Counter = Counter()
    for text in corpus:
        for w in _words(text):
            vocab[tuple(w[:-1]) + (w[-1] + EOW,)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically smallest pair
        top_count = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top_count)
        merges.append(best_pair)
        new_vocab: Counter = Counter()
        a, b = best_pair
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


class BpeTokenizer:
    """Merge-rank greedy encoder with per-word cache (A3 state)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        # Vocabulary is PINNED here and never mutated by encode(): a fixed
        # base alphabet (chars 0-255 plus their </w> variants, mirroring the
        # reference's bytes_to_unicode closure, ``simple_tokenizer.py:13-29``)
        # then the merge symbols in deterministic merge order, then <unk>.
        # Lazy id assignment during encode would make ids depend on each
        # actor's encode history — non-deterministic across an actor pool.
        symbols: dict[str, int] = {}

        def sid(s: str) -> int:
            if s not in symbols:
                symbols[s] = len(symbols)
            return symbols[s]

        for i in range(256):
            sid(chr(i))
        for i in range(256):
            sid(chr(i) + EOW)
        for a, b in merges:
            sid(a), sid(b), sid(a + b)
        self._unk = sid("<unk>")
        self._symbols = symbols
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_uncached)

    def _encode_word_uncached(self, word: str) -> tuple[str, ...]:
        sym = list(word[:-1]) + [word[-1] + EOW] if word else []
        while len(sym) > 1:
            ranked = [
                (self.ranks.get((sym[i], sym[i + 1]), 1 << 30), i)
                for i in range(len(sym) - 1)
            ]
            rank, i = min(ranked)
            if rank >= 1 << 30:
                break
            sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2 :]
        return tuple(sym)

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        get = self._symbols.get
        unk = self._unk
        for w in _words(text):
            for s in self._encode_word(w):
                out.append(get(s, unk))
        return out

    def decode(self, ids: list[int]) -> str:
        rev = {v: k for k, v in self._symbols.items()}
        toks = [rev.get(i, "") for i in ids]
        return "".join(toks).replace(EOW, " ").strip()

    @property
    def vocab_size(self) -> int:
        return len(self._symbols)


class BpeEncodeStage:
    """map_batches actor: tokenizer table built once per actor from the
    broadcast merge list (A3: table in __init__, work per batch)."""

    def __init__(self, merges_ref):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.tok = BpeTokenizer(merges)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        texts = batch["text"].to_pylist()
        encs = [self.tok.encode(t or "") for t in texts]
        flat = np.array([i for e in encs for i in e], dtype=np.int32)
        offs = np.concatenate(([0], np.cumsum([len(e) for e in encs]))).astype(np.int64)
        tokens = pa.ListArray.from_arrays(pa.array(offs).cast(pa.int32()),
                                          pa.array(flat, pa.int32()))
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(np.diff(offs).astype(np.int32)),
            "source": batch["source"] if "source" in batch.column_names
                      else pa.array(["doc"] * len(batch)),
        })


def bpe_tokenize(ds, merges: list[tuple[str, str]], concurrency=(1, 4)):
    """documents → BPE sequences via an actor pool holding the table."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        BpeEncodeStage, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=concurrency,
    )
