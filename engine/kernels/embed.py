"""Deterministic embedding featurizer (SURVEY.md §2 A8).

Hashing-trick bag-of-tokens vector, L2-normalized, fixed DIM=64 —
a stand-in for the model-embedding call of a production vector
ingestor, sharing its shape with the driver's embeddings table
(vec_id, embedding: list<float>, label). Deterministic: token hash is
FNV-1a 64 (no PYTHONHASHSEED dependence), floats are a pure function
of the token multiset.
"""

from __future__ import annotations

import math
import re

DIM = 64
_TOKEN_RE = re.compile(r"[a-z0-9]+")
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def fnv1a64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


# token -> fnv1a64 memo. The corpus vocabulary is zipfian, so almost
# every token hash is a repeat; caching the pure function is exact.
# Bounded so adversarial vocabularies can't grow worker memory.
_HASH_MEMO: dict[str, int] = {}
_HASH_MEMO_MAX = 1 << 20


def embed_text(text: str | None, dim: int = DIM) -> list[float]:
    """Signed hashing-trick embedding; zero vector for empty text.

    Accumulation note: counts per unique token are added as one
    sign*count float op. All intermediate values are small integers
    (< 2^53), where float addition is exact, so the result is
    bit-identical to adding ±1 per occurrence in stream order.
    """
    vec = [0.0] * dim
    if not text:
        return vec
    counts: dict[str, int] = {}
    for tok in tokenize(text):
        counts[tok] = counts.get(tok, 0) + 1
    memo = _HASH_MEMO
    for tok, cnt in counts.items():
        h = memo.get(tok)
        if h is None:
            h = fnv1a64(tok.encode("utf-8"))
            if len(memo) < _HASH_MEMO_MAX:
                memo[tok] = h
        idx = h % dim
        vec[idx] += float(cnt) if (h >> 63) & 1 == 0 else -float(cnt)
    norm = math.sqrt(sum(v * v for v in vec))
    if norm > 0.0:
        vec = [v / norm for v in vec]
    return vec


# ---------------------------------------------------------------------------
# numpy fast paths — bit-identical to the scalar spec above (fuzz-tested
# in tests/test_kernels.py); the scalar versions remain the definition.
# ---------------------------------------------------------------------------
import numpy as np  # noqa: E402


# above this length a string is handled scalar: the column-stepped
# batch matrix does O(maxlen * n) work and O(maxlen * n) memory, so a
# single megabyte outlier among thousands of short strings would both
# stall and blow up the whole batch
_FNV_BATCH_MAXLEN = 1024


def fnv1a64_batch(strs: list[bytes]) -> "np.ndarray":
    """FNV-1a of many byte strings at once: one (n, maxlen) byte
    matrix, FNV stepped column-wise with a length mask. Bit-identical
    to fnv1a64 per string. Length outliers (> _FNV_BATCH_MAXLEN) are
    computed scalar so one long string cannot inflate the matrix."""
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    if maxlen > _FNV_BATCH_MAXLEN:
        long_ix = np.flatnonzero(lens > _FNV_BATCH_MAXLEN)
        short_ix = np.flatnonzero(lens <= _FNV_BATCH_MAXLEN)
        out = np.empty(n, dtype=np.uint64)
        out[short_ix] = fnv1a64_batch([strs[i] for i in short_ix])
        for i in long_ix:
            out[i] = fnv1a64(strs[i])
        return out
    total = int(lens.sum())
    buf = np.zeros((n, maxlen), dtype=np.uint64)
    flat = np.frombuffer(b"".join(strs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(total) - np.repeat(starts, lens)
    buf[rows, cols] = flat
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    for j in range(maxlen):
        alive = j < lens
        h = np.where(alive, (h ^ buf[:, j]) * prime, h)
    return h


# (An embed_text fast path was measured and rejected: chunk tokens are
# short, so scalar FNV ties the batched matrix version — the batch FNV
# above only pays off for the longer shingle strings in fingerprint.py.)
