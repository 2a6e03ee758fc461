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


def embed_text(text: str | None, dim: int = DIM) -> list[float]:
    """Signed hashing-trick embedding; zero vector for empty text."""
    vec = [0.0] * dim
    if not text:
        return vec
    for tok in tokenize(text):
        h = fnv1a64(tok.encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 63) & 1 == 0 else -1.0
        vec[idx] += sign
    norm = math.sqrt(sum(v * v for v in vec))
    if norm > 0.0:
        vec = [v / norm for v in vec]
    return vec
