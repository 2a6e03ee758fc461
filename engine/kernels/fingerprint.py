"""Document fingerprints for dedup (training-data-pipeline ops).

All hashes are seed-free and platform-independent (FNV-1a / explicit
arithmetic), so fingerprints are stable across executors, Python
processes, and runs — required for distributed dedup joins.

  * content_sha256 — exact-dup key (also the byte-identity witness).
  * shingles       — w-word shingle set (lowercased, \\w+ tokens).
  * minhash_sig    — K-permutation MinHash over shingle FNV hashes,
    using the (a*x+b) mod p universal-hash family with pinned
    constants derived from splitmix64(seed, k).
  * simhash64      — 64-bit SimHash over token FNV hashes.
  * rolling_fingerprint — polynomial rolling hash of the whole text
    (base 1_000_003 mod 2^61-1), cheap order-sensitive fingerprint.
"""

from __future__ import annotations

import hashlib

from engine.kernels.embed import fnv1a64, tokenize

MINHASH_K = 32
SHINGLE_W = 3
_MERSENNE61 = (1 << 61) - 1
_ROLL_BASE = 1_000_003


def content_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def shingles(text: str, w: int = SHINGLE_W) -> set[int]:
    toks = tokenize(text or "")
    if len(toks) < w:
        return {fnv1a64(" ".join(toks).encode("utf-8"))} if toks else set()
    return {
        fnv1a64(" ".join(toks[i : i + w]).encode("utf-8"))
        for i in range(len(toks) - w + 1)
    }


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


# pinned (a, b) pairs for the K minhash permutations
_MINHASH_AB = [
    ((_splitmix64(2 * k + 1) | 1) % _MERSENNE61, _splitmix64(2 * k + 2) % _MERSENNE61)
    for k in range(MINHASH_K)
]


def minhash_sig(text: str, k: int = MINHASH_K) -> list[int]:
    sh = shingles(text)
    if not sh:
        return [_MERSENNE61 - 1] * k
    sig = []
    for a, b in _MINHASH_AB[:k]:
        sig.append(min((a * x + b) % _MERSENNE61 for x in sh))
    return sig


def simhash64(text: str) -> int:
    toks = tokenize(text or "")
    if not toks:
        return 0
    counts = [0] * 64
    for t in toks:
        h = fnv1a64(t.encode("utf-8"))
        for i in range(64):
            counts[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if counts[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str) -> int:
    h = 0
    for ch in text or "":
        h = (h * _ROLL_BASE + ord(ch)) % _MERSENNE61
    return h


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
