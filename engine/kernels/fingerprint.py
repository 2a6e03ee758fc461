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


# ---------------------------------------------------------------------------
# numpy fast paths — bit-identical to the scalar spec above (fuzz-tested
# in tests/test_kernels.py); the scalar versions remain the definition.
# ---------------------------------------------------------------------------
import numpy as np  # noqa: E402

_np_A = np.array([a for a, _ in _MINHASH_AB], dtype=np.uint64)  # a < 2^61
_np_B = np.array([b for _, b in _MINHASH_AB], dtype=np.uint64)
_np_P = np.uint64(_MERSENNE61)
_M31 = np.uint64((1 << 31) - 1)
_M30 = np.uint64((1 << 30) - 1)


def _mulmod61(a: "np.ndarray", x: "np.ndarray") -> "np.ndarray":
    """(a * x) mod (2^61-1) for a < 2^61, x < 2^64, exactly, in uint64.

    Split a = a1*2^31 + a0 (a1 < 2^30, a0 < 2^31) and
          x = x1*2^31 + x0 (x1 < 2^33, x0 < 2^31); every partial
    product then fits uint64, and 2^61 ≡ 1 (mod p) folds the high
    parts back down without overflow.
    """
    p = _np_P
    a1, a0 = a >> np.uint64(31), a & _M31
    x1, x0 = x >> np.uint64(31), x & _M31
    hi = a1 * x1  # < 2^63, carries weight 2^62 ≡ 2 (mod p)
    t_hi = hi << np.uint64(1)  # < 2^64
    t_hi = (t_hi >> np.uint64(61)) + (t_hi & p)
    # mid carries weight 2^31; a1*x0 < 2^61 and a0*x1 < 2^64 can
    # overflow when summed, so reduce each term separately
    t_mid = np.uint64(0)
    for m in (a1 * x0, a0 * x1):
        m1, m0 = m >> np.uint64(30), m & _M30  # m = m1*2^30 + m0
        # m*2^31 = m1*2^61 + m0*2^31 ≡ m1 + m0*2^31 (mod p)
        t_mid = t_mid + m1 + (m0 << np.uint64(31))  # each term < 2^61
    lo = a0 * x0  # < 2^62
    t_lo = (lo >> np.uint64(61)) + (lo & p)
    s = t_hi + t_mid + t_lo  # < 8p < 2^64
    s = (s >> np.uint64(61)) + (s & p)
    s = (s >> np.uint64(61)) + (s & p)
    return np.where(s >= p, s - p, s)


from engine.kernels.embed import fnv1a64_batch as _fnv1a64_batch  # noqa: E402


def _shingle_hashes(text: str, w: int = SHINGLE_W) -> "np.ndarray":
    """uint64 FNV hashes of the w-word shingles (multiset — duplicates
    are harmless for min-based signatures). Same strings as shingles()."""
    toks = tokenize(text or "")
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < w:
        strs = [" ".join(toks).encode("utf-8")]
    else:
        strs = [
            " ".join(toks[i : i + w]).encode("utf-8")
            for i in range(len(toks) - w + 1)
        ]
    return _fnv1a64_batch(strs)


def minhash_sig_np(text: str, k: int = MINHASH_K) -> list[int]:
    """Vectorized minhash_sig — same (a*x+b) mod 2^61-1 family, same
    pinned constants, min over shingles done as one (k, |sh|) uint64
    matrix instead of k Python passes. Bit-identical to minhash_sig."""
    x = _shingle_hashes(text)
    if not len(x):
        return [_MERSENNE61 - 1] * k
    h = _mulmod61(_np_A[:k, None], x[None, :]) + _np_B[:k, None]  # < 2p
    h = np.where(h >= _np_P, h - _np_P, h)
    return h.min(axis=1).astype(np.int64).tolist()


_np_BITS = np.arange(64, dtype=np.uint64)


def simhash64_np(text: str) -> int:
    """Vectorized simhash64: one (|toks|, 64) bit matrix sum instead of
    a 64-iteration Python loop per token. Bit-identical to simhash64."""
    toks = tokenize(text or "")
    if not toks:
        return 0
    h = _fnv1a64_batch([t.encode("utf-8") for t in toks])
    ones = ((h[:, None] >> _np_BITS[None, :]) & np.uint64(1)).sum(
        axis=0, dtype=np.int64
    )
    # counts[i] = ones - (n - ones) > 0  <=>  2*ones > n
    bits = (2 * ones > len(toks)).astype(np.uint64)
    return int((bits << _np_BITS).sum(dtype=np.uint64))


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
