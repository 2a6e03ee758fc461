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

from engine.kernels.embed import _FNV_OFFSET, _FNV_PRIME, fnv1a64, tokenize

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


_np_A1, _np_A0 = _np_A >> np.uint64(31), _np_A & _M31


def _mulmod61_reduced(a1: "np.ndarray", a0: "np.ndarray", x: "np.ndarray") -> "np.ndarray":
    """(a*x) mod (2^61-1) for PRE-REDUCED x < 2^61 and pre-split
    a = a1*2^31 + a0. With x < 2^61 every partial product fits uint64
    without the per-term folding _mulmod61 needs for x < 2^64 — ~25%
    fewer vector ops on the hot (k, shingles) matrix. Bit-identical
    (asserted against _mulmod61 in tests)."""
    p = _np_P
    x1, x0 = x >> np.uint64(31), x & _M31  # x1 < 2^30
    t = (a1 * x1) << np.uint64(1)  # < 2^61: weight 2^62 === 2 (mod p)
    m = a1 * x0 + a0 * x1  # < 2^62, weight 2^31
    # m*2^31 = (m>>30)*2^61 + (m&M30)*2^31 === (m>>30) + (m&M30)<<31
    t = t + ((m >> np.uint64(30)) + ((m & _M30) << np.uint64(31)))
    lo = a0 * x0  # < 2^62
    t = t + ((lo >> np.uint64(61)) + (lo & p))
    t = (t >> np.uint64(61)) + (t & p)
    t = (t >> np.uint64(61)) + (t & p)
    return np.where(t >= p, t - p, t)


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


# ---------------------------------------------------------------------------
# batch fast paths — one numpy pass over ALL documents of an Arrow
# batch (flat shingle/token arrays + segment reduceat), amortizing
# numpy call overhead that dominates the per-document fast paths.
# Bit-identical to the scalar spec (fuzz-pinned in tests).
# ---------------------------------------------------------------------------


def _fnv1a64_flat(flat: "np.ndarray", starts: "np.ndarray", lens: "np.ndarray") -> "np.ndarray":
    """FNV-1a of n byte strings given as slices (starts, lens) into one
    flat uint8 buffer. Bit-identical to fnv1a64 per slice; avoids
    materializing per-string bytes objects."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    maxlen = int(lens.max())
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    # column j of every string: flat[starts + j] where j < len
    for j in range(maxlen):
        alive = j < lens
        idx = starts + j
        # clamp dead indices to 0 (masked out by `alive`)
        b = flat[np.where(alive, idx, 0)].astype(np.uint64)
        h = np.where(alive, (h ^ b) * prime, h)
    return h


def _token_layout(joined: bytes):
    """(buf, starts, lens) of the tokens inside " ".join(toks), found
    from the space positions in one vectorized pass — tokenize()
    emits pure-ASCII [a-z0-9]+ tokens, so tokens contain no spaces
    and byte length == char length."""
    buf = np.frombuffer(joined, dtype=np.uint8)
    sp = np.flatnonzero(buf == 0x20)
    starts = np.empty(len(sp) + 1, dtype=np.int64)
    starts[0] = 0
    starts[1:] = sp + 1
    ends = np.append(sp, len(buf))
    return buf, starts, ends - starts


def _shingle_layout(toks: list[str], w: int = SHINGLE_W):
    """(joined_bytes, starts, lens) of the w-word shingle byte strings.

    Every shingle string " ".join(toks[i:i+w]) is literally a byte
    slice of " ".join(toks) — no per-shingle join/encode."""
    joined = " ".join(toks).encode("utf-8")
    _, tok_starts, tl = _token_layout(joined)
    if len(toks) < w:
        return joined, tok_starts[:1], np.array([len(joined)], dtype=np.int64)
    sh_lens = tl[: -(w - 1)].copy()
    for j in range(1, w):
        sh_lens += tl[j : len(toks) - (w - 1) + j] + 1
    return joined, tok_starts[: -(w - 1)], sh_lens


# a doc containing a token longer than this is routed to its per-doc
# fast path instead of the cross-doc flat batch: _fnv1a64_flat steps
# O(max shingle length) full-width passes over EVERY shingle of the
# batch, so one 50KB minified-JS token would stall all 512 docs of an
# Arrow batch (measured 165x before this guard)
_BATCH_TOKEN_MAXLEN = 256


def minhash_sigs(texts, k: int = MINHASH_K) -> list[list[int]]:
    """Batched minhash_sig over many documents: ONE flat FNV pass over
    every shingle of every doc, ONE (k, total_shingles) modmul matrix,
    per-doc min via minimum.reduceat. Bit-identical to minhash_sig.
    Docs with token-length outliers compute per-doc (same bits)."""
    bufs: list[bytes] = []
    starts_l: list["np.ndarray"] = []
    lens_l: list["np.ndarray"] = []
    counts: list[int] = []  # shingles per doc (0 = empty, -1 = outlier)
    outliers: dict[int, list[int]] = {}
    off = 0
    for di, t in enumerate(texts):
        toks = tokenize(t or "")
        if not toks:
            counts.append(0)
            continue
        if max(map(len, toks)) > _BATCH_TOKEN_MAXLEN:
            outliers[di] = minhash_sig_np(t, k)
            counts.append(-1)
            continue
        joined, s, ln = _shingle_layout(toks)
        bufs.append(joined)
        starts_l.append(s + off)
        lens_l.append(ln)
        counts.append(len(s))
        off += len(joined)
    empty_sig = [_MERSENNE61 - 1] * k
    if not bufs:
        return [
            outliers[i] if c == -1 else list(empty_sig)
            for i, c in enumerate(counts)
        ]
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.concatenate(starts_l)
    lens = np.concatenate(lens_l)
    x = _fnv1a64_flat(flat, starts, lens)
    x = (x >> np.uint64(61)) + (x & _np_P)  # pre-reduce < 2^61 once
    x = np.where(x >= _np_P, x - _np_P, x)
    nz = np.array([c for c in counts if c > 0], dtype=np.int64)
    bounds = np.zeros(len(nz) + 1, dtype=np.int64)
    np.cumsum(nz, out=bounds[1:])
    # cache-block the (k, shingles) modmul: one giant matrix spills
    # every ~230MB temporary to RAM (measured 6x slower than per-doc);
    # doc-aligned blocks of ~8k shingles keep all temps in L2/L3 and
    # need no cross-block min merging.
    mins_cols = []
    d0 = 0
    while d0 < len(nz):
        d1 = d0 + 1
        while d1 < len(nz) and bounds[d1 + 1] - bounds[d0] <= 8192:
            d1 += 1
        xb = x[bounds[d0] : bounds[d1]]
        h = (
            _mulmod61_reduced(_np_A1[:k, None], _np_A0[:k, None], xb[None, :])
            + _np_B[:k, None]
        )  # < 2p
        h = np.where(h >= _np_P, h - _np_P, h)
        seg = (bounds[d0:d1] - bounds[d0]).astype(np.int64)
        mins_cols.append(np.minimum.reduceat(h, seg, axis=1))
        d0 = d1
    mins = np.concatenate(mins_cols, axis=1).astype(np.int64)  # (k, n_nz)
    sig_rows = mins.T.tolist()  # one conversion, row-major per doc
    out: list[list[int]] = []
    col = 0
    for i, c in enumerate(counts):
        if c > 0:
            out.append(sig_rows[col])
            col += 1
        elif c == -1:
            out.append(outliers[i])
        else:
            out.append(list(empty_sig))
    return out


def simhash64_many(texts) -> list[int]:
    """Batched simhash64: ONE flat FNV pass over every token of every
    doc, one (total_tokens, 64) bit matrix, per-doc sums via
    add.reduceat. Bit-identical to simhash64 (returns unsigned ints).
    Docs with token-length outliers compute per-doc (same bits)."""
    bufs: list[bytes] = []
    starts_l: list["np.ndarray"] = []
    lens_l: list["np.ndarray"] = []
    counts: list[int] = []  # tokens per doc (0 = empty, -1 = outlier)
    outliers: dict[int, int] = {}
    off = 0
    for di, t in enumerate(texts):
        toks = tokenize(t or "")
        if toks and max(map(len, toks)) > _BATCH_TOKEN_MAXLEN:
            outliers[di] = simhash64_np(t)
            counts.append(-1)
            continue
        counts.append(len(toks))
        if not toks:
            continue
        joined = " ".join(toks).encode("utf-8")
        _, s, tl = _token_layout(joined)
        bufs.append(joined)
        starts_l.append(s + off)
        lens_l.append(tl)
        off += len(joined)
    if not bufs:
        return [
            outliers[i] if c == -1 else 0 for i, c in enumerate(counts)
        ]
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    h = _fnv1a64_flat(flat, np.concatenate(starts_l), np.concatenate(lens_l))
    # bit matrix as uint8 via unpackbits (little-endian bytes +
    # bitorder='little' => column j is bit j of the uint64), 8x
    # smaller than an int64 matrix so doc blocks stay in cache
    bits = np.unpackbits(
        h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    nz = np.array([c for c in counts if c > 0], dtype=np.int64)
    bounds = np.zeros(len(nz) + 1, dtype=np.int64)
    np.cumsum(nz, out=bounds[1:])
    ones_parts = []
    d0 = 0
    while d0 < len(nz):
        d1 = d0 + 1
        while d1 < len(nz) and bounds[d1 + 1] - bounds[d0] <= 8192:
            d1 += 1
        seg = (bounds[d0:d1] - bounds[d0]).astype(np.int64)
        ones_parts.append(
            np.add.reduceat(
                bits[bounds[d0] : bounds[d1]], seg, axis=0, dtype=np.int64
            )
        )
        d0 = d1
    ones = np.concatenate(ones_parts, axis=0)  # (n_nz, 64)
    sel = (2 * ones > nz[:, None]).astype(np.uint64)
    vals = (sel << _np_BITS[None, :]).sum(axis=1, dtype=np.uint64).tolist()
    out: list[int] = []
    col = 0
    for i, c in enumerate(counts):
        if c > 0:
            out.append(vals[col])
            col += 1
        elif c == -1:
            out.append(outliers[i])
        else:
            out.append(0)
    return out


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
