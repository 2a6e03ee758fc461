"""Baseline JPEG codec (engine/kernels/jpeg.py decoder +
engine/synth/jpeggen.py fixture encoder): round-trip accuracy within
quantization error, byte-pinned goldens (container AND decoded
pixels — both platform-deterministic by construction), restart
markers, 4:2:0 interleaved MCUs, odd sizes, typed honest-scope
rejections, and total error folding through media_features."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from engine.kernels.jpeg import decode_jpeg_luma, jpeg_meta
from engine.synth.jpeggen import (
    encode_jpeg_gray,
    make_jpeg_gray,
    make_jpeg_ycbcr420,
)


def _gradient(w, h, a=3, b=5, base=10):
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    return ((base + a * xs[None, :] + b * ys[:, None]) & 0xFF).astype(
        np.uint8
    )


def test_gray_roundtrip_within_quant_error():
    src = _gradient(32, 24)
    raw = encode_jpeg_gray(src.tobytes(), 32, 24, quality=95)
    assert raw[:3] == b"\xff\xd8\xff" and raw[-2:] == b"\xff\xd9"
    assert jpeg_meta(raw) == (32, 24, 1)
    w, h, px = decode_jpeg_luma(raw)
    dec = np.frombuffer(px, np.uint8).reshape(h, w)
    assert (w, h) == (32, 24)
    assert np.abs(dec.astype(int) - src.astype(int)).max() <= 2


def test_flat_block_roundtrips_exactly():
    """A constant image has only a DC coefficient — quantization
    cannot lose anything, so the round-trip is EXACT at any
    quality."""
    src = np.full((16, 16), 77, dtype=np.uint8)
    for q in (30, 75, 95):
        w, h, px = decode_jpeg_luma(
            encode_jpeg_gray(src.tobytes(), 16, 16, quality=q)
        )
        assert np.frombuffer(px, np.uint8).reshape(16, 16).tolist() == src.tolist()


def test_restart_markers_do_not_change_pixels():
    src = _gradient(32, 24)
    ref = decode_jpeg_luma(
        encode_jpeg_gray(src.tobytes(), 32, 24, quality=95)
    )[2]
    for ri in (1, 2, 7):
        raw = encode_jpeg_gray(
            src.tobytes(), 32, 24, quality=95, restart_interval=ri
        )
        assert b"\xff\xdd" in raw  # DRI present
        assert decode_jpeg_luma(raw)[2] == ref


def test_ycbcr420_interleaved_luma():
    """Color 4:2:0 with restarts: chroma blocks are entropy-decoded
    in the interleaved MCU stream, the returned luma matches the
    encoder's Y plane within quantization error."""
    raw = make_jpeg_ycbcr420(42, 7)
    assert jpeg_meta(raw) == (32, 24, 3)
    w, h, px = decode_jpeg_luma(raw)
    from engine.corpus import _Rng

    base = _Rng(42, 7).next() & 0xFF
    ysrc = _gradient(32, 24, a=2, b=7, base=base)
    dec = np.frombuffer(px, np.uint8).reshape(24, 32)
    assert np.abs(dec.astype(int) - ysrc.astype(int)).max() <= 3


def test_odd_sizes_edge_padding():
    """Non-multiple-of-8 (and of-16 for 4:2:0 MCUs) sizes decode to
    the exact stated dimensions; padding never leaks into pixels."""
    for w, h in ((21, 13), (8, 8), (9, 17), (1, 1)):
        src = ((5 * np.arange(w)[None, :] + 11 * np.arange(h)[:, None]) % 251).astype(np.uint8)
        raw = encode_jpeg_gray(src.tobytes(), w, h, quality=92)
        W, H, px = decode_jpeg_luma(raw)
        assert (W, H) == (w, h) and len(px) == w * h
        dec = np.frombuffer(px, np.uint8).reshape(h, w)
        assert np.abs(dec.astype(int) - src.astype(int)).max() <= 4


def test_deterministic_goldens():
    """Container bytes AND decoded pixels pinned (both are fixed-
    order integer/float64 computations — a platform or refactor
    drift fails here, not in a downstream hash mismatch)."""
    raw = make_jpeg_gray(42, 6)
    assert hashlib.sha256(raw).hexdigest() == (
        "07887144f1f868bde061880195b965836e1b1e98d9e06898eb9f1e91c58c3795"
    )
    px = decode_jpeg_luma(raw)[2]
    assert hashlib.sha256(px).hexdigest() == (
        "24b237e4ded863eeb747e06bebe4a728c25b581c6254de38a846dbbe2c5369b6"
    )
    col = make_jpeg_ycbcr420(42, 7)
    assert hashlib.sha256(col).hexdigest() == (
        "634651189884963b360b66bbbfaf6a6cf62f7c17f3967c5aef4ee3227894b238"
    )
    assert hashlib.sha256(decode_jpeg_luma(col)[2]).hexdigest() == (
        "9fec360c22ca934b26cfeec05154b6cf9342295a3c0415da3a1b04378f8f72a0"
    )


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def test_typed_rejections():
    sof_body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    prog = b"\xff\xd8" + _seg(0xC2, sof_body)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_meta(prog)
    arith = b"\xff\xd8" + _seg(0xC9, sof_body)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_luma(arith)
    with pytest.raises(ValueError, match="not_jpeg"):
        decode_jpeg_luma(b"\x00\x00")
    # truncated entropy stream -> typed ValueError, not an index crash
    good = make_jpeg_gray(42, 2)
    with pytest.raises(ValueError):
        decode_jpeg_luma(good[: len(good) // 2])


def test_media_features_jpeg_real_decode():
    from engine.kernels.multimodal import ahash64, media_features

    raw = make_jpeg_gray(42, 8)
    f = media_features(raw)
    assert f["kind"] == "jpeg" and f["decode_status"] == "ok"
    assert (f["width"], f["height"]) == (32, 24)
    w, h, px = decode_jpeg_luma(raw)
    assert f["ahash"] == ahash64(px, w, h) - (1 << 63)
    assert f["px_mean"] == sum(px) // len(px)


def test_dct_basis_orthonormal_and_inverse():
    """Mathematical verification of the codec core INDEPENDENT of the
    encoder: the 8-point DCT basis is orthonormal (A A^T = I) and the
    unquantized transform round-trips arbitrary blocks to 1e-10 — so
    any round-trip error in the fixtures is quantization, not the
    transform."""
    import numpy as np

    from engine.kernels.jpeg import _A

    assert np.abs(_A @ _A.T - np.eye(8)).max() < 1e-12
    rng = np.random.default_rng(20260821)
    for _ in range(20):
        block = rng.uniform(-128, 127, size=(8, 8))
        coeffs = _A @ block @ _A.T       # forward (encoder)
        back = _A.T @ coeffs @ _A        # inverse (decoder)
        assert np.abs(back - block).max() < 1e-10
