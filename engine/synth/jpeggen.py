"""Deterministic baseline JFIF encoder — the fixture generator for
engine/kernels/jpeg.py (no Pillow/libjpeg in this container, so the
repo carries its own T.81 baseline writer, the same stance as
engine/synth/pdfgen.py for the PDF kernel).

Scope mirrors what the decoder must handle:

  * grayscale (1 component) and YCbCr (3 components) with arbitrary
    per-component sampling factors — 4:4:4 ((1,1)) and 4:2:0 ((2,2))
    are the generated layouts;
  * arbitrary quality via libjpeg-style scaling of the T.81 Annex K
    example luminance quant table;
  * optional restart intervals (DRI + RSTn), exercising the
    decoder's resync path;
  * SELF-DESCRIBED Huffman tables: fixed-length canonical codes (12
    4-bit DC codes, 162 8-bit AC codes) written into DHT — valid
    per T.81, deliberately NOT the Annex K defaults, so the decoder's
    generic DHT handling is what the round-trip pins (a decoder that
    hardcoded the standard tables would fail these fixtures).

Pure numpy integer/float64 ops in fixed order + canonical Huffman:
output bytes are platform-deterministic, so tests pin decoded pixels
AND container bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from engine.kernels.jpeg import _A, ZIGZAG

# T.81 Annex K.1 example luminance quantization table (raster order)
_K1_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)


def _quality_qtab(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the K.1 table."""
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_K1_LUMA_Q * scale + 50) / 100)
    return np.clip(q, 1, 255)


# fixed-length canonical Huffman tables (see module docstring):
# DC: 12 symbols (size categories 0..11), all 4-bit codes
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALUES = bytes(range(12))
# AC: the 162 baseline (run,size) symbols, all 8-bit codes
_AC_VALUES = bytes(
    [0x00, 0xF0]  # EOB, ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0] * 7 + [len(_AC_VALUES)] + [0] * 8
_DC_CODE = {sym: (4, i) for i, sym in enumerate(_DC_VALUES)}
_AC_CODE = {sym: (8, i) for i, sym in enumerate(_AC_VALUES)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad_to_byte(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per T.81


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    writer: _BitWriter, block: np.ndarray, qtab: np.ndarray, pred: int
) -> int:
    """Forward DCT + quantize + Huffman-encode one 8x8 block;
    returns the new DC predictor."""
    coeffs = _A @ (block - 128.0) @ _A.T
    quant = np.rint(coeffs / qtab).astype(np.int64)
    zz = [int(quant.flat[ZIGZAG[i]]) for i in range(64)]

    diff = zz[0] - pred
    size = _category(diff)
    ln, code = _DC_CODE[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)

    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODE[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size = _category(v)
        ln, code = _AC_CODE[(run << 4) | size]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        ln, code = _AC_CODE[0x00]  # EOB
        writer.write(code, ln)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload() -> bytes:
    return (
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_VALUES
    )


def _pad_plane(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Edge-replicate to a multiple of the block grid (bw x bh)."""
    h, w = plane.shape
    return np.pad(
        plane, ((0, bh - h), (0, bw - w)), mode="edge"
    ) if (h, w) != (bh, bw) else plane


def encode_jpeg(
    planes: list[np.ndarray],
    samplings: list[tuple[int, int]],
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Encode component planes (uint8 2-D arrays; planes[i] at its
    OWN subsampled resolution — the caller downsamples chroma) into a
    baseline JFIF byte string. planes[0] is luma and defines the
    image size via samplings (Y must carry the max factors)."""
    n_comp = len(planes)
    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)
    y_h, y_w = planes[0].shape
    img_w = (y_w * hmax) // samplings[0][0]
    img_h = (y_h * vmax) // samplings[0][1]
    qtab = _quality_qtab(quality)

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (img_w + mcu_w - 1) // mcu_w
    mcus_y = (img_h + mcu_h - 1) // mcu_h

    padded = []
    for plane, (ch, cv) in zip(planes, samplings):
        padded.append(
            _pad_plane(
                plane.astype(np.float64), mcus_x * ch * 8, mcus_y * cv * 8
            )
        )

    writer = _BitWriter()
    preds = [0] * n_comp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                writer.pad_to_byte()
                writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * n_comp
            mcu_count += 1
            for ci, (ch, cv) in enumerate(samplings):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, qtab, preds[ci]
                        )
    writer.pad_to_byte()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zz_q = bytes(int(qtab.flat[ZIGZAG[i]]) for i in range(64))
    out += _seg(0xDB, bytes([0x00]) + zz_q)
    sof = struct.pack(">BHHB", 8, img_h, img_w, n_comp)
    for ci, (ch, cv) in enumerate(samplings):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload())
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])  # dc table 0, ac table 0
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(
    px: bytes | np.ndarray,
    w: int,
    h: int,
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    plane = (
        np.frombuffer(px, dtype=np.uint8)
        if isinstance(px, (bytes, bytearray))
        else np.asarray(px, dtype=np.uint8)
    ).reshape(h, w)
    return encode_jpeg(
        [plane], [(1, 1)], quality=quality, restart_interval=restart_interval
    )


def make_jpeg_gray(seed: int, i: int, w: int = 32, h: int = 24) -> bytes:
    """Deterministic synthetic JPEG (the mediagen gradient family —
    same pixel recipe as make_png_gray so near-dup tests can compare
    formats), grayscale, quality 90."""
    from engine.corpus import _Rng

    rng = _Rng(seed, i)
    base = rng.next() & 0xFF
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    plane = ((base + 3 * xs[None, :] + 5 * ys[:, None]) & 0xFF).astype(
        np.uint8
    )
    return encode_jpeg_gray(plane.tobytes(), w, h, quality=90)


def make_jpeg_ycbcr420(seed: int, i: int, w: int = 32, h: int = 24) -> bytes:
    """Deterministic color JPEG with 4:2:0 subsampling + a restart
    interval — the decoder's interleaved-MCU and resync paths in one
    fixture."""
    from engine.corpus import _Rng

    rng = _Rng(seed, i)
    base = rng.next() & 0xFF
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    y_plane = ((base + 2 * xs[None, :] + 7 * ys[:, None]) & 0xFF).astype(
        np.uint8
    )
    cw, chh = (w + 1) // 2, (h + 1) // 2
    cxs = np.arange(cw, dtype=np.int64)
    cys = np.arange(chh, dtype=np.int64)
    cb = np.tile(
        ((64 + 5 * cxs + base) & 0xFF).astype(np.uint8), (chh, 1)
    )
    cr = np.tile(
        ((192 + 3 * cys) & 0xFF).astype(np.uint8)[:, None], (1, cw)
    )
    return encode_jpeg(
        [y_plane, cb, cr],
        [(2, 2), (1, 1), (1, 1)],
        quality=85,
        restart_interval=2,
    )


# ---------------------------------------------------------------------------
# Progressive (SOF2) fixture encoder — the deterministic twin of the
# r5 progressive decoder path (engine/kernels/jpeg.py Annex-G
# support). Same fixture-encoder philosophy as the baseline writer:
# fixed-length SELF-DESCRIBED Huffman tables (non-standard on
# purpose), pure integer/float64 numpy in fixed order, so container
# bytes AND decoded pixels are platform-deterministic and pinnable.
#
# Progressive AC scans additionally need EOBn symbols (r<<4, r<15)
# for end-of-band run coding, so the progressive AC table carries
# 176 symbols: 15 EOBn + ZRL + the 160 (run,size) codes — all 8-bit
# fixed-length canonical codes (<=256 fits; the all-ones code stays
# unassigned as T.81 requires).
# ---------------------------------------------------------------------------

_PROG_AC_VALUES = bytes(
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_BITS = [0] * 7 + [len(_PROG_AC_VALUES)] + [0] * 8
_PROG_AC_CODE = {sym: (8, i) for i, sym in enumerate(_PROG_AC_VALUES)}


def _prog_dht_payload() -> bytes:
    return (
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALUES
        + bytes([0x10]) + bytes(_PROG_AC_BITS) + _PROG_AC_VALUES
    )


def _quant_zigzag_blocks(
    plane: np.ndarray, qtab: np.ndarray, bw: int, bh: int
) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of an edge-padded
    plane -> int64 array (bh, bw, 64) in ZIGZAG order."""
    padded = _pad_plane(plane.astype(np.float64), bw * 8, bh * 8)
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coeffs = np.einsum("ij,nmjk,kl->nmil", _A, blocks, _A.T)
    quant = np.rint(coeffs / qtab).astype(np.int64)
    flat = quant.reshape(bh, bw, 64)
    return flat[:, :, np.array(ZIGZAG)]


class _ProgScanState:
    """Per-scan entropy state: the EOB run counter plus the deferred
    correction bits that refinement scans must emit WITH the EOB
    symbol that closes the run (IJG's BE buffer)."""

    __slots__ = ("eobrun", "pending")

    def __init__(self):
        self.eobrun = 0
        self.pending: list[int] = []


def _emit_prog_sym(writer: _BitWriter, sym: int) -> None:
    ln, code = _PROG_AC_CODE[sym]
    writer.write(code, ln)


def _flush_eobrun(writer: _BitWriter, st: _ProgScanState) -> None:
    if st.eobrun > 0:
        nbits = st.eobrun.bit_length() - 1
        _emit_prog_sym(writer, nbits << 4)
        if nbits:
            writer.write(st.eobrun & ((1 << nbits) - 1), nbits)
        st.eobrun = 0
        for b in st.pending:
            writer.write(b, 1)
        st.pending = []


def _enc_dc_first(writer, zz0: int, pred: int, al: int) -> int:
    """DC first scan, one block: encode (coef0 >> Al) as a diff.
    Arithmetic shift (Python >>) matches the decoder's << Al
    reconstruction; returns the new predictor."""
    t = zz0 >> al
    diff = t - pred
    size = _category(diff)
    ln, code = _DC_CODE[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    return t


def _enc_ac_first(writer, zz, ss, se, al, st: _ProgScanState) -> None:
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        mag = (-t if t < 0 else t) >> al
        if mag == 0:
            r += 1
            continue
        _flush_eobrun(writer, st)
        while r > 15:
            _emit_prog_sym(writer, 0xF0)
            r -= 16
        size = mag.bit_length()
        _emit_prog_sym(writer, (r << 4) | size)
        val = mag if t >= 0 else -mag
        writer.write(val if val >= 0 else val + (1 << size) - 1, size)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(writer, st)


def _enc_ac_refine(writer, zz, ss, se, al, st: _ProgScanState) -> None:
    """AC refinement scan, one block (the jcphuff G.7 realization):
    already-nonzero coefficients contribute one correction bit (the
    next magnitude bit); newly nonzero +-1 coefficients get a
    (run,1) symbol + sign bit; trailing zeros fold into the shared
    EOB run whose correction bits are deferred in st.pending."""
    absv = [(-int(zz[k]) if zz[k] < 0 else int(zz[k])) >> al
            for k in range(ss, se + 1)]
    eob_idx = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob_idx = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_idx:
            _flush_eobrun(writer, st)
            _emit_prog_sym(writer, 0xF0)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:  # previously nonzero: correction bit only
            br.append(t & 1)
            continue
        _flush_eobrun(writer, st)
        _emit_prog_sym(writer, (r << 4) | 1)
        writer.write(0 if zz[k] < 0 else 1, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF or len(st.pending) > 930:
            _flush_eobrun(writer, st)


def encode_jpeg_progressive(
    planes: list[np.ndarray],
    samplings: list[tuple[int, int]],
    quality: int = 90,
    restart_interval: int = 0,
    script: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """Encode component planes into a progressive (SOF2) JFIF byte
    string. `script` is a list of (comp_indices, Ss, Se, Ah, Al)
    scans; the default exercises BOTH progressive dimensions the
    decoder supports: an Al=1 DC first scan + DC refinement, and
    per-component AC band scans at Al=2 successively refined to 0.
    Restart intervals apply inside every scan (MCU-counted for the
    interleaved DC scan, block-counted otherwise).

    Progressive coding is lossless over the QUANTIZED coefficients,
    so for any script the decode must be bit-identical to decoding
    the baseline encode of the same planes/quality — the round-trip
    invariant tests/test_jpeg.py pins."""
    n_comp = len(planes)
    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)
    y_h, y_w = planes[0].shape
    img_w = (y_w * hmax) // samplings[0][0]
    img_h = (y_h * vmax) // samplings[0][1]
    qtab = _quality_qtab(quality)
    mcus_x = (img_w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (img_h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficients, padded MCU grid per component
    zz = []
    grids = []  # (bw_own, bh_own) non-interleaved grids
    for plane, (ch, cv) in zip(planes, samplings):
        pw, ph = mcus_x * ch, mcus_y * cv  # padded grid, blocks
        zz.append(
            _quant_zigzag_blocks(plane.astype(np.float64), qtab, pw, ph)
        )
        cw = (img_w * ch + hmax - 1) // hmax
        chh = (img_h * cv + vmax - 1) // vmax
        grids.append(((cw + 7) // 8, (chh + 7) // 8))

    if script is None:
        script = [
            (list(range(n_comp)), 0, 0, 0, 1),
            *[([c], 1, 5, 0, 2) for c in range(n_comp)],
            *[([c], 6, 63, 0, 2) for c in range(n_comp)],
            *[([c], 1, 63, 2, 1) for c in range(n_comp)],
            *[([c], 1, 63, 1, 0) for c in range(n_comp)],
            (list(range(n_comp)), 0, 0, 1, 0),
        ]

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0,
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
        + b"\x00\x00",
    )
    zz_q = bytes(int(qtab.flat[ZIGZAG[i]]) for i in range(64))
    out += _seg(0xDB, bytes([0x00]) + zz_q)
    sof = struct.pack(">BHHB", 8, img_h, img_w, n_comp)
    for ci, (ch, cv) in enumerate(samplings):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _prog_dht_payload())
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    for comps, ss, se, ah, al in script:
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, 0x00])  # dc table 0, ac table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)

        writer = _BitWriter()
        rst = 0

        def _restart(preds=None):
            nonlocal rst
            writer.pad_to_byte()
            writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            if preds is not None:
                for i in range(len(preds)):
                    preds[i] = 0

        if ss == 0:  # DC scan (interleaved when len(comps) > 1)
            preds = [0] * n_comp
            unit = 0
            if len(comps) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if (
                            restart_interval
                            and unit
                            and unit % restart_interval == 0
                        ):
                            _restart(preds)
                        unit += 1
                        for ci in comps:
                            ch, cv = samplings[ci]
                            for by in range(cv):
                                for bx in range(ch):
                                    z0 = int(
                                        zz[ci][my * cv + by, mx * ch + bx, 0]
                                    )
                                    if ah == 0:
                                        preds[ci] = _enc_dc_first(
                                            writer, z0, preds[ci], al
                                        )
                                    else:
                                        writer.write((z0 >> al) & 1, 1)
            else:
                ci = comps[0]
                bw, bh = grids[ci]
                for by in range(bh):
                    for bx in range(bw):
                        if (
                            restart_interval
                            and unit
                            and unit % restart_interval == 0
                        ):
                            _restart(preds)
                        unit += 1
                        z0 = int(zz[ci][by, bx, 0])
                        if ah == 0:
                            preds[ci] = _enc_dc_first(
                                writer, z0, preds[ci], al
                            )
                        else:
                            writer.write((z0 >> al) & 1, 1)
        else:  # AC scan: single component (T.81 G.1.1.1.1)
            if len(comps) != 1:
                raise ValueError("progressive AC scans are per-component")
            ci = comps[0]
            bw, bh = grids[ci]
            st = _ProgScanState()
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        _flush_eobrun(writer, st)
                        _restart()
                    unit += 1
                    block = zz[ci][by, bx]
                    if ah == 0:
                        _enc_ac_first(writer, block, ss, se, al, st)
                    else:
                        _enc_ac_refine(writer, block, ss, se, al, st)
            _flush_eobrun(writer, st)
        writer.pad_to_byte()
        out += writer.out

    out += b"\xff\xd9"
    return bytes(out)


def make_jpeg_progressive_gray(
    seed: int, i: int, w: int = 32, h: int = 24
) -> bytes:
    """Deterministic progressive JPEG — same gradient pixel recipe as
    make_jpeg_gray at the same quality, so the two files decode to
    byte-identical luma (the cross-mode pin) and cross-format
    perceptual dedup gets a progressive member."""
    from engine.corpus import _Rng

    rng = _Rng(seed, i)
    base = rng.next() & 0xFF
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    plane = ((base + 3 * xs[None, :] + 5 * ys[:, None]) & 0xFF).astype(
        np.uint8
    )
    return encode_jpeg_progressive([plane], [(1, 1)], quality=90)


def make_jpeg_progressive_ycbcr420(
    seed: int, i: int, w: int = 32, h: int = 24
) -> bytes:
    """Progressive twin of make_jpeg_ycbcr420: 4:2:0 sampling +
    restart intervals inside every scan — interleaved-DC resync,
    per-band EOBRUN reset, and chroma-AC-skip all in one fixture."""
    from engine.corpus import _Rng

    rng = _Rng(seed, i)
    base = rng.next() & 0xFF
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    y_plane = ((base + 2 * xs[None, :] + 7 * ys[:, None]) & 0xFF).astype(
        np.uint8
    )
    cw, chh = (w + 1) // 2, (h + 1) // 2
    cxs = np.arange(cw, dtype=np.int64)
    cys = np.arange(chh, dtype=np.int64)
    cb = np.tile(((64 + 5 * cxs + base) & 0xFF).astype(np.uint8), (chh, 1))
    cr = np.tile(((192 + 3 * cys) & 0xFF).astype(np.uint8)[:, None], (1, cw))
    return encode_jpeg_progressive(
        [y_plane, cb, cr],
        [(2, 2), (1, 1), (1, 1)],
        quality=85,
        restart_interval=2,
    )
