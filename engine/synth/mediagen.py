"""Deterministic synthetic media corpus (images + audio as opaque
binary columns), mirroring engine/corpus.py: every row is a pure
function of (seed, media_id) so any scale regenerates identically on
any executor.

Mix: ~40% PNG (gray-8, really decodable by the kernel), ~5% GIF
(87a/89a gray, really decodable since r4, interlaced 1-in-3), ~35% WAV
(rotating the four really-decodable formula-defined codecs since r5:
PCM16 / G.711 mu-law / G.711 A-law / IEEE float32, all mono), ~10%
REAL JPEG (rotating all four decoder paths since r5: gray baseline /
YCbCr 4:2:0 w/ restarts / progressive gray / progressive 4:2:0), ~5%
MP4 stubs, ~5% garbage. Pixel/sample content is integer-only (no
libm; the JPEG DCT is fixed-order float64 rounded to uint8) so bytes
are identical across platforms; PNG compressed bytes depend on the
in-process zlib, so goldens pin DECODED pixels / hashes, not the
container bytes.
"""

from __future__ import annotations

import struct
import zlib

from engine.corpus import _Rng

MEDIA_SCHEMA_DDL = (
    "media_id long, url string, kind string, payload binary, label int"
)


def make_png_gray(seed: int, i: int, w: int = 32, h: int = 24) -> bytes:
    rng = _Rng(seed, i)
    base = rng.next() & 0xFF
    px = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            # integer gradient + per-image offset: structured enough
            # that aHash differs between images, no RNG per pixel
            px[y * w + x] = (base + 3 * x + 5 * y) & 0xFF
    raw = b"".join(
        b"\x00" + bytes(px[y * w : (y + 1) * w]) for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_wav_pcm16(seed: int, i: int, n_samples: int = 2000) -> bytes:
    rng = _Rng(seed, i)
    period = 20 + (rng.next() % 80)
    amp = 4000 + (rng.next() % 20000)
    samples = []
    for t in range(n_samples):
        # integer triangle wave — deterministic without libm
        phase = t % period
        half = period // 2
        v = (phase * 2 * amp) // max(1, half) - amp if phase < half else (
            amp - ((phase - half) * 2 * amp) // max(1, period - half)
        )
        samples.append(max(-32768, min(32767, v)))
    data = struct.pack(f"<{n_samples}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _wav_container(fmt_chunk: bytes, data: bytes) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_chunk) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def linear_to_mulaw(pcm: int) -> int:
    """G.711 mu-law compression of one linear sample — the fixture-
    side inverse of engine/kernels/multimodal._mulaw_to_linear
    (pinned bijective on all 256 code points in tests)."""
    sign = 0x80 if pcm < 0 else 0
    if pcm < 0:
        pcm = -pcm
    pcm = min(pcm, 32635) + 0x84
    exponent = pcm.bit_length() - 8  # pcm >= 0x84 so >= 0
    mantissa = (pcm >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def linear_to_alaw(pcm: int) -> int:
    """G.711 A-law compression (sign bit SET means positive; output
    XOR 0x55 masked)."""
    sign = 0x80 if pcm >= 0 else 0
    if pcm < 0:
        pcm = -pcm
    pcm = min(pcm, 32767)
    if pcm >= 256:
        exponent = pcm.bit_length() - 8  # 1..7
        mantissa = (pcm >> (exponent + 3)) & 0x0F
        b = (exponent << 4) | mantissa
    else:
        b = pcm >> 4
    return (b | sign) ^ 0x55


def _triangle_wave(seed: int, i: int, n_samples: int) -> list[int]:
    rng = _Rng(seed, i)
    period = 20 + (rng.next() % 80)
    amp = 4000 + (rng.next() % 20000)
    samples = []
    for t in range(n_samples):
        phase = t % period
        half = period // 2
        v = (phase * 2 * amp) // max(1, half) - amp if phase < half else (
            amp - ((phase - half) * 2 * amp) // max(1, period - half)
        )
        samples.append(max(-32768, min(32767, v)))
    return samples


def make_wav_mulaw(seed: int, i: int, n_samples: int = 2000) -> bytes:
    """G.711 mu-law WAV (format code 7) of the SAME triangle wave as
    make_wav_pcm16 — log-companded, so the energy-delta audio
    fingerprint must pair it with the PCM16 original at hamming 0."""
    samples = _triangle_wave(seed, i, n_samples)
    data = bytes(linear_to_mulaw(s) for s in samples)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    return _wav_container(fmt, data)


def make_wav_alaw(seed: int, i: int, n_samples: int = 2000) -> bytes:
    """G.711 A-law WAV (format code 6), same wave family."""
    samples = _triangle_wave(seed, i, n_samples)
    data = bytes(linear_to_alaw(s) for s in samples)
    fmt = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    return _wav_container(fmt, data)


def make_wav_float32(seed: int, i: int, n_samples: int = 2000) -> bytes:
    """IEEE float32 WAV (format code 3), same wave scaled to [-1,1]
    by 32767 — the decoder's pinned floor(x*32767+0.5) rounding makes
    the round-trip sample-exact vs the PCM16 original."""
    samples = _triangle_wave(seed, i, n_samples)
    data = struct.pack(f"<{n_samples}f", *[s / 32767.0 for s in samples])
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    return _wav_container(fmt, data)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def make_mp4_skeleton(seed: int, i: int) -> bytes:
    """Minimal valid ISO-BMFF shell: ftyp + moov(mvhd, trak(tkhd))
    with deterministic dimensions/duration — enough for the r4
    mp4_meta parse; no sample data (decode stays the codec stub)."""
    rng = _Rng(seed, i + 1_000_003)
    w = 160 + 16 * (rng.next() % 20)
    h = 120 + 16 * (rng.next() % 15)
    timescale = 1000
    duration = 1000 + (rng.next() % 60_000)
    mvhd = (
        bytes(4)                              # version 0 + flags
        + bytes(8)                            # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + bytes(80)                           # rate..matrix..next_track
    )
    tkhd = (
        bytes(4) + bytes(8)                   # version/flags, times
        + struct.pack(">I", 1) + bytes(4)     # track id, reserved
        + struct.pack(">I", duration)
        + bytes(8) + bytes(8)                 # reserved, layer..volume
        + bytes(36)                           # matrix
        + struct.pack(">II", w << 16, h << 16)
    )
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd)))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def make_mp3_frames(seed: int, i: int, n_frames: int = 8) -> bytes:
    """ID3v2 shell + CBR MPEG-1 Layer III frame headers (128 kbps @
    44100, no padding -> 417-byte frames of deterministic filler) —
    enough for the r4 mp3_meta parse; no real audio (decode stub)."""
    rng = _Rng(seed, i + 2_000_003)
    tag_body = b"TIT2" + bytes(6) + b"synthetic"
    tag = b"ID3\x03\x00\x00" + bytes(
        [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
         (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
    ) + tag_body
    frame_len = 144 * 128_000 // 44_100  # 417 bytes
    out = bytearray(tag)
    for _f in range(n_frames):
        out += b"\xff\xfb\x90\x00"  # MPEG1 L3, 128kbps, 44100, stereo
        out += bytes(((rng.next() + j) & 0xFF) for j in range(frame_len - 4))
    return bytes(out)


def make_media_row(seed: int, i: int) -> tuple[int, str, str, bytes, int]:
    rng = _Rng(seed, i)
    r = rng.uniform()
    if r < 0.40:
        kind, payload = "png", make_png_gray(seed, i)
    elif r < 0.45:  # REAL GIF (decodable since r4; interlace 1-in-3)
        from engine.synth.gifgen import make_gif_gray

        kind, payload = "gif", make_gif_gray(seed, i)
    elif r < 0.80:
        # WAV rotates the four formula-defined codecs (r5): PCM16 /
        # G.711 mu-law / G.711 A-law / IEEE float32 — all real decodes
        kind = "wav"
        payload = (
            make_wav_pcm16,
            make_wav_mulaw,
            make_wav_alaw,
            make_wav_float32,
        )[i % 4](seed, i)
    elif r < 0.90:  # REAL JPEG (decodable since r4; progressive r5):
        # gray baseline / YCbCr-4:2:0-with-restarts / progressive gray
        # / progressive 4:2:0 rotate, so every generated corpus
        # exercises all four decoder paths (incl. SOF2 Annex-G scans)
        from engine.synth.jpeggen import (
            make_jpeg_gray,
            make_jpeg_progressive_gray,
            make_jpeg_progressive_ycbcr420,
            make_jpeg_ycbcr420,
        )

        kind = "jpeg"
        payload = (
            make_jpeg_gray,
            make_jpeg_ycbcr420,
            make_jpeg_progressive_gray,
            make_jpeg_progressive_ycbcr420,
        )[i % 4](seed, i)
    elif r < 0.95:  # MP4: real box skeleton (meta parses; decode stub)
        kind = "mp4"
        payload = make_mp4_skeleton(seed, i)
    elif r < 0.98:  # MP3: ID3 tag + real frame headers (meta; stub)
        kind = "mp3"
        payload = make_mp3_frames(seed, i)
    else:
        kind, payload = "garbage", bytes((rng.next() & 0xFF for _ in range(32)))
    url = f"https://media{(rng.next() % 50):02d}.example.com/m/{i}.{kind}"
    return (i, url, kind, payload, i % 10)


def gen_media_pandas(seed: int, start: int, end: int):
    import pandas as pd

    rows = [make_media_row(seed, i) for i in range(start, end)]
    return pd.DataFrame(
        rows, columns=["media_id", "url", "kind", "payload", "label"]
    )


def gen_media_df(spark, n: int, seed: int = 42):
    """Distributed generation: spark.range + mapInPandas (same
    pattern as engine.corpus.gen_pages_df)."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].tolist()
            if ids:
                yield pd.DataFrame(
                    [make_media_row(seed, int(i)) for i in ids],
                    columns=["media_id", "url", "kind", "payload", "label"],
                )

    return spark.range(n).mapInPandas(fn, MEDIA_SCHEMA_DDL)
