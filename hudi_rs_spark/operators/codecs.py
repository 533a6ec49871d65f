"""Pure-python baseline media codecs (no PIL/ffmpeg in this
environment): PPM P6 images, 24-bit BMP images, PCM16 WAV audio, and a
minimal PPMV multi-frame container for frame-sampling tests.

These make the multimodal operators' decode step REAL — true pixel
dimensions, channel means, sample rates — for formats simple enough to
parse dependency-free. Production deployments swap in PIL/ffmpeg via
``multimodal.set_decoder``; the operator plumbing is identical either
way. Decoding runs inside mapInPandas on executors; numpy only.
"""

from __future__ import annotations

import struct

import numpy as np

PPMV_MAGIC = b"PPMV"


def sniff(data: bytes | None) -> str | None:
    """Best-effort container detection for the formats decoded here."""
    if not data:
        return None
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == PPMV_MAGIC:
        return "ppmv"
    return None


# ---------------------------------------------------------------------------
# PPM (P6 binary: "P6" <ws> width <ws> height <ws> maxval <single-ws> raw RGB)
# ---------------------------------------------------------------------------
def decode_ppm(data: bytes) -> np.ndarray:
    """-> (height, width, 3) uint8."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raw = data[pos : pos + width * height * 3]
    if len(raw) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24bpp, uncompressed, bottom-up rows padded to 4B)
# ---------------------------------------------------------------------------
def decode_bmp(data: bytes) -> np.ndarray:
    """-> (height, width, 3) uint8 in RGB order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    rows = []
    for r in range(height):
        start = pixel_off + r * row_bytes
        row = np.frombuffer(data[start : start + width * 3], dtype=np.uint8)
        rows.append(row.reshape(width, 3)[:, ::-1])  # BGR -> RGB
    arr = np.stack(rows)
    return arr if top_down else arr[::-1]


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24bpp bottom-up BMP (test-side round-trip partner)."""
    h, w = pixels.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(
        pixels[r, :, ::-1].astype(np.uint8).tobytes() + pad
        for r in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM16)
# ---------------------------------------------------------------------------
def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """-> (sample_rate, n_channels, samples[n, ch] int16)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, frames = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: format={fmt} bits={bits}")
        elif cid == b"data":
            frames = np.frombuffer(
                body[: len(body) & ~1], dtype="<i2"
            ).reshape(-1, channels or 1)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, channels, frames


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """PCM16 writer (test-side round-trip partner); samples (n, ch)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# resize + frame container
# ---------------------------------------------------------------------------
def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    h, w = pixels.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def encode_ppmv(frames: list[np.ndarray], frame_ms: int) -> bytes:
    """Minimal video stand-in: "PPMV" u32 frame_count u32 frame_ms, then
    per frame u32 length + P6 stream."""
    out = bytearray(PPMV_MAGIC + struct.pack(">II", len(frames), frame_ms))
    for f in frames:
        enc = encode_ppm(f)
        out += struct.pack(">I", len(enc)) + enc
    return bytes(out)


def decode_ppmv(data: bytes) -> tuple[int, list[np.ndarray]]:
    """-> (frame_ms, frames)."""
    if data[:4] != PPMV_MAGIC:
        raise ValueError("not a PPMV container")
    count, frame_ms = struct.unpack_from(">II", data, 4)
    frames, pos = [], 12
    for _ in range(count):
        (n,) = struct.unpack_from(">I", data, pos)
        frames.append(decode_ppm(data[pos + 4 : pos + 4 + n]))
        pos += 4 + n
    return frame_ms, frames
