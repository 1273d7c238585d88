"""Real (library-free) media codecs for the multimodal stages.

The container ships no PIL/av/torchaudio, but two real formats ARE
decodable with the standard library alone, so the multimodal pipeline
gets a genuine codec path instead of only the hash-derived 'fake'
backend:

- WAV (PCM16) via the stdlib ``wave`` module;
- PNG (8-bit RGB, non-interlaced) via a spec-complete minimal codec:
  chunk walk → zlib inflate → scanline un-filtering (all five filter
  types 0-4 per the PNG spec §9: None/Sub/Up/Average/Paeth).

Both directions are implemented so tests and the synthetic generator
produce REAL payloads: a pixel/sample array round-trips bit-exactly.
Video remains honestly out of scope (no h264 without native libs); the
frame-sampling stage exercises its plumbing on a length-prefixed
concatenation of PNG frames (an explicit test container, not a codec
claim).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# WAV (PCM16 mono/stereo)


def write_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples (n,) or (n, channels) → WAV bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def read_wav(payload: bytes):
    """WAV bytes → (int16 array shaped (n,) or (n, ch), sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        channels = w.getnchannels()
        rate = w.getframerate()
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        data = np.frombuffer(w.readframes(n), dtype=np.int16)
    if channels > 1:
        data = data.reshape(-1, channels)
    return data, rate


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, no interlace)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def write_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 → PNG bytes. ``filter_type`` selects the per-row
    filter (0-4) so tests can exercise every decoder branch."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = rgb[y].reshape(-1)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            filt = (
                row.astype(np.int16) - _paeth(left, prev, ul)
            ).astype(np.uint8)
        else:
            raise ValueError("filter_type must be 0-4")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out


def read_png(payload: bytes) -> np.ndarray:
    """PNG bytes (8-bit RGB, non-interlaced) → (h, w, 3) uint8."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (depth, color, interlace) != (8, 2, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(
            raw[pos + 1 : pos + 1 + stride], dtype=np.uint8
        ).copy()
        pos += 1 + stride
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up
            rec = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth need left → sequential
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (int(left) + int(up)) // 2
                else:
                    p = int(left) + int(up) - int(ul)
                    pa, pb, pc = (
                        abs(p - int(left)), abs(p - int(up)), abs(p - int(ul))
                    )
                    pred = (
                        left if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul)
                    )
                rec[x] = (int(row[x]) + int(pred)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec
        prev = rec
    return out.reshape(height, width, bpp)


# ---------------------------------------------------------------------------
# test container for video plumbing: length-prefixed PNG frames


def write_frame_container(frames) -> bytes:
    """[(h,w,3) uint8, ...] → b''.join(len-prefix + png) (explicitly a
    TEST container — real video codecs need native libs)."""
    out = bytearray(b"FCV1")
    for f in frames:
        png = write_png(f)
        out.extend(struct.pack(">I", len(png)))
        out.extend(png)
    return bytes(out)


def read_frame_container(payload: bytes):
    if payload[:4] != b"FCV1":
        raise ValueError("not a frame container")
    pos = 4
    frames = []
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("truncated frame container (short length prefix)")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        if pos + 4 + length > len(payload):
            raise ValueError("truncated frame container (short frame payload)")
        frames.append(read_png(payload[pos + 4 : pos + 4 + length]))
        pos += 4 + length
    return frames
