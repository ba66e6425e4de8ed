"""Minimal pure-stdlib PNG codec (zlib + struct) for the image path.

This sandbox has no PIL/cv2, but PNG itself is just zlib-compressed
filtered scanlines (RFC 2083 / W3C PNG spec), so the N1-N5 image
operators (SURVEY.md §2.8) can run on REAL encoded images:

- `encode(arr)`  — 8-bit grayscale (H,W) or RGB (H,W,3) numpy array →
  PNG bytes (filter 0, non-interlaced).
- `decode(data)` — PNG bytes → numpy array; supports bit depth 8,
  color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA; alpha
  dropped), all five scanline filters, non-interlaced.

If Pillow exists (real cluster), `operators/imageops.py` prefers it —
this module is the dependency-free fallback, byte-compatible for the
subset above (round-trip tested in tests/test_imageops.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode(arr: "np.ndarray") -> bytes:
    """8-bit gray (H,W) or RGB (H,W,3) array → PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, h, w = 0, a.shape[0], a.shape[1]
        raw = a
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, h, w = 2, a.shape[0], a.shape[1]
        raw = a.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    # filter byte 0 (None) prepended to every scanline
    scanlines = np.empty((h, raw.shape[1] + 1), dtype=np.uint8)
    scanlines[:, 0] = 0
    scanlines[:, 1:] = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> "np.ndarray":
    """PNG bytes → uint8 array (H,W) gray or (H,W,3) RGB.
    Gray+alpha / RGBA inputs have alpha dropped."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = None
    idat = []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # skip crc (not verified: tolerant reader)
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1)
        off += stride + 1
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up — fully vectorized
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 1:  # Sub — sequential in pixel units
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (int(line[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, ch)
    if color_type == 0:
        return px[:, :, 0]
    if color_type == 4:  # gray + alpha → gray
        return px[:, :, 0]
    if color_type == 6:  # RGBA → RGB
        return px[:, :, :3]
    return px
