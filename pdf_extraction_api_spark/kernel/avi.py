"""Minimal pure-stdlib AVI (RIFF) codec for uncompressed RGB video.

Like kernel/png.py, this exists because no video libraries ship in
this container, but the AVI RIFF container with BI_RGB (uncompressed)
frames is plain struct packing (public spec: MSDN "AVI RIFF File
Reference" / OpenDML). Scope:

- `encode(frames, fps)` — list of (H,W,3) uint8 RGB arrays → AVI bytes
  ('RIFF..AVI ' + hdrl(avih, strl(strh, strf=BITMAPINFOHEADER)) +
  movi('00db' BI_RGB frames: bottom-up rows, BGR, 4-byte stride pad)
  + idx1).
- `decode(data)` — AVI bytes → (fps, [frames]); reads dims from avih,
  fps from strh rate/scale, frames from '00db'/'00dc' chunks (BI_RGB
  only — compressed fourccs raise).

Real-world uncompressed AVIs (e.g. ffmpeg -c:v rawvideo -pix_fmt
bgr24) follow exactly this layout, so the decoder is not paired to
the encoder; round-trip plus structure tests live in
tests/test_videoops.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad(b: bytes) -> bytes:
    return b + (b"\x00" if len(b) % 2 else b"")


def _chunk(tag: bytes, data: bytes) -> bytes:
    return tag + struct.pack("<I", len(data)) + _pad(data)


def _list(tag: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", tag + data)


def _frame_bytes(frame: "np.ndarray") -> bytes:
    """RGB (H,W,3) → DIB pixel data: bottom-up, BGR, stride % 4 == 0."""
    h, w = frame.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB→BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def encode(frames: list, fps: int = 10) -> bytes:
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h
    n = len(frames)
    avih = _chunk(b"avih", struct.pack(
        "<14I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        frame_size * fps,   # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        0x10,               # dwFlags: AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0))
    strh = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,             # dwScale / dwRate → fps
        0, n, frame_size, 0xFFFFFFFF, 0, 0, 0, w, h))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,    # BITMAPINFOHEADER, 24bpp
        0,                  # BI_RGB
        frame_size, 0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_items = b"".join(
        _chunk(b"00db", _frame_bytes(f)) for f in frames)
    movi = _list(b"movi", movi_items)
    # idx1: one entry per frame (offset relative to movi list tag+4)
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack(
            "<4sIII", b"00db", 0x10, off, frame_size))
        off += 8 + frame_size + (frame_size % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode(data: bytes):
    """AVI bytes → (fps, [RGB (H,W,3) uint8 frames]). BI_RGB only."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    w = h = None
    rate = scale = None
    frames: list = []

    def walk(pos: int, end: int):
        nonlocal w, h, rate, scale
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + size)
            elif tag == b"avih":
                vals = struct.unpack(
                    "<14I", data[body_start:body_start + 56])
                w, h = vals[8], vals[9]
            elif tag == b"strh":
                fcc = data[body_start:body_start + 4]
                if fcc == b"vids":
                    handler = data[body_start + 4:body_start + 8]
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00",
                                       b"RGB ", b"raw "):
                        raise ValueError(
                            f"compressed video unsupported: {handler!r}")
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20:body_start + 28])
            elif tag in (b"00db", b"00dc"):
                frames.append(data[body_start:body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    if w is None or not frames:
        raise ValueError("truncated AVI (no avih/frames)")
    stride = (w * 3 + 3) & ~3
    out = []
    for raw in frames:
        if len(raw) < stride * h:
            raise ValueError("truncated frame")
        rows = np.frombuffer(raw, dtype=np.uint8,
                             count=stride * h).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        out.append(bgr[::-1, :, ::-1].copy())  # bottom-up→top, BGR→RGB
    fps = (rate // scale) if rate and scale else 0
    return fps, out
