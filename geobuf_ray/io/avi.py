"""Pure-Python MJPEG-in-AVI container codec (public RIFF AVI 1.0
layout — stdlib only; frame payloads are io/jpeg.py baseline JPEGs).

Completes the media-container trio (PNG/JPEG for images, RIFF/WAVE
for audio): a video clip ships as one real ``RIFF 'AVI '`` stream —
``LIST hdrl`` (``avih`` main header + one ``LIST strl`` with a
``vids``/``MJPG`` ``strh`` and a BITMAPINFOHEADER ``strf``),
``LIST movi`` holding one word-aligned ``00dc`` chunk per JPEG frame,
and an ``idx1`` index (offsets relative to the ``movi`` fourcc, the
AVI 1.0 convention).  The decoder walks chunks (using ``idx1`` when
present, else the sequential ``movi`` walk), so streams from either
convention read back.  OpenDML/AVI 2.0 extensions are out of scope
and unknown top-level forms raise.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _ck(tag: bytes, payload: bytes) -> bytes:
    out = tag + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"
    return out


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _ck(b"LIST", fourcc + payload)


def encode_avi_mjpeg(frames: list[bytes], w: int, h: int,
                     fps: int = 10) -> bytes:
    """JPEG frame payloads -> one MJPEG AVI byte stream."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame payload is not a JPEG (no SOI)")
    n = len(frames)
    maxbytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # microseconds per frame
        maxbytes * fps,          # max bytes/sec (informative)
        0,                       # padding granularity
        _AVIF_HASINDEX,
        n, 0,                    # total frames, initial frames
        1,                       # streams
        maxbytes,                # suggested buffer
        w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                  # scale, rate -> fps
        0, n,                    # start, length (frames)
        maxbytes, 10_000, 0,     # sugg. buffer, quality, sample size
        0, 0, w, h)              # rcFrame
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _ck(b"avih", avih)
                 + _list(b"strl", _ck(b"strh", strh)
                         + _ck(b"strf", strf)))
    movi_parts = []
    offsets = []
    pos = 4  # offsets are relative to the 'movi' fourcc
    for f in frames:
        offsets.append(pos)
        chunk = _ck(b"00dc", f)
        movi_parts.append(chunk)
        pos += len(chunk)
    movi = _list(b"movi", b"".join(movi_parts))
    idx = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, len(f))
        for off, f in zip(offsets, frames))
    body = b"AVI " + hdrl + movi + _ck(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _movi_walk(data: bytes, lo: int, hi: int):
    """Yield video-frame payloads from a movi body (handles the
    optional nested 'rec ' grouping lists)."""
    p = lo
    while p + 8 <= hi:
        tag = data[p:p + 4]
        (clen,) = struct.unpack_from("<I", data, p + 4)
        if tag[2:4] in (b"dc", b"db"):
            yield data[p + 8:p + 8 + clen]
        elif tag == b"LIST":
            yield from _movi_walk(data, p + 12,
                                  min(p + 8 + clen, hi))
        p += 8 + clen + (clen & 1)


def decode_avi_mjpeg(data: bytes):
    """AVI bytes -> (jpeg frame payload list, fps, width, height)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    pos = 12
    n = len(data)
    fps = 0
    w = h = 0
    movi_start = None
    idx_raw = None
    seq_frames: list[bytes] = []

    def walk(lo: int, hi: int, depth: int = 0):
        nonlocal fps, w, h, movi_start, idx_raw
        p = lo
        while p + 8 <= hi:
            tag = data[p:p + 4]
            (clen,) = struct.unpack_from("<I", data, p + 4)
            body_lo = p + 8
            body_hi = min(body_lo + clen, hi)
            if tag == b"LIST":
                fourcc = data[body_lo:body_lo + 4]
                if fourcc == b"movi":
                    movi_start = body_lo  # points at the fourcc
                    for f in _movi_walk(data, body_lo + 4, body_hi):
                        seq_frames.append(f)
                else:
                    walk(body_lo + 4, body_hi, depth + 1)
            elif tag == b"strh" and data[body_lo:body_lo + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", data,
                                                 body_lo + 20)
                fps = rate // max(scale, 1)
                w, h = struct.unpack_from("<HH", data, body_lo + 52)
            elif tag == b"idx1":
                idx_raw = data[body_lo:body_hi]
            p = body_lo + clen + (clen & 1)

    walk(pos, n)
    frames = seq_frames
    if idx_raw is not None and movi_start is not None:
        # authoritative when present; offsets relative to the movi
        # fourcc (AVI 1.0) OR absolute (some writers) — sniff once
        ix = []
        for o in range(0, len(idx_raw) - 15, 16):
            ckid = idx_raw[o:o + 4]
            _flags, off, sz = struct.unpack_from("<III", idx_raw, o + 4)
            if ckid[2:4] in (b"dc", b"db"):
                ix.append((off, sz))
        if ix:
            base = movi_start
            first_off = ix[0][0]
            if data[base + first_off:base + first_off + 4][2:4] \
                    not in (b"dc", b"db"):
                base = 0  # absolute-offset writer
            got = []
            ok = True
            for off, sz in ix:
                cpos = base + off
                if data[cpos + 2:cpos + 4] not in (b"dc", b"db"):
                    ok = False
                    break
                got.append(data[cpos + 8:cpos + 8 + sz])
            if ok and got:
                frames = got
    if not frames:
        raise ValueError("AVI stream holds no video frames")
    return frames, fps, int(w), int(h)
