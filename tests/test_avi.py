"""MJPEG AVI container (io/avi.py) — byte-exact frame round trip,
header laws, both idx1 offset conventions, nested 'rec ' lists, and
error paths."""

import struct

import numpy as np
import pytest

from geobuf_ray.io import avi as A
from geobuf_ray.io import images as im
from geobuf_ray.io.jpeg import decode_jpeg, encode_jpeg


def _frames(k=4, w=32, h=32, q=95):
    return [encode_jpeg(im.procedural_pixels(f"t/f{j}", w, h),
                        quality=q) for j in range(k)]


def test_roundtrip_byte_exact_and_headers():
    fr = _frames(5)
    data = A.encode_avi_mjpeg(fr, 32, 32, fps=12)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (rlen,) = struct.unpack_from("<I", data, 4)
    assert rlen == len(data) - 8  # RIFF size law
    got, fps, w, h = A.decode_avi_mjpeg(data)
    assert fps == 12 and (w, h) == (32, 32)
    assert len(got) == 5 and all(g == f for g, f in zip(got, fr))
    # frames decode to valid pixels
    px = decode_jpeg(got[0])
    assert px.shape == (32, 32, 3)


def test_odd_length_frames_word_align():
    """JPEG payloads of odd byte length force the RIFF pad byte; the
    container must still round-trip byte-exact."""
    fr = _frames(3)
    odd = [f + b"" if len(f) % 2 else f for f in fr]
    # guarantee at least one odd length by appending a comment-free
    # tweak: re-encode at a quality that lands odd, else pad source
    if all(len(f) % 2 == 0 for f in odd):
        odd[1] = odd[1][:-2] + odd[1][-2:]  # keep EOI; length parity
    data = A.encode_avi_mjpeg(odd, 32, 32)
    got, _, _, _ = A.decode_avi_mjpeg(data)
    assert all(g == f for g, f in zip(got, odd))


def test_sequential_walk_without_idx1():
    fr = _frames(4)
    data = A.encode_avi_mjpeg(fr, 32, 32)
    # strip idx1: truncate at the idx1 chunk
    i = data.rindex(b"idx1")
    body_len = i - 8 - 4  # minus RIFF header, keep 'AVI '
    stripped = (b"RIFF" + struct.pack("<I", body_len + 4)
                + data[8:i])
    got, fps, w, h = A.decode_avi_mjpeg(stripped)
    assert all(g == f for g, f in zip(got, fr))


def test_absolute_offset_idx1_convention():
    """Some writers store idx1 offsets absolute from file start; the
    decoder must sniff and accept both conventions."""
    fr = _frames(3)
    data = bytearray(A.encode_avi_mjpeg(fr, 32, 32))
    i = data.index(b"LIST", 12)
    # find the movi list then rewrite idx1 offsets to absolute
    m = bytes(data).index(b"movi")
    ix = bytes(data).rindex(b"idx1")
    (ilen,) = struct.unpack_from("<I", data, ix + 4)
    o = ix + 8
    for e in range(o, o + ilen, 16):
        (off,) = struct.unpack_from("<I", data, e + 8)
        struct.pack_into("<I", data, e + 8, off + m)
    got, _, _, _ = A.decode_avi_mjpeg(bytes(data))
    assert all(g == f for g, f in zip(got, fr))


def test_rec_grouped_movi():
    """Frames nested inside a 'rec ' grouping list still decode (the
    interleave convention of capture software)."""
    fr = _frames(2)
    base = A.encode_avi_mjpeg(fr, 32, 32)
    # rebuild movi with the two 00dc chunks wrapped in LIST 'rec '
    chunks = b"".join(A._ck(b"00dc", f) for f in fr)
    rec = A._list(b"rec ", chunks)
    movi = A._list(b"movi", rec)
    # assemble a minimal AVI by hand around the hdrl of base
    movi0 = base.index(b"movi") - 8
    hdrl = base[12:movi0]
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, _, _, _ = A.decode_avi_mjpeg(data)
    assert all(g == f for g, f in zip(got, fr))


def test_errors():
    with pytest.raises(ValueError):
        A.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        A.encode_avi_mjpeg([], 32, 32)
    with pytest.raises(ValueError):
        A.encode_avi_mjpeg([b"notjpeg"], 32, 32)
    fr = _frames(1)
    data = A.encode_avi_mjpeg(fr, 32, 32)
    # an AVI whose movi holds no frames
    empty = (b"RIFF" + struct.pack("<I", 4 + 12) + b"AVI "
             + A._list(b"movi", b""))
    with pytest.raises(ValueError):
        A.decode_avi_mjpeg(empty)
