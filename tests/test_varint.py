"""Varint / zigzag kernel tests.

Boundary values mirror the reference's primitive equivalence test
(``geobuf_raw/write_primitives_test.go:24-34``: two packers must agree
byte-for-byte on 128^k edge constants) — here checked against Python's
own scalar encoder and a protobuf-by-hand oracle.
"""

import numpy as np
import pytest

from geobuf_ray.codec import varint as vi

# 128^k +- 1 ladder plus the literals from write_primitives_test.go
BOUNDARY = sorted(
    {0, 1, 127, 128, 129, 16383, 16384, 2097151, 2097152, 268435455,
     268435456, 34359738367, 34359738368, 4398046511103, 4398046511104,
     562949953421311, 562949953421312,
     258435456, 33359738368, 4298046511104, 542949953421312,
     592949953421312, 2**63 - 1, 2**63, 2**64 - 1}
)


def oracle_varint(x: int) -> bytes:
    out = bytearray()
    while x > 127:
        out.append(0x80 | (x & 0x7F))
        x >>= 7
    out.append(x)
    return bytes(out)


def test_varint_encode_boundary_bytes():
    vals = np.array(BOUNDARY, dtype=np.uint64)
    flat, lens = vi.varint_encode(vals)
    expected = b"".join(oracle_varint(v) for v in BOUNDARY)
    assert flat.tobytes() == expected
    assert lens.tolist() == [len(oracle_varint(v)) for v in BOUNDARY]


def test_varint_decode_roundtrip():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**63, 10000, dtype=np.uint64)
    vals[:100] = rng.integers(0, 128, 100)  # plenty of 1-byte values
    vals = np.concatenate([vals, np.array(BOUNDARY, np.uint64)])
    flat, lens = vi.varint_encode(vals)
    out, offs = vi.varint_decode_stream(flat)
    assert np.array_equal(out, vals)
    assert np.array_equal(offs, np.concatenate(([0], np.cumsum(lens)[:-1])))


def test_zigzag_roundtrip():
    vals = np.array(
        [0, -1, 1, -2, 2, 2**62, -(2**62), 2**63 - 1, -(2**63)], np.int64
    )
    enc = vi.zigzag_encode(vals)
    assert enc[:5].tolist() == [0, 1, 2, 3, 4]
    assert np.array_equal(vi.zigzag_decode(enc), vals)


def test_zigzag_matches_reference_paramenc():
    # paramEnc (geom.go:182-184): uint64((v << 1) ^ (v >> 63))
    def param_enc(v):
        return ((v << 1) ^ (v >> 63)) & (2**64 - 1)

    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**62), 2**62, 1000, dtype=np.int64)
    enc = vi.zigzag_encode(vals)
    for v, e in zip(vals.tolist(), enc.tolist()):
        assert e == param_enc(v)


def test_scalar_varint_helpers():
    for v in BOUNDARY:
        b = vi.encode_varint_scalar(v)
        assert b == oracle_varint(v)
        out, pos = vi.decode_varint_scalar(b, 0)
        assert out == v and pos == len(b)


def test_ramp_and_rowwise_concat():
    assert vi.ramp(np.array([3, 0, 2])).tolist() == [0, 1, 2, 0, 1]
    seg_a = (np.frombuffer(b"abcde", np.uint8), np.array([2, 0, 3]))
    seg_b = (np.frombuffer(b"XY", np.uint8), np.array([1, 1, 0]))
    flat, lens = vi.rowwise_concat([seg_a, seg_b])
    assert flat.tobytes() == b"abXYcde"
    assert lens.tolist() == [3, 1, 3]


def test_segmented_cumsum():
    vals = np.array([1, 2, 3, 10, -1, 5], np.int64)
    mask = np.array([1, 0, 0, 1, 0, 1], bool)
    out = vi.segmented_cumsum(vals, mask)
    assert out.tolist() == [1, 3, 6, 10, 9, 5]
