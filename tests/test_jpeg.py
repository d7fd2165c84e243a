"""Pure-Python baseline JPEG codec (io/jpeg.py) — round-trip fidelity,
hand-built wire fixtures the encoder never emits (4:2:0, restart
markers), dispatch, and declared-unsupported paths."""

import struct

import numpy as np
import pytest

from geobuf_ray.io import jpeg as J
from geobuf_ray.io.images import decode_image, psnr


def _smooth(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = rng.uniform(0.03, 0.15, 2)
    return np.stack([
        (127.5 + 127.5 * np.sin(fx * xx + fy * yy)).clip(0, 255),
        (127.5 + 127.5 * np.cos(fy * xx - fx * yy)).clip(0, 255),
        ((xx * 2 + yy) % 256),
    ], -1).astype(np.uint8)


def test_roundtrip_color_quality_ladder():
    img = _smooth(96, 120)
    prev_size = None
    for q, floor in ((95, 42), (90, 38), (75, 33)):
        b = J.encode_jpeg(img, quality=q)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        d = J.decode_jpeg(b)
        assert d.shape == img.shape
        assert psnr(img, d) >= floor
        if prev_size is not None:
            assert len(b) < prev_size  # lower quality -> smaller file
        prev_size = len(b)


def test_roundtrip_grayscale_and_odd_dims():
    g = _smooth(61, 77)[:, :, 0]
    d = J.decode_jpeg(J.encode_jpeg(g, quality=92))
    assert d.shape == (61, 77, 3)
    assert psnr(np.stack([g, g, g], -1), d) >= 42
    # all three output channels identical for a grayscale scan
    assert (d[..., 0] == d[..., 1]).all() and (d[..., 1] == d[..., 2]).all()


def test_constant_image_exact():
    """A flat image whose DC quantizes without remainder round-trips
    EXACTLY (per-channel gray: no chroma, no AC, no rounding)."""
    g = np.full((16, 24), 136, np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(g, quality=50))  # q0 = 16 at 50
    assert (d[..., 0] == 136).all()


def test_decode_image_dispatch_soi():
    img = _smooth(40, 40, seed=3)
    b = J.encode_jpeg(img, quality=95)
    d = decode_image(b)
    assert d.shape == img.shape and psnr(img, d) >= 40


def _std_tables_bytes(ncomp):
    out = bytearray()
    for tc, th, bits, vals in (
            (0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS),
            (1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS),
            (0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
            (1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS))[: 2 * ncomp]:
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)) + bytes([(tc << 4) | th]) \
            + bytes(bits) + bytes(vals)
    return bytes(out)


def _dc_only_bits(codes_tab, diffs):
    """(code, len) stream for DC-only blocks: DC symbol + bits + EOB
    per block, using table pairs (dc_codes, ac_codes) per entry."""
    codes, lens = [], []
    for (dc_codes, ac_codes), diff in diffs:
        mag = abs(diff)
        size = int(mag).bit_length()
        c, ln = dc_codes[size]
        codes.append(c)
        lens.append(ln)
        if size:
            codes.append(diff if diff >= 0 else diff + (1 << size) - 1)
            lens.append(size)
        c, ln = ac_codes[0x00]  # EOB
        codes.append(c)
        lens.append(ln)
    return J._pack_bits(np.array(codes, np.int64),
                        np.array(lens, np.int64))


def test_hand_built_420_dc_only():
    """A hand-assembled 16x16 4:2:0 JPEG (one MCU: 4 Y + Cb + Cr,
    DC-only) decodes to the analytic pixel values — exercises the
    subsampled-MCU walk and chroma upsampling the 4:4:4 encoder never
    produces.  Pixel law: value = DC * q0 / 8 + 128."""
    qtab = bytes([16] * 64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + qtab
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _std_tables_bytes(3)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    dc_l = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_l = J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dc_c = J._canonical_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
    ac_c = J._canonical_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)
    # Y DC absolutes [16, 8, -8, 0] -> diffs [16, -8, -16, 8];
    # Cb DC 4, Cr DC -4 (independent predictors)
    stream = _dc_only_bits(None, [
        ((dc_l, ac_l), 16), ((dc_l, ac_l), -8),
        ((dc_l, ac_l), -16), ((dc_l, ac_l), 8),
        ((dc_c, ac_c), 4), ((dc_c, ac_c), -4)])
    out += stream + b"\xff\xd9"

    d = J.decode_jpeg(bytes(out))
    assert d.shape == (16, 16, 3)
    # expected planes: Y quadrants 2*DC+128, chroma constant upsampled
    y = np.zeros((16, 16))
    for (qy, qx), dc in (((0, 0), 16), ((0, 1), 8),
                         ((1, 0), -8), ((1, 1), 0)):
        y[qy * 8:(qy + 1) * 8, qx * 8:(qx + 1) * 8] = 2 * dc + 128
    cb = np.full((16, 16), 2 * 4 + 128.0)
    cr = np.full((16, 16), 2 * -4 + 128.0)
    want = J._ycbcr_to_rgb(y, cb, cr)
    assert (d == want).all()


def test_hand_built_restart_markers():
    """Grayscale 8x24 with DRI=1: three 1-MCU entropy segments split
    by RST0/RST1, each padded independently, DC predictor reset per
    segment (absolute values re-encoded from 0)."""
    qtab = bytes([16] * 64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 24, 1)
    out += bytes([1, 0x11, 0])
    out += _std_tables_bytes(1)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00]) + b"\x00\x3f\x00"
    dc_l = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_l = J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    # three MCUs with DC absolutes 8, -8, 16: with per-segment
    # predictor reset each diff IS the absolute value
    segs = [_dc_only_bits(None, [((dc_l, ac_l), v)])
            for v in (8, -8, 16)]
    out += segs[0] + b"\xff\xd0" + segs[1] + b"\xff\xd1" + segs[2]
    out += b"\xff\xd9"

    d = J.decode_jpeg(bytes(out))
    assert d.shape == (8, 24, 3)
    assert (d[:, 0:8, 0] == 2 * 8 + 128).all()
    assert (d[:, 8:16, 0] == -2 * 8 + 128).all()
    assert (d[:, 16:24, 0] == 2 * 16 + 128).all()


def test_progressive_raises_not_implemented():
    img = _smooth(16, 16, seed=5)
    b = bytearray(J.encode_jpeg(img, quality=90))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(b))


def test_corrupt_input_raises():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01\x02\x03")
    img = _smooth(16, 16, seed=6)
    b = J.encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        J.decode_jpeg(b[: len(b) // 3])  # cut before SOS completes


def test_byte_stuffing_survives_ff_rich_streams():
    """Images whose entropy stream is dense in 0xFF bytes round-trip
    (stuff/unstuff correctness)."""
    rng = np.random.default_rng(9)
    for seed in range(5):
        img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
        d = J.decode_jpeg(J.encode_jpeg(img, quality=97))
        assert d.shape == img.shape
        assert psnr(img, d) >= 24  # noise is JPEG-hostile; shape law only


def test_jpeg_hypothesis_shape_and_fidelity_sweep():
    """Property sweep: random dims (1..40 per side), gray/color,
    random quality — decode(encode(x)) always returns the input shape
    as uint8 RGB, and a CONSTANT image round-trips near-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40),
           st.integers(1, 100), st.booleans(), st.integers(0, 255))
    def run(h, w, q, gray, val):
        if gray:
            img = np.full((h, w), val, np.uint8)
        else:
            img = np.full((h, w, 3), val, np.uint8)
        d = J.decode_jpeg(J.encode_jpeg(img, quality=q))
        assert d.shape == (h, w, 3) and d.dtype == np.uint8
        # flat images survive any quality to within the DC quantum
        ref = img if not gray else img[..., None].repeat(3, -1)
        assert int(np.abs(d.astype(np.int16)
                          - ref.astype(np.int16)).max()) <= 16

    run()


def test_wav_hypothesis_pcm16_exactness_sweep():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geobuf_ray.io import wav as W

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 5000), st.integers(1, 10),
           st.sampled_from([8000, 16000, 44100]))
    def run(n, seed, rate):
        rng = np.random.default_rng(seed)
        s = rng.uniform(-1, 1, n).astype(np.float32)
        d, r = W.decode_wav(W.encode_wav(s, rate))
        assert r == rate and len(d) == n
        p0 = np.clip(np.round(s.astype(np.float64) * 32767.0),
                     -32768, 32767).astype(np.int16)
        p1 = np.round(d.astype(np.float64) * 32767.0).astype(np.int16)
        assert (p0 == p1).all()

    run()
