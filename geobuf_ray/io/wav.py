"""Pure-Python WAV codec (public RIFF/WAVE wire format + ITU-T G.711
mu-law — numpy + stdlib only, no audio library).

The real-container counterpart of the images' PNG/JPEG codecs for the
audio path: ``encode_wav`` writes canonical 44-byte-header PCM WAV
(16-bit, format 1) or G.711 mu-law WAV (8-bit, format 7, with the
required ``fact`` chunk); ``decode_wav`` parses the RIFF chunk walk
and accepts 8/16/24/32-bit PCM, 32-bit float (format 3) and mu-law,
mono or interleaved multi-channel (channel 0 is returned — pinned).
WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its SubFormat GUID.
Anything else raises a clearly-marked NotImplementedError.

G.711 mu-law here is the REAL segmented codec (bias 0x84, 8 segments,
sign-magnitude) — not the smooth companding formula the internal
``ulawz`` payload uses — validated against the spec's analytic
round-trip bounds in tests.
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84
_CLIP = 32635


def mulaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 -> G.711 mu-law bytes (vectorized segmented encoder)."""
    x = np.clip(pcm16.astype(np.int32), -_CLIP, _CLIP)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.abs(x) + _BIAS
    # segment = position of the highest set bit above bit 7 (0..7)
    seg = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    mantissa = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mantissa)).astype(np.uint8)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> int16 (vectorized)."""
    u = (~np.asarray(u, np.uint8)).astype(np.int32) & 0xFF
    sign = u & 0x80
    seg = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + _BIAS) << seg
    mag -= _BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int,
               fmt: str = "pcm16") -> bytes:
    """float32/float64 samples in [-1, 1] (mono) -> WAV bytes.

    ``fmt``: ``pcm16`` (canonical 16-bit PCM) or ``mulaw`` (G.711)."""
    s = np.asarray(samples)
    if s.ndim != 1:
        raise ValueError("encode_wav expects a mono 1-D sample array")
    pcm = np.clip(np.round(s.astype(np.float64) * 32767.0),
                  -32768, 32767).astype("<i2")
    if fmt == "pcm16":
        body = pcm.tobytes()
        fmt_chunk = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        chunks = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                  + b"data" + struct.pack("<I", len(body)) + body)
    elif fmt == "mulaw":
        body = mulaw_encode(pcm).tobytes()
        fmt_chunk = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
        fact = struct.pack("<I", len(body))
        chunks = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                  + b"fact" + struct.pack("<I", 4) + fact
                  + b"data" + struct.pack("<I", len(body)) + body)
    else:
        raise ValueError(f"unsupported encode fmt {fmt!r}")
    if len(chunks) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1], sample_rate).

    Multi-channel input returns channel 0 (pinned)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    n = len(data)
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8: pos + 8 + clen]
        if tag == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            code, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if code == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if clen < 40:
                    raise ValueError("short extensible fmt chunk")
                (code,) = struct.unpack_from("<H", body, 24)
            fmt = (int(code), int(ch), int(rate), int(bits))
        elif tag == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)  # word alignment
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    code, ch, rate, bits = fmt
    if code == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
        elif bits == 8:  # unsigned
            x = (np.frombuffer(raw, np.uint8).astype(np.float32)
                 - 128.0) / 127.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            v = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            v = (v << 8) >> 8  # sign-extend 24 -> 32
            x = v.astype(np.float32) / 8388607.0
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483647.0
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV")
    elif code == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(raw, "<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(raw, "<f8").astype(np.float32)
        else:
            raise NotImplementedError(f"{bits}-bit float WAV")
    elif code == 7:  # G.711 mu-law
        x = mulaw_decode(np.frombuffer(raw, np.uint8)) \
            .astype(np.float32) / 32767.0
    else:
        raise NotImplementedError(
            f"WAV format code {code} (ADPCM/A-law/... not supported)")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch)[:, 0].copy()
    return x, rate
