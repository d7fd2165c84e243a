"""Single-thread codec-vs-JSON microbench (BASELINE.md protocol).

20k x 32-vertex LineStrings with 4 properties; best-of-5 per side.
JSON side = ``json.dumps`` / ``json.loads`` per feature (the
line-delimited-GeoJSON shape the reference benchmarks against its
``encoding/json`` baseline, README.md:6,19); geobuf side = this
engine's vectorized batch kernels (``encode_batch``/``decode_batch``).
Single process, no Ray — this is the per-core codec constant that the
distributed stages multiply.

Usage: python tools/codec_vs_json.py [N] [V]
       python tools/codec_vs_json.py --concurrent [P] [N] [V]
Prints one JSON line with sizes, seconds, and speedups.

``--concurrent`` mirrors the reference's 18x READ protocol
(README.md:6 + geobuf_concurrent.go:23-33: goroutine-parallel feature
decode measured against the sequential ``encoding/json`` baseline):
the framed stream splits at frame boundaries across P worker
processes, each decoding its slice with the same batch kernels, while
the JSON side stays the single-thread loop the reference compares
against.  The default mode stays single-thread on BOTH sides — the
per-core codec constant (the reference's sequential "5-10x" class,
README.md:19).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from geobuf_ray.codec import decode, feature  # noqa: E402
from geobuf_ray.io.geojson_io import parse_features_batch  # noqa: E402

GEOM_COLS = {"id", "gtype", "geom_type", "dim", "coords",
             "ring_sizes", "poly_sizes"}


def build_features(n: int, v: int):
    rng = np.random.default_rng(7)
    feats = []
    for i in range(n):
        base = rng.uniform(-120, -60, 2)
        pts = base + np.cumsum(rng.uniform(-0.001, 0.001, (v, 2)), axis=0)
        feats.append({
            "type": "Feature",
            "geometry": {"type": "LineString",
                         "coordinates": np.round(pts, 7).tolist()},
            "properties": {"name": f"road-{i}", "lanes": int(i % 6),
                           "speed": float(30 + (i % 50)),
                           "oneway": bool(i % 2)},
        })
    return feats


def best_of(k, fn):
    best = float("inf")
    out = None
    for _ in range(k):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def _decode_slice(framed: bytes) -> int:
    from geobuf_ray.codec import decode, feature

    return decode.decode_batch(feature.scan_frames(framed)).num_rows


def run_concurrent(procs: int, n: int, v: int) -> None:
    """Concurrent-read protocol: P processes decode frame-aligned
    slices of ONE framed stream; JSON baseline stays single-thread."""
    import multiprocessing as mp

    feats = build_features(n, v)
    js = [json.dumps(f) for f in feats]
    json_read, _ = best_of(5, lambda: [json.loads(s) for s in js])

    tbl = parse_features_batch(js)
    prop_cols = [c for c in tbl.column_names if c not in GEOM_COLS]
    enc = feature.encode_batch(tbl, prop_cols=prop_cols)
    framed = feature.frame_records(enc)
    # frame-aligned slices (scan once for boundaries, split evenly)
    import numpy as np

    data = np.frombuffer(framed, np.uint8)
    starts, lens, _ = feature.frame_boundaries(data)
    # frame k begins where frame k-1's payload ends
    frame_begin = [0] + [int(starts[k - 1] + lens[k - 1])
                         for k in range(1, len(starts))]
    cuts = [0]
    for p in range(1, procs):
        cuts.append(frame_begin[(len(starts) * p) // procs])
    cuts.append(len(framed))
    slices = [framed[cuts[i]: cuts[i + 1]] for i in range(procs)]
    with mp.get_context("fork").Pool(procs) as pool:
        pool.map(_decode_slice, slices)  # warm the pool
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            counts = pool.map(_decode_slice, slices)
            best = min(best, time.perf_counter() - t0)
    assert sum(counts) == n, counts
    print(json.dumps({
        "mode": "concurrent", "procs": procs, "n": n, "vertices": v,
        "json_read_s": round(json_read, 3),
        "buf_read_concurrent_s": round(best, 3),
        "read_speedup_concurrent": round(json_read / best, 2),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--concurrent":
        procs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
        v = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        run_concurrent(procs, n, v)
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    feats = build_features(n, v)

    json_write, js = best_of(5, lambda: [json.dumps(f) for f in feats])
    json_read, _ = best_of(5, lambda: [json.loads(s) for s in js])
    json_size = sum(len(s) for s in js)

    tbl = parse_features_batch([json.dumps(f) for f in feats])
    prop_cols = [c for c in tbl.column_names if c not in GEOM_COLS]
    buf_write, enc = best_of(
        5, lambda: feature.encode_batch(tbl, prop_cols=prop_cols))
    # encode_batch returns a BinaryArray of per-feature frames
    buf_size = sum(len(b.as_py()) for b in enc)
    buf_read, dec = best_of(5, lambda: decode.decode_batch(enc))
    assert dec.num_rows == n

    print(json.dumps({
        "n": n, "vertices": v,
        "json_write_s": round(json_write, 3),
        "json_read_s": round(json_read, 3),
        "buf_write_s": round(buf_write, 3),
        "buf_read_s": round(buf_read, 3),
        "json_mb": round(json_size / 1e6, 2),
        "buf_mb": round(buf_size / 1e6, 2),
        "write_speedup": round(json_write / buf_write, 2),
        "read_speedup": round(json_read / buf_read, 2),
        "size_ratio": round(json_size / max(buf_size, 1), 2),
    }))


if __name__ == "__main__":
    main()
