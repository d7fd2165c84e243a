"""Space-filling-curve keys: Z-order (Morton) and geohash.

Both are data-layout primitives, not queries: computing the key is a
pure per-batch map (no shuffle), and SORTING or range-partitioning by
the key co-locates spatially-near rows so downstream range reads prune
(the lakehouse ``OPTIMIZE ZORDER BY`` pattern).  The bit math is
integer-exact end-to-end, so keys hash-check against the same
expressions written in SQL.

These complement the reference's tile addressing (splitcombine/
split_combine.go:336 LazyFeatureTileID keys features by slippy tile;
studied, not copied) with order-preserving 1-D keys: quantization is
the plain linear grid ``qx = floor((lon + 180) / 360 * 2^bits)``
clamped to ``[0, 2^bits)``, same for lat over 90.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz",
                           dtype=np.uint8)


def _spread_bits16(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of each value
    (uint64 in, uint64 out) — the classic magic-number spread."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def quantize_lonlat(lon: np.ndarray, lat: np.ndarray, bits: int):
    """Linear lon/lat -> integer grid coordinates in [0, 2^bits)."""
    n = np.int64(1) << np.int64(bits)
    qx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    qy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    return np.clip(qx, 0, n - 1), np.clip(qy, 0, n - 1)


def morton_key(lon: np.ndarray, lat: np.ndarray, *, bits: int = 16
               ) -> np.ndarray:
    """Z-order key: interleaved (qx, qy) bits, x in the even positions.
    ``bits`` <= 16 (32-bit key, fits int64 exactly — SQL-reproducible)."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    qx, qy = quantize_lonlat(np.asarray(lon, np.float64),
                             np.asarray(lat, np.float64), bits)
    key = _spread_bits16(qx.astype(np.uint64)) | \
        (_spread_bits16(qy.astype(np.uint64)) << np.uint64(1))
    return key.astype(np.int64)


def geohash_key(lon: np.ndarray, lat: np.ndarray, *, precision: int = 6
                ) -> np.ndarray:
    """Standard geohash strings (base32, lon bit first).  ``precision``
    characters = ``5 * precision`` interleaved bits.  Exact integer
    math throughout — reproducible in SQL as nested substring lookups
    over the same Morton-style spread."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    nbits = 5 * precision
    xbits = (nbits + 1) // 2   # lon takes the even (first) positions
    ybits = nbits // 2
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    nx = np.int64(1) << np.int64(xbits)
    ny = np.int64(1) << np.int64(ybits)
    qx = np.clip(np.floor((lon + 180.0) / 360.0 * nx).astype(np.int64),
                 0, nx - 1).astype(np.uint64)
    qy = np.clip(np.floor((lat + 90.0) / 180.0 * ny).astype(np.int64),
                 0, ny - 1).astype(np.uint64)
    # interleave with lon first: lon bit i sits at position 2i from the
    # TOP of the nbits-bit code
    code = np.zeros(len(lon), np.uint64)
    for i in range(xbits):
        bit = (qx >> np.uint64(xbits - 1 - i)) & np.uint64(1)
        code |= bit << np.uint64(nbits - 1 - 2 * i)
    for i in range(ybits):
        bit = (qy >> np.uint64(ybits - 1 - i)) & np.uint64(1)
        code |= bit << np.uint64(nbits - 2 - 2 * i)
    # 5 bits per character, most significant first
    chars = np.empty((len(lon), precision), np.uint8)
    for c in range(precision):
        idx = (code >> np.uint64(5 * (precision - 1 - c))) & np.uint64(31)
        chars[:, c] = _GEOHASH32[idx.astype(np.int64)]
    flat = chars.reshape(-1).tobytes()
    return pa.Array.from_buffers(
        pa.string(), len(lon),
        [None,
         pa.py_buffer(np.arange(0, (len(lon) + 1) * precision, precision,
                                dtype=np.int32).tobytes()),
         pa.py_buffer(flat)])


def zorder_sort(ds, lon_col: str, lat_col: str, *, bits: int = 16,
                key_col: str = "zkey", descending: bool = False):
    """Cluster a dataset by Z-order: stamp the Morton key per batch
    (pure map) and range-sort on it — after this, each output block
    covers a compact spatial extent, so bbox readers prune blocks.
    The one distributed sort IS the point of the operator (layout
    jobs run rarely, reads benefit forever)."""
    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return batch
        key = morton_key(batch[lon_col].to_numpy(zero_copy_only=False),
                         batch[lat_col].to_numpy(zero_copy_only=False),
                         bits=bits)
        return batch.append_column(key_col, pa.array(key))

    return ds.map_batches(stamp, batch_format="pyarrow",
                          zero_copy_batch=True).sort(key_col,
                                                     descending=descending)


def zorder_build(ds, out_dir: str, *, lon_col: str = "lon",
                 lat_col: str = "lat", bucket_bits: int = 8,
                 **map_kwargs) -> str:
    """Write the ``zbucket``-partitioned parquet layout — the SPATIAL
    twin of the IVF vector index and the inverted text index: one hive
    directory per Z-order bucket (the Morton cell at resolution
    ``bucket_bits / 2`` per axis), so a bbox query READS only the
    buckets its rectangle touches.  Build once, query many times."""
    if bucket_bits % 2 or not 2 <= bucket_bits <= 32:
        raise ValueError("bucket_bits must be even, in [2, 32]")
    b = bucket_bits // 2

    def stamp(batch: pa.Table) -> pa.Table:
        key = morton_key(batch[lon_col].to_numpy(),
                         batch[lat_col].to_numpy(), bits=b)
        return batch.append_column("zbucket", pa.array(key))

    stamped = ds.map_batches(stamp, batch_format="pyarrow",
                             zero_copy_batch=True, **map_kwargs)
    stamped.write_parquet(out_dir, partition_cols=["zbucket"])
    return out_dir


def zorder_bbox_buckets(west: float, south: float, east: float,
                        north: float, *, bucket_bits: int = 8
                        ) -> np.ndarray:
    """Bucket ids whose Morton cell intersects the bbox (the exact
    prune set: quantization is floor-monotone, so every point inside
    the bbox quantizes into one of these cells)."""
    b = bucket_bits // 2
    qx, qy = quantize_lonlat(np.array([west, east]),
                             np.array([south, north]), b)
    xs = np.arange(qx[0], qx[1] + 1, dtype=np.int64)
    ys = np.arange(qy[0], qy[1] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    key = _spread_bits16(gx.reshape(-1).astype(np.uint64)) | \
        (_spread_bits16(gy.reshape(-1).astype(np.uint64)) << np.uint64(1))
    return np.sort(key.astype(np.int64))


def zorder_bbox_lookup(index_dir: str, west: float, south: float,
                       east: float, north: float, *,
                       lon_col: str = "lon", lat_col: str = "lat",
                       bucket_bits: int = 8, columns=None):
    """Partition-pruned bbox query over a :func:`zorder_build` layout:
    reads ONLY the touched buckets' files, then one exact inclusive
    bbox refine (SQL ``BETWEEN`` semantics)."""
    import glob
    import os

    import ray

    paths = []
    for c in zorder_bbox_buckets(west, south, east, north,
                                 bucket_bits=bucket_bits):
        p = os.path.join(index_dir, f"zbucket={int(c)}")
        if os.path.isdir(p):
            paths.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
    if not paths:
        paths = []  # empty read below still needs a schema-less guard
    cols = columns if columns is None else list(
        dict.fromkeys(list(columns) + [lon_col, lat_col]))
    if not paths:
        import pyarrow as _pa

        return ray.data.from_arrow(_pa.table({}))
    ds = ray.data.read_parquet(paths, columns=cols)

    def refine(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy()
        lat = batch[lat_col].to_numpy()
        keep = (lon >= west) & (lon <= east) & \
               (lat >= south) & (lat <= north)
        out = batch.filter(pa.array(keep))
        return out.select(columns) if columns is not None else out

    return ds.map_batches(refine, batch_format="pyarrow",
                          zero_copy_batch=True)


def hilbert_d(qx: np.ndarray, qy: np.ndarray, *, bits: int) -> np.ndarray:
    """Hilbert-curve index of integer grid cells (the classic xy2d
    bit walk, vectorized): better locality than Morton — EVERY pair
    of consecutive indices is an edge-adjacent cell pair (|dx|+|dy| =
    1, the property the pytest proves for the whole grid), where
    Z-order jumps across quadrant seams.  Exact integer ops
    (flip = n-1-v, swap, quadrant digit (3*rx) XOR ry), so the walk
    is reproducible as a recursive CTE in SQL.  ``bits`` <= 15
    (d < 2^30, int64-exact)."""
    if not 1 <= bits <= 15:
        raise ValueError("bits must be in [1, 15]")
    n = np.int64(1) << np.int64(bits)
    x = qx.astype(np.int64).copy()
    y = qy.astype(np.int64).copy()
    d = np.zeros(len(x), np.int64)
    s = int(n) >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        m = ry == 0
        fl = m & (rx == 1)
        x = np.where(fl, n - 1 - x, x)
        y = np.where(fl, n - 1 - y, y)
        x, y = np.where(m, y, x), np.where(m, x, y)
        s >>= 1
    return d


def hilbert_key(lon: np.ndarray, lat: np.ndarray, *, bits: int = 8
                ) -> np.ndarray:
    """Hilbert layout key for lon/lat points: the same linear
    quantization as :func:`morton_key`, then the Hilbert bit walk —
    the lakehouse ``OPTIMIZE`` layout with strictly better range
    locality than Z-order."""
    qx, qy = quantize_lonlat(np.asarray(lon, np.float64),
                             np.asarray(lat, np.float64), bits)
    return hilbert_d(qx, qy, bits=bits)
