"""Vectorized slippy-map tile math (Web-Mercator XYZ scheme).

The reference delegates tile math to ``murphy214/mercantile`` and
``murphy214/tilecover`` (used at ``splitcombine/split_combine.go:
47-49,246-257,390-394``).  Formulas here are the public OSM slippy-map
equations, implemented batch-at-a-time over numpy arrays.

A tile is (z, x, y).  We pack tiles into a single uint64 key
``(z << 58) | (x << 29) | y`` (29 bits each side supports z<=28,
well past slippy's practical max) so tile keys are cheap groupby /
shuffle keys; ``tile_key_str`` renders the reference's "x-y-z" style
keys for display (the reference keys subfiles by ``m.Tilestr(tileid)``).
"""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112877980659  # Web-Mercator clamp


def lonlat_to_tile(lon, lat, zoom: int):
    """Vectorized lon/lat -> (x, y) tile indices at ``zoom``."""
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -MAX_LAT, MAX_LAT)
    n = 1 << zoom
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    y = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi)
        / 2.0 * n
    ).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def tile_bounds(x, y, zoom: int):
    """Vectorized tile -> (west, south, east, north) degrees."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = float(1 << zoom)
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    return west, south, east, north


def pack(z, x, y) -> np.ndarray:
    """(z,x,y) -> uint64 tile key."""
    z = np.asarray(z, np.uint64)
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    return (z << np.uint64(58)) | (x << np.uint64(29)) | y


def unpack(key):
    k = np.asarray(key, np.uint64)
    z = (k >> np.uint64(58)).astype(np.int64)
    x = ((k >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    y = (k & np.uint64((1 << 29) - 1)).astype(np.int64)
    return z, x, y


def parent(key, parent_zoom=None):
    """Ancestor tile key (one level up, or at ``parent_zoom``) —
    the reference's ``m.Parent`` walk (split_combine.go:390-394)."""
    z, x, y = unpack(key)
    pz = z - 1 if parent_zoom is None else np.asarray(parent_zoom, np.int64)
    shift = (z - pz).astype(np.uint64)
    return pack(pz, np.asarray(x, np.uint64) >> shift, np.asarray(y, np.uint64) >> shift)


def tile_key_str(key) -> list[str]:
    """Render packed keys as "x-y-z" strings (mercantile Tilestr form)."""
    z, x, y = unpack(key)
    return [f"{a}-{b}-{c}" for a, b, c in zip(x.tolist(), y.tolist(), z.tolist())]


def bbox_tile_cover(west, south, east, north, zoom: int):
    """Vectorized bbox -> covering tile ranges at ``zoom``.

    Returns ``(x0, x1, y0, y1)`` inclusive index ranges per row — the
    rectangular cover used to fan features out to tiles (the reference
    covers exact geometry via tilecover; we cover the bbox and refine
    with an exact intersection predicate downstream, which yields the
    same tile membership after clipping).
    """
    x0, y1 = lonlat_to_tile(west, south, zoom)   # south => larger y
    x1, y0 = lonlat_to_tile(east, north, zoom)
    return x0, x1, y0, y1


def bbox_cover_rows(bb, zoom: int):
    """Shared fan-out kernel: per-feature bboxes -> (row_idx, keys).

    ``bb`` is the (n, 4) [W,S,E,N] array from ``feature_bbox``; rows
    with ANY non-finite component are dropped (checking only W let
    NaN-latitude features land in garbage tiles).  One implementation
    for the tiling fan-out, the polygon index, and the shuffle PIP join
    — previously three diverging copies.
    """
    ok = np.isfinite(bb).all(axis=1)
    idx = np.flatnonzero(ok)
    x0, x1, y0, y1 = bbox_tile_cover(
        bb[idx, 0], bb[idx, 1], bb[idx, 2], bb[idx, 3], zoom)
    row_local, tx, ty = cover_expand(x0, x1, y0, y1)
    keys = pack(np.full(len(tx), zoom, np.int64), tx, ty)
    return idx[row_local], keys


def cover_expand(x0, x1, y0, y1):
    """Expand per-row inclusive tile ranges into (row_idx, x, y) arrays.

    Pure numpy fan-out: each input row i produces
    (x1-x0+1)*(y1-y0+1) output tiles.
    """
    nx = (x1 - x0 + 1).astype(np.int64)
    ny = (y1 - y0 + 1).astype(np.int64)
    per_row = nx * ny
    total = int(per_row.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy()
    row_idx = np.repeat(np.arange(len(per_row), dtype=np.int64), per_row)
    # position within each row's grid
    ends = np.cumsum(per_row)
    starts = ends - per_row
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, per_row)
    ny_r = np.repeat(ny, per_row)
    dx = pos // ny_r
    dy = pos % ny_r
    return row_idx, np.repeat(x0, per_row) + dx, np.repeat(y0, per_row) + dy


def k_ring(key, k: int = 1):
    """Neighbor tiles within Chebyshev distance k (boundary shuffle for
    kNN — SURVEY.md §2.5).  Returns (row_idx, neighbor_keys)."""
    z, x, y = unpack(key)
    n = len(np.atleast_1d(z))
    side = 2 * k + 1
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx = np.repeat(offs, side)
    dy = np.tile(offs, side)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), side * side)
    zz = np.repeat(np.atleast_1d(z), side * side)
    ntiles = np.int64(1) << zz.astype(np.int64)
    # x WRAPS across the antimeridian (x=0 and x=2^z-1 are
    # geographically adjacent); y clips at the poles.  Clipping x lost
    # true nearest neighbors near lon=±180 without any truncated flag.
    nx = (np.repeat(np.atleast_1d(x), side * side) + np.tile(dx, n)) % ntiles
    ny = np.clip(np.repeat(np.atleast_1d(y), side * side) + np.tile(dy, n),
                 0, ntiles - 1)
    return row_idx, pack(zz, nx, ny)


def size_grid(west, south, east, north, zoom: int) -> int:
    """Tile-count estimate of a bbox at zoom — ``GetSizeGrid``
    (split_combine.go:44-53), used for fan-out planning."""
    x0, x1, y0, y1 = bbox_tile_cover(
        np.float64(west), np.float64(south), np.float64(east), np.float64(north), zoom
    )
    return int((x1 - x0 + 1) * (y1 - y0 + 1))


def plan_zoom(west, south, east, north, target_zoom: int, max_grid: int = 750) -> int:
    """Walk zoom down until the grid fits ``max_grid`` — the reference's
    fd-budget planning (split_combine.go:440-448).  Ray's shuffle has no
    fd bound, but the planner is kept for parity and for choosing
    partition counts."""
    z = target_zoom
    while z > 0 and size_grid(west, south, east, north, z) > max_grid:
        z -= 1
    return z
