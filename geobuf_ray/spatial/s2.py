"""S2 cell index, from scratch, vectorized (north_rule: "H3/S2 index").

Implements the public S2 geometry cell scheme (documented in the
s2geometry project's papers and docs): lat/lng -> unit sphere -> cube
face (6 faces) -> (u,v) central projection -> quadratic s,t transform
-> 30-level quadtree position along a Hilbert space-filling curve ->
64-bit cell id ``face(3) | curve_position(2*level) | 1``.

Everything here is numpy-vectorized over coordinate arrays: the Hilbert
encode/decode walks 8 lookup-table gathers (4 bits per step), the rest
is arithmetic.  Nothing is copied from any S2 implementation — the wire
layout and curve orientation rules are re-derived from the public
specification, and self-consistency is what our tests + the join
equivalence oracles check (cell ids are an internal partitioning key,
not an exchange format).

Why S2 cells as a partition key (vs the slippy tiles in
``spatial/tiles.py``): cells are near-equal-area on the sphere (no
polar blowup), every cell has one int64 id whose PREFIX encodes every
ancestor — so "all points inside this region" is a handful of
contiguous id ranges (``cell_range``), which makes range pruning and
hierarchical covers cheap.  The engine uses fixed-level cells for
shuffle keys and the range property for pruning.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2

# Hilbert curve sub-cell traversal: for each orientation, the order in
# which the 4 (i,j) sub-cells are visited, and the orientation change
# each visit applies (public S2 curve definition).
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # canonical
    [0, 2, 3, 1],   # axes swapped
    [3, 2, 0, 1],   # bits inverted
    [3, 1, 0, 2],   # swapped + inverted
], np.int64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], np.int64)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """4-bit-per-axis lookup tables: (ij<<2|orient) -> (pos<<2|orient)
    and its inverse, built by walking the curve recursion 4 levels."""
    lookup_pos = np.zeros(1 << 12, np.int64)
    lookup_ij = np.zeros(1 << 12, np.int64)

    def rec(level, i, j, orig_orient, pos, orient):
        if level == 4:
            ij = (i << 4) | j
            lookup_pos[(ij << 2) | orig_orient] = (pos << 2) | orient
            lookup_ij[(pos << 2) | orig_orient] = (ij << 2) | orient
            return
        r = _POS_TO_IJ[orient]
        for sub in range(4):
            rec(level + 1, (i << 1) | (int(r[sub]) >> 1),
                (j << 1) | (int(r[sub]) & 1), orig_orient,
                (pos << 2) | sub, orient ^ int(_POS_TO_ORIENT[sub]))

    for orient in range(4):
        rec(0, 0, 0, orient, 0, orient)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------


def lonlat_to_face_uv(lon: np.ndarray, lat: np.ndarray):
    """(face, u, v) arrays for degree inputs (vectorized)."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    cp = np.cos(phi)
    x = cp * np.cos(lam)
    y = cp * np.sin(lam)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest-axis face selection; face = axis, +3 when negative
    axis = np.where(az >= np.maximum(ax, ay), 2, np.where(ay >= ax, 1, 0))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    # u,v per face (central projection onto the face plane)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate((
        (lambda: y, lambda: z, lambda: x),            # face 0: +x
        (lambda: -x, lambda: z, lambda: y),           # face 1: +y
        (lambda: -x, lambda: -y, lambda: z),          # face 2: +z
        (lambda: z, lambda: y, lambda: -x),           # face 3: -x
        (lambda: z, lambda: -x, lambda: -y),          # face 4: -y
        (lambda: -y, lambda: -x, lambda: -z),         # face 5: -z
    )):
        m = face == f
        if m.any():
            d = de()[m]
            u[m] = ue()[m] / d
            v[m] = ve()[m] / d
    return face, u, v


def face_uv_to_lonlat(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Inverse of :func:`lonlat_to_face_uv` (degrees)."""
    one = np.ones_like(u)
    # the forward projection divides by the POSITIVE -x/-y/-z on the
    # negative faces, so u,v keep the source component signs there
    xyz = {
        0: (one, u, v),
        1: (-u, one, v),
        2: (-u, -v, one),
        3: (-one, v, u),       # face 3: -x dominant; u=z, v=y
        4: (-v, -one, u),      # face 4: -y dominant; u=z, v=-x
        5: (-v, -u, -one),     # face 5: -z dominant; u=-y, v=-x
    }
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    face = np.asarray(face)
    for f, (xe, ye, ze) in xyz.items():
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xe[m], ye[m], ze[m]
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection: equalizes cell area across a face."""
    # maximum(..., 0): np.where evaluates both branches
    return np.where(u >= 0, 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64),
                   0, (1 << MAX_LEVEL) - 1)


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id
# ---------------------------------------------------------------------------


def face_ij_to_id(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                  level: int = MAX_LEVEL) -> np.ndarray:
    """64-bit cell id at ``level`` for leaf-resolution (i, j)."""
    face = np.asarray(face, np.int64)
    n = face.astype(np.uint64) << np.uint64(60)
    bits = face & _SWAP  # initial orientation per the curve spec
    for k in range(7, -1, -1):
        mask = (1 << 4) - 1
        idx = (bits
               + (((i >> (k * 4)) & mask) << (4 + 2))
               + (((j >> (k * 4)) & mask) << 2))
        out = _LOOKUP_POS[idx]
        n |= (out >> 2).astype(np.uint64) << np.uint64(k * 8)
        bits = out & (_SWAP | _INVERT)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level == MAX_LEVEL:
        return leaf
    return parent(leaf, level)


def id_to_face_ij(ids: np.ndarray):
    """(face, i, j, orientation) of the LEAF position encoded in the
    id (for a non-leaf cell this is a leaf inside it near its min
    corner after masking — callers mask to the cell's ij block)."""
    ids = np.asarray(ids, np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    pos = (ids & np.uint64((1 << 61) - 1)) >> np.uint64(1)
    bits = face & _SWAP
    i = np.zeros(len(ids), np.int64)
    j = np.zeros(len(ids), np.int64)
    for k in range(7, -1, -1):
        nbits = (pos >> np.uint64(k * 8)) & np.uint64(0xFF)
        idx = bits + (nbits.astype(np.int64) << 2)
        out = _LOOKUP_IJ[idx]
        ij = out >> 2
        i |= (ij >> 4) << (k * 4)
        j |= (ij & 0xF) << (k * 4)
        bits = out & (_SWAP | _INVERT)
    return face, i, j, bits


def s2_cell_id(lon: np.ndarray, lat: np.ndarray,
               level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized lon/lat (degrees) -> uint64 cell id at ``level``."""
    face, u, v = lonlat_to_face_uv(np.asarray(lon, np.float64),
                                   np.asarray(lat, np.float64))
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return face_ij_to_id(face, i, j, level)


# ---------------------------------------------------------------------------
# id arithmetic (the prefix/range property)
# ---------------------------------------------------------------------------


def lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def cell_level(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    # level = 30 - (trailing zeros / 2)
    tz = np.zeros(len(ids), np.int64)
    x = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (x & np.uint64((1 << shift) - 1)) == 0
        big = x == 0
        step = np.where(m & ~big, shift, 0)
        tz += step
        x = np.where(m & ~big, x >> np.uint64(shift), x)
    return MAX_LEVEL - tz // 2


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    ids = np.asarray(ids, np.uint64)
    nl = lsb_for_level(level)
    return (ids & (~nl + np.uint64(1))) | nl


def children(ids: np.ndarray) -> np.ndarray:
    """(n, 4) child ids one level down."""
    ids = np.asarray(ids, np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    nl = lsb >> np.uint64(2)
    offs = np.array([-3, -1, 1, 3], np.int64)
    return (ids[:, None].view(np.int64)
            + offs[None, :] * nl[:, None].view(np.int64)).view(np.uint64)


def cell_range(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of leaf ids under each cell — the prefix
    pruning primitive: descendant iff min <= leaf <= max."""
    ids = np.asarray(ids, np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return ids - (lsb - np.uint64(1)), ids + (lsb - np.uint64(1))


# ---------------------------------------------------------------------------
# cell -> lat/lng bounds (analytic, exact over the cell's uv box)
# ---------------------------------------------------------------------------


def cell_bounds(ids: np.ndarray, level: int):
    """(west, south, east, north, full_lng) per cell at ``level``.

    Exact analytic extremes of lat/lng over the cell's uv box (a cell
    IS a box in uv space), so the bound is tight — not the
    vertex+padding approximation.  ``full_lng`` marks polar-face cells
    containing the pole (all longitudes).  ``west > east`` encodes an
    antimeridian-crossing interval.
    """
    ids = np.asarray(ids, np.uint64)
    face, i, j, _ = id_to_face_ij(ids)
    size = np.int64(1) << np.int64(MAX_LEVEL - level)
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    return face_ij_bounds(face, i0, j0, size)


def face_ij_bounds(face: np.ndarray, i0: np.ndarray, j0: np.ndarray,
                   size):
    """(west, south, east, north, full_lng) of the ij-space cell box
    ``[i0, i0+size) x [j0, j0+size)`` on each face — the bound math of
    :func:`cell_bounds` without the id decode (BFS covers carry ij)."""
    u0 = _st_to_uv(i0 / float(1 << MAX_LEVEL))
    u1 = _st_to_uv((i0 + size) / float(1 << MAX_LEVEL))
    v0 = _st_to_uv(j0 / float(1 << MAX_LEVEL))
    v1 = _st_to_uv((j0 + size) / float(1 << MAX_LEVEL))

    n = len(face)
    west = np.empty(n)
    east = np.empty(n)
    south = np.empty(n)
    north = np.empty(n)
    full = np.zeros(n, bool)

    for f in range(6):
        m = face == f
        if not m.any():
            continue
        a0, a1 = u0[m], u1[m]
        b0, b1 = v0[m], v1[m]
        if f in (0, 1, 3, 4):
            # equatorial faces: one uv axis maps to lng as
            # center + atan(axis) exactly, the other to lat as
            # atan(axis / sqrt(1 + lng_axis^2)).  Which axis is which
            # follows from this module's face -> xyz conventions:
            # faces 0,1 take lng from +u and lat from +v; faces 3,4
            # take lng from -v and lat from +u (the cube edges rotate).
            if f in (0, 1):
                center = 0.0 if f == 0 else 90.0
                la0, la1 = a0, a1          # lng axis interval
                ta0, ta1 = b0, b1          # lat axis interval
            else:
                center = 180.0 if f == 3 else -90.0
                la0, la1 = -b1, -b0
                ta0, ta1 = a0, a1
            lo = center + np.degrees(np.arctan(la0))
            hi = center + np.degrees(np.arctan(la1))
            # normalize to [-180, 180]; face 3 spans the antimeridian
            lo = np.where(lo > 180.0, lo - 360.0, lo)
            hi = np.where(hi > 180.0, hi - 360.0, hi)
            west[m], east[m] = lo, hi
            spans0 = (la0 <= 0) & (la1 >= 0)
            mn_abs = np.where(spans0, 0.0,
                              np.minimum(np.abs(la0), np.abs(la1)))
            mx_abs = np.maximum(np.abs(la0), np.abs(la1))
            den_near = np.sqrt(1.0 + mn_abs * mn_abs)
            den_far = np.sqrt(1.0 + mx_abs * mx_abs)
            south[m] = np.degrees(np.arctan(
                np.where(ta0 >= 0, ta0 / den_far, ta0 / den_near)))
            north[m] = np.degrees(np.arctan(
                np.where(ta1 >= 0, ta1 / den_near, ta1 / den_far)))
        else:
            # polar faces: direction angle in the uv plane IS lng (up
            # to the face's axis mapping); radius r sets |lat|
            # face 2 (+z): xyz = (-u, -v, 1);  face 5 (-z): (v, u, -1)
            spans_u = (a0 <= 0) & (a1 >= 0)
            spans_v = (b0 <= 0) & (b1 >= 0)
            rmin2 = (np.where(spans_u, 0.0, np.minimum(a0 * a0, a1 * a1))
                     + np.where(spans_v, 0.0, np.minimum(b0 * b0, b1 * b1)))
            rmax2 = np.maximum(a0 * a0, a1 * a1) + np.maximum(b0 * b0, b1 * b1)
            lat_hi = np.degrees(np.arctan2(1.0, np.sqrt(rmin2)))
            lat_lo = np.degrees(np.arctan2(1.0, np.sqrt(rmax2)))
            if f == 2:
                south[m], north[m] = lat_lo, lat_hi
            else:
                south[m], north[m] = -lat_hi, -lat_lo
            # lng: corner angles; box containing the origin sees all
            contains0 = spans_u & spans_v
            if f == 2:
                ang = np.stack([np.arctan2(-bb, -aa) for aa, bb in
                                ((a0, b0), (a0, b1), (a1, b0), (a1, b1))])
            else:  # face 5: xyz = (-v, -u, -1) -> lng = atan2(-u, -v)
                ang = np.stack([np.arctan2(-aa, -bb) for aa, bb in
                                ((a0, b0), (a0, b1), (a1, b0), (a1, b1))])
            ang = np.degrees(ang)
            # circular hull of 4 angles: sort, take complement of the
            # largest gap
            srt = np.sort(ang, axis=0)
            gaps = np.diff(np.vstack([srt, srt[:1] + 360.0]), axis=0)
            gi = np.argmax(gaps, axis=0)
            cols = np.arange(srt.shape[1])
            lo = srt[(gi + 1) % 4, cols]
            hi = srt[gi, cols]
            lo = np.where(lo > 180.0, lo - 360.0, lo)
            wv = np.where(contains0, -180.0, lo)
            ev = np.where(contains0, 180.0, hi)
            west[m], east[m] = wv, ev
            full[m] = contains0
    return west, south, east, north, full


def cover_rects(west, south, east, north, level: int,
                rect_ids: np.ndarray | None = None):
    """Covering cells at fixed ``level`` for lon/lat rectangles.

    BFS from the 6 faces, vectorized per level: a (rect, cell) pair
    survives iff the cell's analytic bound intersects the rect.  Output
    is EXACTLY the set of level-``level`` cells whose bound intersects
    each rect (a superset of truly-intersecting cells only by the
    bound's float rounding) — so a point-in-rect test after a cell
    co-group never misses.

    Returns ``(rect_index, cell_id)`` arrays (fan-out rows).
    """
    west = np.asarray(west, np.float64)
    south = np.asarray(south, np.float64)
    east = np.asarray(east, np.float64)
    north = np.asarray(north, np.float64)
    nr = len(west)
    if rect_ids is None:
        rect_ids = np.arange(nr, dtype=np.int64)
    # BFS in (face, i, j) space — no id decode per level; ids are
    # minted once at the end.  A cell whose exact bound lies fully
    # inside its rect descends WITHOUT further tests (the bound is the
    # exact hull, so every descendant's hull is inside too): tests run
    # only on O(perimeter) boundary cells, not O(area) interior ones.
    ridx = np.repeat(np.arange(nr, dtype=np.int64), 6)
    fface = np.tile(np.arange(6, dtype=np.int64), nr)
    fi = np.zeros(len(ridx), np.int64)
    fj = np.zeros(len(ridx), np.int64)
    inside = np.zeros(len(ridx), bool)
    for lvl in range(0, level + 1):
        if len(ridx) == 0:
            break
        size = np.int64(1) << np.int64(MAX_LEVEL - lvl)
        test = np.flatnonzero(~inside)
        if len(test):
            w, s, e, nn, fulll = face_ij_bounds(
                fface[test], fi[test], fj[test], size)
            rw, rs = west[ridx[test]], south[ridx[test]]
            re, rn = east[ridx[test]], north[ridx[test]]
            lat_ok = (nn >= rs) & (s <= rn)
            # wrap-aware lng interval intersection ([w>e] = crosses 180)
            wraps = w > e
            lng_ok = np.where(
                fulll, True,
                np.where(wraps, (rw <= e) | (re >= w),
                         (w <= re) & (e >= rw)))
            keep_t = lat_ok & lng_ok
            # containment: exact-hull bound inside the rect (wrapping /
            # full-lng cells stay conservative: keep testing them)
            contained = (keep_t & ~fulll & ~wraps
                         & (w >= rw) & (e <= re) & (s >= rs) & (nn <= rn))
            drop = test[~keep_t]
            inside[test[contained]] = True
            if len(drop):
                keep_mask = np.ones(len(ridx), bool)
                keep_mask[drop] = False
                ridx, fface = ridx[keep_mask], fface[keep_mask]
                fi, fj = fi[keep_mask], fj[keep_mask]
                inside = inside[keep_mask]
        if lvl < level:
            h = np.int64(1) << np.int64(MAX_LEVEL - lvl - 1)
            n0 = len(ridx)
            ridx = np.repeat(ridx, 4)
            fface = np.repeat(fface, 4)
            inside = np.repeat(inside, 4)
            di = np.tile(np.array([0, 0, 1, 1], np.int64), n0)
            dj = np.tile(np.array([0, 1, 0, 1], np.int64), n0)
            fi = np.repeat(fi, 4) + di * h
            fj = np.repeat(fj, 4) + dj * h
    return rect_ids[ridx], face_ij_to_id(fface, fi, fj, level)
