"""Areal interpolation: rect-overlay join with exact integer
intersection areas.

The classic GIS "areal interpolation / dasymetric" step — transfer a
value known on one polygon layer (zones) onto another layer (targets)
weighted by overlap area — specialized to axis-aligned integer
rectangles so every weight is EXACT int64 arithmetic (floats never
decide; the SQL twin's GREATEST/LEAST products are bit-identical).

Distributed shape: both layers fan their rects to the grid cells they
cover (half-open [w, e) x [s, n) integer domain), one
:func:`~geobuf_ray.functions.exchange.hash_cogroup` co-groups equal
cell hashes, and each intersecting pair is generated ONLY in the cell
containing its reference point ``(max(w_t, w_z), max(s_t, s_z))`` —
the SW corner of the intersection, which lies in exactly one cell
that both fan-outs provably contain — so exactly-once needs no dedup
shuffle (the same rule as ``bbox_intersection_join`` /
``segment_intersect_join``, here over the integer grid).  The reduce
emits per-target PARTIAL sums (value x area, area), so only skinny
aggregate rows leave the exchange; the final combine is
|targets-with-overlap| x |buckets| bounded.

Cell sizing: a rect covers ``O(extent / 2^cell_bits)`` cells per
axis; candidate matching inside a cell is a sorted-w searchsorted
window, so pick ``cell_bits`` near the typical rect size (the
grid-join regime note on ``segment_intersect_join`` applies
unchanged).  Coordinates must satisfy ``|v| < 2^40`` (enforced) so
the in-cell composite search key stays overflow-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["rect_areal_weights", "rect_union_area"]

_COORD_BOUND = np.int64(1) << 40
_SHIFT = np.int64(1) << 42


def _fan_rects(batch: pa.Table, cols: tuple[str, str, str, str],
               keep: list[str], cell_bits: int, nbuckets: int
               ) -> tuple[np.ndarray, pa.Table]:
    """Fan each half-open integer rect to every covered grid cell.
    Returns (bucket id per fanned row, fanned table carrying
    ``__cell``)."""
    from ..codec.varint import ramp

    w, s, e, n = (batch[c].to_numpy(zero_copy_only=False) for c in cols)
    for v, c in zip((w, s, e, n), cols):
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(f"rect_areal_weights needs integer coords, "
                            f"got {v.dtype} in {c!r}")
    w, s, e, n = (v.astype(np.int64) for v in (w, s, e, n))
    if np.any(e <= w) or np.any(n <= s):
        raise ValueError("degenerate rect: need w < e and s < n "
                         "(half-open [w,e) x [s,n))")
    if max((np.abs(v).max(initial=0) for v in (w, s, e, n))) \
            >= _COORD_BOUND:
        raise ValueError("rect coords must satisfy |v| < 2^40")
    cx0, cx1 = w >> cell_bits, (e - 1) >> cell_bits
    cy0, cy1 = s >> cell_bits, (n - 1) >> cell_bits
    nx = cx1 - cx0 + 1
    cnt = nx * (cy1 - cy0 + 1)
    rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), cnt)
    k = ramp(cnt)                      # 0..cnt-1 within each rect
    nxr = np.repeat(nx, cnt)
    cx = np.repeat(cx0, cnt) + k % nxr
    cy = np.repeat(cy0, cnt) + k // nxr
    cell = (cx << np.int64(32)) | (cy & np.int64(0xFFFFFFFF))
    taken = batch.select(keep).take(pa.array(rows, pa.int64()))
    bucket = ((cell % nbuckets) + nbuckets) % nbuckets
    return bucket, taken.append_column("__cell", pa.array(cell))


def rect_areal_weights(targets, zones, *, cell_bits: int,
                       target_cols: tuple[str, str, str, str],
                       zone_cols: tuple[str, str, str, str],
                       target_id: str = "id", zone_value: str = "value",
                       nbuckets: int = 32, **map_kwargs):
    """Per-target exact overlap-weighted sums over a zone layer:
    ``val_area = sum_z value_z * area(target & z)`` and
    ``inter_area = sum_z area(target & z)`` (consumer divides for the
    area-weighted mean; keeping the quotient out keeps the result
    integer-exact and partition-invariant).  Inner semantics: targets
    with no overlapping zone emit nothing.

    Returns a Ray Dataset of per-bucket PARTIAL rows
    ``(target_id, val_area, inter_area)`` — one row per target per
    bucket it overlaps zones in; finish with a tiny grouped sum
    (``_final_combine`` shape).
    """
    from ..functions.exchange import hash_cogroup

    tb = int(cell_bits)
    tw, ts, te, tn = target_cols
    zw, zs, ze, zn = zone_cols

    def t_fn(batch: pa.Table):
        return _fan_rects(batch, target_cols, [target_id, *target_cols],
                          tb, nbuckets)

    def z_fn(batch: pa.Table):
        return _fan_rects(batch, zone_cols, [zone_value, *zone_cols],
                          tb, nbuckets)

    empty = pa.table({target_id: pa.array([], pa.int64()),
                      "val_area": pa.array([], pa.int64()),
                      "inter_area": pa.array([], pa.int64())})

    def reduce_fn(ltbl: pa.Table, rtbl: pa.Table) -> pa.Table:
        if ltbl.num_rows == 0 or rtbl.num_rows == 0:
            return empty
        lcell = ltbl["__cell"].to_numpy(zero_copy_only=False)
        rcell = rtbl["__cell"].to_numpy(zero_copy_only=False)
        lw, ls, le, ln = (ltbl[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in (tw, ts, te, tn))
        rw, rs, re_, rn = (rtbl[c].to_numpy(zero_copy_only=False)
                           .astype(np.int64) for c in (zw, zs, ze, zn))
        tid = ltbl[target_id].to_numpy(zero_copy_only=False)
        zval = rtbl[zone_value].to_numpy(zero_copy_only=False
                                         ).astype(np.int64)
        # zones sorted by (cell, w): per target the candidate zones of
        # its cell with z.w < t.e are one contiguous window
        zsel = np.lexsort((rw, rcell))
        rcell_s, rw_s = rcell[zsel], rw[zsel]
        lo = np.searchsorted(rcell_s, lcell, "left")
        hi0 = np.searchsorted(rcell_s, lcell, "right")
        # two-key (cell, w) searchsorted via a dense-rank composite
        crank = np.cumsum(np.concatenate(
            ([0], (rcell_s[1:] != rcell_s[:-1]).astype(np.int64))))
        ucell = rcell_s[np.concatenate(
            ([True], rcell_s[1:] != rcell_s[:-1]))] \
            if len(rcell_s) else rcell_s
        comp = crank * _SHIFT + (rw_s + (_SHIFT >> 1))
        lrank = np.searchsorted(ucell, lcell)
        lcomp = lrank.astype(np.int64) * _SHIFT + (le + (_SHIFT >> 1))
        hi = np.clip(np.searchsorted(comp, lcomp, "left"), lo, hi0)
        cnt = hi - lo
        from ..codec.varint import ramp

        ti = np.repeat(np.arange(len(lcell), dtype=np.int64), cnt)
        zi = zsel[np.repeat(lo, cnt) + ramp(cnt)]
        # overlap + reference-point-in-this-cell filter (exactly once)
        ww = np.maximum(lw[ti], rw[zi])
        ss = np.maximum(ls[ti], rs[zi])
        ee = np.minimum(le[ti], re_[zi])
        nn = np.minimum(ln[ti], rn[zi])
        refcell = ((ww >> tb) << np.int64(32)) | ((ss >> tb)
                                                  & np.int64(0xFFFFFFFF))
        ok = (ww < ee) & (ss < nn) & (refcell == lcell[ti])
        ti, zi = ti[ok], zi[ok]
        if len(ti) == 0:
            return empty
        area = (ee[ok] - ww[ok]) * (nn[ok] - ss[ok])
        ut, inv = np.unique(tid[ti], return_inverse=True)
        val_area = np.zeros(len(ut), np.int64)
        np.add.at(val_area, inv, zval[zi] * area)   # exact int64 sums
        inter = np.zeros(len(ut), np.int64)
        np.add.at(inter, inv, area)
        return pa.table({target_id: pa.array(ut),
                         "val_area": pa.array(val_area),
                         "inter_area": pa.array(inter)})

    return hash_cogroup(targets, zones, nbuckets=nbuckets,
                        left_bucket_fn=t_fn, right_bucket_fn=z_fn,
                        reduce_fn=reduce_fn, **map_kwargs,
                        left_schema=None, right_schema=None)


def rect_union_area(ds, *, group: str, cols: tuple[str, str, str, str],
                    nbuckets: int = 32, **map_kwargs):
    """Exact union area of axis-aligned integer rects per group
    (ST_Union + ST_Area for the rect family — double-counted overlap
    removed, not a sum of areas).  One hash exchange on ``group``;
    per bucket the classic coordinate-compression sweep, fully
    vectorized ACROSS groups:

    1. distinct x-edges per group -> elementary strips (composite
       (group-rank, x) searchsorted, no per-group loop),
    2. each rect fans to the strips it covers (ragged repeat),
    3. covered y-length per strip = interval union via one lexsort +
       an ascending-band segmented running max (previous strips'
       bands are strictly smaller, so one global ``maximum.accumulate``
       never leaks across strips),
    4. area = sum(covered * strip_width) per group (bincount).

    Coordinates must satisfy ``|v| < 2^30`` (the segment-join bound)
    so band offsets stay overflow-free.  Returns a Dataset of
    ``(group, union_area)`` — one row per group (each group lives in
    exactly one bucket)."""
    from ..functions.exchange import hash_exchange

    wq, sq, eq, nq = cols
    bound = np.int64(1) << 30

    def kernel(tbl: pa.Table) -> pa.Table:
        gname = group
        empty = pa.table({gname: pa.array([], pa.int64()),
                          "union_area": pa.array([], pa.int64())})
        if tbl.num_rows == 0:
            return empty
        g = tbl[gname].to_numpy(zero_copy_only=False).astype(np.int64)
        w, s, e, n = (tbl[c].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for c in (wq, sq, eq, nq))
        if np.any(e <= w) or np.any(n <= s):
            raise ValueError("degenerate rect: need w < e and s < n")
        if max(np.abs(v).max(initial=0) for v in (w, s, e, n)) >= bound:
            raise ValueError("rect coords must satisfy |v| < 2^30")
        ug, gcode = np.unique(g, return_inverse=True)
        # 1. distinct (group, x) edges -> global strip table
        # (x offset to non-negative so the composite decodes exactly)
        off = np.int64(1) << 30
        ex_g = np.concatenate([gcode, gcode])
        ex_x = np.concatenate([w, e]) + off
        comp = ex_g * (np.int64(4) << 30) + ex_x
        ucomp = np.unique(comp)
        strip_g = ucomp // (np.int64(4) << 30)
        strip_x = ucomp - strip_g * (np.int64(4) << 30) - off
        # strip i spans [strip_x[i], strip_x[i+1]) while same group;
        # the LAST edge of each group heads no strip (width ignored)
        width = np.empty(len(ucomp), np.int64)
        width[:-1] = strip_x[1:] - strip_x[:-1]
        width[-1] = 0
        last = np.concatenate((strip_g[1:] != strip_g[:-1], [True]))
        width[last] = 0
        # 2. fan rects to covered strips [pos(w), pos(e))
        lo = np.searchsorted(ucomp, gcode * (np.int64(4) << 30) + w + off)
        hi = np.searchsorted(ucomp, gcode * (np.int64(4) << 30) + e + off)
        cnt = hi - lo
        from ..codec.varint import ramp

        rid = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), cnt)
        sid = np.repeat(lo, cnt) + ramp(cnt)
        a, b = s[rid], n[rid]
        # 3. per-strip interval union: lexsort + ascending-band cummax
        sel = np.lexsort((b, a, sid))
        sid_s, a_s, b_s = sid[sel], a[sel], b[sel]
        new_strip = np.concatenate(([True], sid_s[1:] != sid_s[:-1]))
        srank = np.cumsum(new_strip) - 1
        band = srank * (np.int64(4) << 30)
        run_max = np.maximum.accumulate(b_s + band) - band
        prev_max = np.empty_like(run_max)
        prev_max[1:] = run_max[:-1]
        new_isl = new_strip.copy()
        new_isl[1:] |= a_s[1:] > prev_max[1:]
        isl_start = np.flatnonzero(new_isl)
        isl_end = np.append(isl_start[1:], len(sid_s)) - 1
        cov_len = run_max[isl_end] - a_s[isl_start]
        isl_strip = sid_s[isl_start]
        covered = np.zeros(len(ucomp), np.int64)
        np.add.at(covered, isl_strip, cov_len)
        # 4. per-group area
        area = np.zeros(len(ug), np.int64)
        np.add.at(area, strip_g, covered * width)
        return pa.table({gname: pa.array(ug),
                         "union_area": pa.array(area)})

    return hash_exchange(ds, nbuckets=nbuckets, on=group,
                         reduce_fn=kernel, schema=None, **map_kwargs)


def kernel_interpolate(targets, sources, *, radius: int, cell_bits: int,
                       target_cols: tuple[str, str] = ("x", "y"),
                       source_cols: tuple[str, str] = ("x", "y"),
                       target_id: str = "id", source_value: str = "value",
                       nbuckets: int = 32, **map_kwargs):
    """Kernel-weighted spatial interpolation with an EXACT integer
    kernel: per target point, ``num = sum_s v_s * (R^2 - d^2)`` and
    ``den = sum_s (R^2 - d^2)`` over sources with squared distance
    ``d^2 < R^2`` (the quadratic Epanechnikov-family weight — chosen
    over 1/d^2 IDW precisely because it keeps every term int64, so
    results are bit-exact, partition-invariant and SQL-twinnable;
    consumer divides).  Targets with no source in range emit nothing.

    Distributed shape: each source fans to every grid cell its radius
    square touches; each target stays in its home cell, where every
    in-range source provably appears — pairs meet exactly once, per-
    target sums complete in ONE bucket, nothing to re-combine.  Pick
    ``cell_bits`` near ``log2(radius)`` (a source then fans to ~4-9
    cells)."""
    from ..codec.varint import ramp
    from ..functions.exchange import hash_cogroup

    tb = int(cell_bits)
    R = np.int64(radius)
    if R <= 0:
        raise ValueError("radius must be positive")
    if R >= (np.int64(1) << 30):
        raise ValueError("radius must satisfy R < 2^30")
    txc, tyc = target_cols
    sxc, syc = source_cols

    def _ints(batch, cols):
        vals = []
        for c in cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            if not np.issubdtype(v.dtype, np.integer):
                raise TypeError(f"kernel_interpolate needs integer "
                                f"coords, got {v.dtype} in {c!r}")
            v = v.astype(np.int64)
            if np.abs(v).max(initial=0) >= (np.int64(1) << 30):
                raise ValueError("coords must satisfy |v| < 2^30")
            vals.append(v)
        return vals

    def t_fn(batch: pa.Table):
        x, y = _ints(batch, (txc, tyc))
        cell = ((x >> tb) << np.int64(32)) | ((y >> tb)
                                              & np.int64(0xFFFFFFFF))
        tbl = batch.select([target_id, txc, tyc]).append_column(
            "__cell", pa.array(cell))
        return ((cell % nbuckets) + nbuckets) % nbuckets, tbl

    def s_fn(batch: pa.Table):
        x, y = _ints(batch, (sxc, syc))
        cx0, cx1 = (x - R) >> tb, (x + R) >> tb
        cy0, cy1 = (y - R) >> tb, (y + R) >> tb
        nx = cx1 - cx0 + 1
        cnt = nx * (cy1 - cy0 + 1)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), cnt)
        k = ramp(cnt)
        nxr = np.repeat(nx, cnt)
        cx = np.repeat(cx0, cnt) + k % nxr
        cy = np.repeat(cy0, cnt) + k // nxr
        cell = (cx << np.int64(32)) | (cy & np.int64(0xFFFFFFFF))
        tbl = batch.select([source_value, sxc, syc]).take(
            pa.array(rows, pa.int64())).append_column(
            "__cell", pa.array(cell))
        return ((cell % nbuckets) + nbuckets) % nbuckets, tbl

    empty = pa.table({target_id: pa.array([], pa.int64()),
                      "num": pa.array([], pa.int64()),
                      "den": pa.array([], pa.int64())})

    def reduce_fn(ltbl: pa.Table, rtbl: pa.Table) -> pa.Table:
        if ltbl.num_rows == 0 or rtbl.num_rows == 0:
            return empty
        lcell = ltbl["__cell"].to_numpy(zero_copy_only=False)
        rcell = rtbl["__cell"].to_numpy(zero_copy_only=False)
        tx = ltbl[txc].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = ltbl[tyc].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = rtbl[sxc].to_numpy(zero_copy_only=False).astype(np.int64)
        sy = rtbl[syc].to_numpy(zero_copy_only=False).astype(np.int64)
        tid = ltbl[target_id].to_numpy(zero_copy_only=False)
        sval = rtbl[source_value].to_numpy(zero_copy_only=False
                                           ).astype(np.int64)
        zsel = np.lexsort((sx, rcell))
        rcell_s, sx_s = rcell[zsel], sx[zsel]
        # window: sources of the same cell with sx in [tx-R, tx+R]
        crank = np.cumsum(np.concatenate(
            ([0], (rcell_s[1:] != rcell_s[:-1]).astype(np.int64))))
        ucell = rcell_s[np.concatenate(
            ([True], rcell_s[1:] != rcell_s[:-1]))]
        comp = crank * _SHIFT + (sx_s + (_SHIFT >> 1))
        lrank = np.searchsorted(ucell, lcell).astype(np.int64)
        lo0 = np.searchsorted(rcell_s, lcell, "left")
        hi0 = np.searchsorted(rcell_s, lcell, "right")
        lo = np.clip(np.searchsorted(
            comp, lrank * _SHIFT + (tx - R + (_SHIFT >> 1)), "left"),
            lo0, hi0)
        hi = np.clip(np.searchsorted(
            comp, lrank * _SHIFT + (tx + R + (_SHIFT >> 1)), "right"),
            lo0, hi0)
        cnt = hi - lo
        ti = np.repeat(np.arange(len(lcell), dtype=np.int64), cnt)
        si = zsel[np.repeat(lo, cnt) + ramp(cnt)]
        dx = tx[ti] - sx[si]
        dy = ty[ti] - sy[si]
        d2 = dx * dx + dy * dy
        wgt = R * R - d2
        ok = wgt > 0
        ti, si, wgt = ti[ok], si[ok], wgt[ok]
        if len(ti) == 0:
            return empty
        ut, inv = np.unique(tid[ti], return_inverse=True)
        num = np.zeros(len(ut), np.int64)
        np.add.at(num, inv, sval[si] * wgt)
        den = np.zeros(len(ut), np.int64)
        np.add.at(den, inv, wgt)
        return pa.table({target_id: pa.array(ut), "num": pa.array(num),
                         "den": pa.array(den)})

    return hash_cogroup(targets, sources, nbuckets=nbuckets,
                        left_bucket_fn=t_fn, right_bucket_fn=s_fn,
                        reduce_fn=reduce_fn, **map_kwargs)
