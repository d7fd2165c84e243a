"""Vectorized WKB (Well-Known Binary) geometry codec.

WKB is the OGC interchange format PostGIS / GeoPandas / GDAL speak —
the interop surface a standalone engine needs next to its own geobuf
codec.  Layout (public spec, little-endian flavor): per geometry
``[byte order=0x01][uint32 type][payload]`` with type codes Point=1,
LineString=2, Polygon=3, MultiPoint=4, MultiLineString=5,
MultiPolygon=6 — the SAME enum as the geobuf reference's geomcode
(README.md:48-56), so the engine's ``geom_type`` column maps 1:1.
Collections carry full sub-WKB headers per member (the spec quirk that
makes MultiPoint 21 bytes per point, not 16).

Both directions are batch-vectorized over the engine's geometry
columns (``geom_type, dim, coords, ring_sizes, poly_sizes`` — the
exact ``decode_batch`` layout):

- encode: per-feature byte lengths are closed-form in the counts, so
  one buffer is allocated exactly; headers/counts scatter as uint8
  views of uint32 arrays, and every ring's doubles move with ONE
  ragged byte gather/scatter (coords are already a contiguous float64
  buffer).
- decode: fixed-offset fields read in one gather per type group;
  ragged structures (Polygon rings, MultiLineString lines, MultiPolygon
  polygons x rings) walk with a per-PART-index loop that is vectorized
  ACROSS features — loop depth is the maximum part count of one
  feature, never the feature count.

2-D only (``dim`` must be 2; WKB Z/M variants raise), little-endian
only (byte order 0 raises — producing BE WKB went out with big-endian
hardware).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GEOM_COLS = ("geom_type", "dim", "coords", "ring_sizes", "poly_sizes")


def _flat(tbl: pa.Table, name: str):
    col = tbl[name].combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    val = col.values.to_numpy(zero_copy_only=False)
    return off, val


def _ragged_copy(dst: np.ndarray, dst_start: np.ndarray,
                 src: np.ndarray, src_start: np.ndarray,
                 length: np.ndarray) -> None:
    """dst[dst_start[i] : +length[i]] = src[src_start[i] : +length[i]]
    for every run i — one expansion, one gather/scatter."""
    tot = int(length.sum())
    if tot == 0:
        return
    intra = (np.arange(tot, dtype=np.int64)
             - np.repeat(np.cumsum(length) - length, length))
    dst[np.repeat(dst_start, length) + intra] = \
        src[np.repeat(src_start, length) + intra]


def encode_wkb(tbl: pa.Table) -> pa.Array:
    """Geometry columns -> one little-endian WKB blob per row."""
    n = tbl.num_rows
    gt = tbl["geom_type"].to_numpy(zero_copy_only=False).astype(np.int64)
    dim = tbl["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
    if n and (dim != 2).any():
        raise ValueError("encode_wkb: only dim=2 geometries")
    if n and ((gt < 1) | (gt > 6)).any():
        raise ValueError("encode_wkb: geom_type outside 1..6")
    rs_off, rs = _flat(tbl, "ring_sizes")
    ps_off, ps = _flat(tbl, "poly_sizes")
    co_off, co = _flat(tbl, "coords")
    rs = rs.astype(np.int64)
    ps = ps.astype(np.int64)
    co = np.ascontiguousarray(co, np.float64)

    nrings_f = rs_off[1:] - rs_off[:-1]       # rs entries per feature
    nparts_f = ps_off[1:] - ps_off[:-1]       # ps entries per feature
    # sums of ring sizes per feature
    rcum = np.concatenate(([0], np.cumsum(rs)))
    csum_f = rcum[rs_off[1:]] - rcum[rs_off[:-1]]  # total vertices

    # per-feature byte length by type
    length = np.zeros(n, np.int64)
    length[gt == 1] = 21
    length[gt == 2] = 9 + 16 * csum_f[gt == 2]
    length[gt == 3] = 9 + 4 * nrings_f[gt == 3] + 16 * csum_f[gt == 3]
    length[gt == 4] = 9 + 21 * rs[rs_off[:-1]][gt == 4]  # rs=[npoints]
    length[gt == 5] = 9 + 9 * nrings_f[gt == 5] + 16 * csum_f[gt == 5]
    psum = np.concatenate(([0], np.cumsum(ps)))
    tot_rings_f = psum[ps_off[1:]] - psum[ps_off[:-1]]  # == nrings_f
    length[gt == 6] = (9 + 9 * nparts_f[gt == 6]
                       + 4 * tot_rings_f[gt == 6] + 16 * csum_f[gt == 6])
    starts = np.concatenate(([0], np.cumsum(length)))
    out = np.zeros(int(starts[-1]), np.uint8)

    u8_pos, u8_val = [], []       # single bytes (byte-order marks)
    u32_pos, u32_val = [], []     # uint32 fields (types, counts)
    cp_dst, cp_src, cp_len = [], [], []  # double runs (in doubles)

    def put8(pos, val):
        u8_pos.append(pos)
        u8_val.append(np.broadcast_to(np.asarray(val, np.uint8),
                                      np.shape(pos)).ravel())

    def put32(pos, val):
        u32_pos.append(np.asarray(pos, np.int64).ravel())
        u32_val.append(np.broadcast_to(
            np.asarray(val, np.uint32), np.shape(pos)).ravel())

    def copy_run(dst_byte, src_double, ndoubles):
        cp_dst.append(np.asarray(dst_byte, np.int64).ravel())
        cp_src.append(np.asarray(src_double, np.int64).ravel())
        cp_len.append(np.asarray(ndoubles, np.int64).ravel())

    o = starts[:-1]
    put8(o, 1)
    put32(o + 1, gt.astype(np.uint32))

    for t in (1, 2, 3, 4, 5, 6):
        m = gt == t
        if not m.any():
            continue
        fo = o[m]                      # feature byte starts
        c0 = co_off[:-1][m] // 2       # first vertex index
        if t == 1:
            copy_run(fo + 5, 2 * c0, np.full(m.sum(), 2))
            continue
        nv = csum_f[m]
        if t == 2:
            put32(fo + 5, nv.astype(np.uint32))
            copy_run(fo + 9, 2 * c0, 2 * nv)
            continue
        if t == 4:
            npt = rs[rs_off[:-1]][m]
            put32(fo + 5, npt.astype(np.uint32))
            # per point: [1][type=1][x y] at fo + 9 + 21*i
            tot = int(npt.sum())
            fi = np.repeat(np.arange(len(fo)), npt)
            pi = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(npt) - npt, npt))
            base = fo[fi] + 9 + 21 * pi
            put8(base, 1)
            put32(base + 1, np.uint32(1))
            copy_run(base + 5, 2 * c0[fi] + 2 * pi, np.full(tot, 2))
            continue
        # ring-structured types: expand rings of the selected features
        ro0, ro1 = rs_off[:-1][m], rs_off[1:][m]
        nr = ro1 - ro0
        totr = int(nr.sum())
        fi = np.repeat(np.arange(len(fo)), nr)
        ri = (np.arange(totr, dtype=np.int64)
              - np.repeat(np.cumsum(nr) - nr, nr))          # ring # in feat
        ridx = ro0[fi] + ri                                  # global rs idx
        rc = rs[ridx]                                        # ring vertex ct
        # vertex start of each ring (global doubles)
        vstart = 2 * (c0[fi] + (rcum[ridx] - rcum[ro0[fi]]))
        if t == 3:
            put32(fo + 5, nr.astype(np.uint32))
            # ring r data starts at 9 + sum_prior (4 + 16*c)
            prior = np.concatenate(([0], np.cumsum(4 + 16 * rc)))[:-1]
            # per-feature restart of the prior cumsum
            base_prior = prior - np.repeat(
                prior[np.concatenate(([True], fi[1:] != fi[:-1]))], nr)
            pos = fo[fi] + 9 + base_prior
            put32(pos, rc.astype(np.uint32))
            copy_run(pos + 4, vstart, 2 * rc)
            continue
        if t == 5:
            put32(fo + 5, nr.astype(np.uint32))
            prior = np.concatenate(([0], np.cumsum(9 + 16 * rc)))[:-1]
            base_prior = prior - np.repeat(
                prior[np.concatenate(([True], fi[1:] != fi[:-1]))], nr)
            pos = fo[fi] + 9 + base_prior
            put8(pos, 1)
            put32(pos + 1, np.uint32(2))
            put32(pos + 5, rc.astype(np.uint32))
            copy_run(pos + 9, vstart, 2 * rc)
            continue
        # t == 6: polygons of rings
        po0, po1 = ps_off[:-1][m], ps_off[1:][m]
        npoly = po1 - po0
        put32(fo + 5, npoly.astype(np.uint32))
        # which polygon does each ring belong to (within its feature)?
        # ps holds rings-per-polygon; expand to per-ring poly index
        totp = int(npoly.sum())
        pfi = np.repeat(np.arange(len(fo)), npoly)           # feat of poly
        ppi = (np.arange(totp, dtype=np.int64)
               - np.repeat(np.cumsum(npoly) - npoly, npoly))  # poly # in f
        pr = ps[po0[pfi] + ppi]                               # rings in poly
        # ring -> poly index (flat over the selected features' rings)
        poly_of_ring = np.repeat(np.arange(totp), pr)
        # byte length of each polygon: 9 + sum over its rings (4+16c)
        ring_bytes = 4 + 16 * rc
        pb = np.zeros(totp, np.int64)
        np.add.at(pb, poly_of_ring, ring_bytes)
        pb += 9
        # polygon start offsets within feature (restart per feature)
        pprior = np.concatenate(([0], np.cumsum(pb)))[:-1]
        pbase = pprior - np.repeat(
            pprior[np.concatenate(([True], pfi[1:] != pfi[:-1]))], npoly)
        ppos = fo[pfi] + 9 + pbase
        put8(ppos, 1)
        put32(ppos + 1, np.uint32(3))
        put32(ppos + 5, pr.astype(np.uint32))
        # ring offsets within polygon
        rprior = np.concatenate(([0], np.cumsum(ring_bytes)))[:-1]
        rbase = rprior - np.repeat(
            rprior[np.concatenate(([True],
                                   poly_of_ring[1:] != poly_of_ring[:-1]))],
            pr)
        rpos = ppos[poly_of_ring] + 9 + rbase
        put32(rpos, rc.astype(np.uint32))
        copy_run(rpos + 4, vstart, 2 * rc)

    # flush the three write streams
    if u8_pos:
        out[np.concatenate([np.asarray(p, np.int64).ravel()
                            for p in u8_pos])] = np.concatenate(u8_val)
    if u32_pos:
        pos = np.concatenate(u32_pos)
        valb = np.ascontiguousarray(
            np.concatenate(u32_val), "<u4").view(np.uint8).reshape(-1, 4)
        idx = pos[:, None] + np.arange(4, dtype=np.int64)[None, :]
        out[idx.ravel()] = valb.ravel()
    if cp_dst:
        dstb = np.concatenate(cp_dst)
        srcd = np.concatenate(cp_src)
        lend = np.concatenate(cp_len)
        _ragged_copy(out, dstb, co.view(np.uint8), 8 * srcd, 8 * lend)

    if starts[-1] < 2**31:
        return pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(starts.astype(np.int32)),
             pa.py_buffer(out)])
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(starts.astype(np.int64)), pa.py_buffer(out)])


def _u32_at(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    b = buf[pos[:, None] + np.arange(4, dtype=np.int64)[None, :]] \
        .astype(np.int64)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def decode_wkb(arr) -> pa.Table:
    """WKB blobs -> the engine's geometry columns
    (geom_type, dim, coords, ring_sizes, poly_sizes).  Ring/poly size
    records accumulate as (feature, order, value) arrays per
    vectorized round and assemble with one lexsort — no per-feature
    Python in the walk."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.table({
            "geom_type": pa.array([], pa.int8()),
            "dim": pa.array([], pa.int8()),
            "coords": pa.array([], pa.list_(pa.float64())),
            "ring_sizes": pa.array([], pa.list_(pa.int32())),
            "poly_sizes": pa.array([], pa.list_(pa.int32())),
        })
    bufs = arr.buffers()
    offs = np.frombuffer(
        bufs[1], np.int64 if pa.types.is_large_binary(arr.type)
        else np.int32)[arr.offset:arr.offset + n + 1].astype(np.int64)
    buf = np.frombuffer(bufs[2], np.uint8)
    starts = offs[:-1]
    if (buf[starts] != 1).any():
        raise ValueError("decode_wkb: only little-endian WKB (byte "
                         "order 0x01) is supported")
    gt = _u32_at(buf, starts + 1)
    if ((gt < 1) | (gt > 6)).any():
        raise ValueError("decode_wkb: geometry type outside 1..6 "
                         "(Z/M variants unsupported — 2-D only)")

    # record streams: coordinate runs and ring/poly size entries, all
    # (feature, order, payload) triples assembled at the end
    run_feat, run_ord, run_src, run_len = [], [], [], []
    rs_feat, rs_ord, rs_val = [], [], []
    ps_feat, ps_ord, ps_val = [], [], []

    def runs(fidx, order, src_byte, ndoubles):
        run_feat.append(np.asarray(fidx, np.int64).ravel())
        run_ord.append(np.asarray(order, np.int64).ravel())
        run_src.append(np.asarray(src_byte, np.int64).ravel())
        run_len.append(np.asarray(ndoubles, np.int64).ravel())

    def rec(fe, order, val, dest):
        dest[0].append(np.asarray(fe, np.int64).ravel())
        dest[1].append(np.broadcast_to(
            np.asarray(order, np.int64), np.shape(fe)).ravel())
        dest[2].append(np.broadcast_to(
            np.asarray(val, np.int64), np.shape(fe)).ravel())

    RS = (rs_feat, rs_ord, rs_val)
    PS = (ps_feat, ps_ord, ps_val)

    idx_all = np.arange(n, dtype=np.int64)
    for t in (1, 2, 3, 4, 5, 6):
        m = gt == t
        if not m.any():
            continue
        f = idx_all[m]
        fo = starts[m]
        if t == 1:
            rec(f, 0, 1, RS)
            rec(f, 0, 1, PS)
            runs(f, np.zeros(len(f)), fo + 5, np.full(len(f), 2))
            continue
        if t == 2:
            c = _u32_at(buf, fo + 5)
            rec(f, 0, c, RS)
            rec(f, 0, 1, PS)
            runs(f, np.zeros(len(f)), fo + 9, 2 * c)
            continue
        if t == 4:
            npt = _u32_at(buf, fo + 5)
            rec(f, 0, npt, RS)
            rec(f, 0, 1, PS)
            tot = int(npt.sum())
            fi = np.repeat(np.arange(len(f)), npt)
            pi = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(npt) - npt, npt))
            base = fo[fi] + 9 + 21 * pi
            if (buf[base] != 1).any() or (_u32_at(buf, base + 1) != 1).any():
                raise ValueError("decode_wkb: malformed MultiPoint member")
            runs(f[fi], pi, base + 5, np.full(tot, 2))
            continue
        if t in (3, 5):
            nr = _u32_at(buf, fo + 5)
            rec(f, 0, nr, PS)
            hdr = 4 if t == 3 else 9          # per-part header bytes
            cursor = (fo + 9).copy()
            r = 0
            while True:
                a = np.flatnonzero(nr > r)
                if len(a) == 0:
                    break
                pos = cursor[a]
                if t == 5:
                    if (buf[pos] != 1).any() \
                            or (_u32_at(buf, pos + 1) != 2).any():
                        raise ValueError(
                            "decode_wkb: malformed MultiLineString member")
                c = _u32_at(buf, pos + hdr - 4)
                rec(f[a], r, c, RS)
                runs(f[a], np.full(len(a), r), pos + hdr, 2 * c)
                cursor[a] += hdr + 16 * c
                r += 1
            continue
        # t == 6: polygons of rings — two bounded loops, each round
        # vectorized across the features still holding parts
        npoly = _u32_at(buf, fo + 5)
        cursor = (fo + 9).copy()
        order = np.zeros(len(f), np.int64)
        p = 0
        while True:
            a = np.flatnonzero(npoly > p)
            if len(a) == 0:
                break
            pos = cursor[a]
            if (buf[pos] != 1).any() or (_u32_at(buf, pos + 1) != 3).any():
                raise ValueError("decode_wkb: malformed MultiPolygon member")
            nr = _u32_at(buf, pos + 5)
            rec(f[a], p, nr, PS)
            cursor[a] += 9
            rem = nr.copy()
            while True:
                b = np.flatnonzero(rem > 0)
                if len(b) == 0:
                    break
                pos2 = cursor[a[b]]
                c = _u32_at(buf, pos2)
                # order key: running ring index per feature
                rec(f[a[b]], order[a[b]], c, RS)
                runs(f[a[b]], order[a[b]], pos2 + 4, 2 * c)
                order[a[b]] += 1
                cursor[a[b]] += 4 + 16 * c
                rem[b] -= 1
            p += 1

    def _gather(feat_l, ord_l, val_l, vtype):
        fe = np.concatenate(feat_l)
        od = np.concatenate(ord_l)
        va = np.concatenate(val_l)
        sel = np.lexsort((od, fe))
        fe, va = fe[sel], va[sel]
        per = np.bincount(fe, minlength=n)
        off = np.concatenate(([0], np.cumsum(per)))
        return pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(va.astype(vtype)))

    # coordinates: order runs by (feature, order), concatenate doubles
    rf = np.concatenate(run_feat)
    ro = np.concatenate(run_ord)
    rsrc = np.concatenate(run_src)
    rlen = np.concatenate(run_len)
    sel = np.lexsort((ro, rf))
    rf, rsrc, rlen = rf[sel], rsrc[sel], rlen[sel]
    total = int(rlen.sum())
    coords = np.empty(total, np.float64)
    dst = np.concatenate(([0], np.cumsum(rlen)))[:-1]
    _ragged_copy(coords.view(np.uint8), 8 * dst, buf, rsrc, 8 * rlen)
    per_feat = np.zeros(n, np.int64)
    np.add.at(per_feat, rf, rlen)
    co_offsets = np.concatenate(([0], np.cumsum(per_feat)))

    return pa.table({
        "geom_type": pa.array(gt.astype(np.int8)),
        "dim": pa.array(np.full(n, 2, np.int8)),
        "coords": pa.ListArray.from_arrays(
            pa.array(co_offsets, pa.int32()), pa.array(coords)),
        "ring_sizes": _gather(rs_feat, rs_ord, rs_val, np.int32),
        "poly_sizes": _gather(ps_feat, ps_ord, ps_val, np.int32),
    })


def points_geo_table(lons, lats) -> pa.Table:
    """Build the codec's geometry-table input for N 2-D Points — the
    non-obvious schema contract (interleaved coords ListArray, [[1]]
    ring/poly sizes) in ONE place for every caller."""
    n = len(lons)
    coords = np.empty(2 * n)
    coords[0::2] = lons
    coords[1::2] = lats
    return pa.table({
        "geom_type": pa.array(np.ones(n, np.int8)),
        "dim": pa.array(np.full(n, 2, np.int8)),
        "coords": pa.ListArray.from_arrays(
            pa.array(np.arange(0, 2 * n + 2, 2, dtype=np.int32)),
            pa.array(coords)),
        "ring_sizes": pa.array([[1]] * n, pa.list_(pa.int32())),
        "poly_sizes": pa.array([[1]] * n, pa.list_(pa.int32())),
    })
