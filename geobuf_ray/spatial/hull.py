"""Convex hull, batch-vectorized across many point sets (QuickHull).

Same execution shape as the Douglas–Peucker engine (`simplify.py`):
every round processes EVERY active edge of EVERY feature at once —
candidates carry (flat vertex index, edge id), per-edge farthest
points fall out of one stable sort + ``reduceat``, and each split
re-tests its candidates against the two child edges with two cross
products.  Rounds run until no edge has outside points (O(log n)
typical), so a batch of 10^5 small hulls and one hull of 10^5 points
cost the same vectorized passes.

The reference has no hull operator (geometry ops stop at bbox math —
`geobuf_raw/bb.go`); this is the standard footprint/coverage summary a
spatial pipeline derives per group before overlap joins, so it is
first-class here.  Output rings are counterclockwise with explicit
closure, matching the engine's polygon convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec.schema import list_column_parts
from ..codec.varint import ramp as _ramp


def hull_indices(xs: np.ndarray, ys: np.ndarray, starts: np.ndarray,
                 sizes: np.ndarray):
    """Per-set convex hull via batched QuickHull.

    ``starts``/``sizes`` delimit each point set inside flat
    ``xs``/``ys``.  Returns ``(idx, set_id)``: flat indices of hull
    vertices in counterclockwise order starting from each set's
    leftmost-lowest point, and the set each belongs to.  Collinear
    interior points are excluded; degenerate sets (all points equal or
    collinear) return their 2 (or 1) extreme points.
    """
    nsets = len(starts)
    if nsets == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    set_of = np.repeat(np.arange(nsets), sizes)
    flat = np.repeat(starts, sizes) + _ramp(sizes)
    # extreme points: lexicographic (x, y) min and max per set — the
    # two are hull vertices of every non-empty set
    ends = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    key = xs[flat] * 1.0  # order by x, tie-break y via lexsort
    order = np.lexsort((ys[flat], key, set_of))
    lo_pos = order[ends]
    hi_pos = order[ends + sizes - 1]
    a0 = flat[lo_pos]  # leftmost (lowest y on tie)
    b0 = flat[hi_pos]  # rightmost (highest y on tie)

    hull_pts = [a0]
    hull_set = [np.arange(nsets)]
    nondegen = a0 != b0
    hull_pts.append(b0[nondegen])
    hull_set.append(np.flatnonzero(nondegen))

    # two initial directed edges per set: (a,b) keeps points LEFT of
    # a->b (upper side), (b,a) the lower side; candidate list excludes
    # the extremes themselves
    cand = flat
    cseg = np.concatenate([set_of * 2, set_of * 2 + 1])
    cand = np.concatenate([cand, cand])
    ea = np.empty(2 * nsets, np.int64)
    eb = np.empty(2 * nsets, np.int64)
    ea[0::2], eb[0::2] = a0, b0
    ea[1::2], eb[1::2] = b0, a0
    eset = np.repeat(np.arange(nsets), 2)
    next_edge = 2 * nsets

    while len(cand):
        ax, ay = xs[ea[cseg]], ys[ea[cseg]]
        bx, by = xs[eb[cseg]], ys[eb[cseg]]
        cross = ((bx - ax) * (ys[cand] - ay)
                 - (by - ay) * (xs[cand] - ax))
        out = cross > 0.0  # strictly left: collinear points drop
        cand, cseg, cross = cand[out], cseg[out], cross[out]
        if not len(cand):
            break
        srt = np.argsort(cseg, kind="stable")
        cand, cseg, cross = cand[srt], cseg[srt], cross[srt]
        segs, first = np.unique(cseg, return_index=True)
        seg_max = np.maximum.reduceat(cross, first)
        # FIRST candidate attaining the max (deterministic tie-break)
        is_max = cross == seg_max[np.searchsorted(segs, cseg)]
        pos = np.where(is_max, np.arange(len(cross)),
                       np.iinfo(np.int64).max)
        far_pos = np.minimum.reduceat(pos, first)
        far = cand[far_pos]
        hull_pts.append(far)
        hull_set.append(eset[segs])
        # split each edge (a,b) at far -> (a,far) new id, (far,b) new id
        n_split = len(segs)
        new_ids = np.arange(next_edge, next_edge + 2 * n_split)
        next_edge += 2 * n_split
        na = np.empty(2 * n_split, np.int64)
        nb = np.empty(2 * n_split, np.int64)
        na[0::2], nb[0::2] = ea[segs], far
        na[1::2], nb[1::2] = far, eb[segs]
        ea = np.concatenate([ea, na])
        eb = np.concatenate([eb, nb])
        eset = np.concatenate([eset, np.repeat(eset[segs], 2)])
        # each surviving candidate re-tests against its edge's two
        # children; a point inside the (a, far, b) triangle is left of
        # neither child and drops out
        child_base = new_ids[0::2][np.searchsorted(segs, cseg)]
        fa = far[np.searchsorted(segs, cseg)]
        # drop the far points themselves from the candidate pool
        keep = cand != fa
        cand, cseg, child_base = cand[keep], cseg[keep], child_base[keep]
        fa = fa[keep]
        a1x, a1y = xs[ea[child_base]], ys[ea[child_base]]
        f1x, f1y = xs[fa], ys[fa]
        left1 = ((f1x - a1x) * (ys[cand] - a1y)
                 - (f1y - a1y) * (xs[cand] - a1x)) > 0.0
        b2x, b2y = xs[eb[child_base + 1]], ys[eb[child_base + 1]]
        left2 = ((b2x - f1x) * (ys[cand] - f1y)
                 - (b2y - f1y) * (xs[cand] - f1x)) > 0.0
        sel1 = left1
        sel2 = left2 & ~left1
        cand = np.concatenate([cand[sel1], cand[sel2]])
        cseg = np.concatenate([child_base[sel1], child_base[sel2] + 1])

    idx = np.concatenate(hull_pts)
    sid = np.concatenate(hull_set)
    # counterclockwise order: angle around the hull-point centroid of
    # each set (valid because the hull is convex), anchored so every
    # ring starts at the leftmost-lowest vertex
    csum_x = np.bincount(sid, weights=xs[idx], minlength=nsets)
    csum_y = np.bincount(sid, weights=ys[idx], minlength=nsets)
    cnt = np.bincount(sid, minlength=nsets).astype(np.float64)
    cnt[cnt == 0] = 1.0
    ang = np.arctan2(ys[idx] - (csum_y / cnt)[sid],
                     xs[idx] - (csum_x / cnt)[sid])
    # anchor: rotate angles so the set's a0 vertex comes first
    a0_ang = np.full(nsets, -np.pi)
    is_anchor = idx == a0[sid]
    a0_ang[sid[is_anchor]] = ang[is_anchor]
    rel = np.mod(ang - a0_ang[sid], 2 * np.pi)
    srt = np.lexsort((rel, sid))
    return idx[srt], sid[srt]


def convex_hull_points(tbl: pa.Table, *, x: str = "lon", y: str = "lat",
                       key: str | None = None):
    """Convex hull of a point table (optionally per ``key`` group,
    which must be pre-grouped/contiguous — use inside ``map_groups``
    or after a key exchange).  Returns one row per group with the hull
    ring (closed, CCW) as a flat [x0,y0,...] list plus the hull vertex
    count."""
    xs = tbl[x].combine_chunks().to_numpy(zero_copy_only=False).astype(
        np.float64)
    ys = tbl[y].combine_chunks().to_numpy(zero_copy_only=False).astype(
        np.float64)
    if key is None:
        starts = np.array([0], np.int64)
        sizes = np.array([len(xs)], np.int64)
        keys = None
    else:
        kcol = tbl[key].combine_chunks()
        codes = kcol.dictionary_encode().indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        change = np.concatenate(([True], codes[1:] != codes[:-1]))
        starts = np.flatnonzero(change).astype(np.int64)
        sizes = np.diff(np.append(starts, len(xs)))
        keys = kcol.take(pa.array(starts, pa.int64()))
    idx, sid = hull_indices(xs, ys, starts, sizes)
    per = np.bincount(sid, minlength=len(starts))
    # close each ring: repeat the first vertex at the end
    n_out = per + (per > 0)
    offs = np.concatenate(([0], np.cumsum(n_out * 2)))
    ring_first = np.concatenate(([0], np.cumsum(per)))[:-1]
    # ordered hull vertices first, then the closure vertex per set —
    # build explicit per-set output positions
    out_idx = np.empty(int(n_out.sum()), np.int64)
    wpos = np.concatenate(([0], np.cumsum(n_out)))[:-1]
    out_pos = wpos[sid] + (np.arange(len(idx))
                           - np.repeat(ring_first, per))
    out_idx[out_pos] = idx
    close_sets = np.flatnonzero(per > 0)
    out_idx[wpos[close_sets] + n_out[close_sets] - 1] = \
        idx[ring_first[per > 0]]
    flat = np.empty(int(n_out.sum()) * 2, np.float64)
    flat[0::2] = xs[out_idx]
    flat[1::2] = ys[out_idx]
    cols = {}
    if keys is not None:
        cols[key] = keys
    cols["hull"] = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(flat))
    cols["n_hull"] = pa.array(per.astype(np.int64))
    return pa.table(cols)


def convex_hull(ds, *, x: str = "lon", y: str = "lat", key: str,
                nbuckets: int = 32):
    """Distributed per-group convex hull over a point Dataset: local
    per-block hulls first (each block's hull has at most O(hull) points
    — the associative property of hulls makes this a partial
    aggregate), then one skinny exchange of the partial hull points
    and a final per-group hull.  Only hull-candidate points ever move."""
    from ..functions.exchange import grouped_exchange

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({})
        kcol = batch[key].combine_chunks()
        codes = kcol.dictionary_encode().indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        t = batch.take(pa.array(order, pa.int64()))
        xs = t[x].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64)
        ys = t[y].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64)
        cs = codes[order]
        change = np.concatenate(([True], cs[1:] != cs[:-1]))
        starts = np.flatnonzero(change).astype(np.int64)
        sizes = np.diff(np.append(starts, len(xs)))
        idx, _sid = hull_indices(xs, ys, starts, sizes)
        sub = t.take(pa.array(np.sort(idx), pa.int64()))
        return sub.select([key, x, y])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final(group: pa.Table) -> pa.Table:
        return convex_hull_points(group, x=x, y=y, key=key)

    return grouped_exchange(partials, key, final, nbuckets=nbuckets)
