"""Douglas–Peucker polyline/ring simplification, vectorized across a
whole batch.

The classic DP recursion is per-feature and stack-shaped; here every
round processes EVERY active segment of EVERY feature at once:

* each vertex belongs to exactly one active segment (segments tile the
  vertex range), so its chord endpoints come from one ``repeat`` per
  round;
* per-vertex perpendicular distance to the chord is one vectorized
  expression;
* per-segment max + argmax fall out of ``np.maximum.reduceat`` plus a
  first-max scan — no Python loop over segments or features.

Rounds run until no segment exceeds ``eps`` (worst case O(n) rounds
for a degenerate staircase, O(log n) typical).  Matches the scalar
recursive DP exactly, including first-max tie-breaks (tested).

The reference has no simplifier (its geometry ops stop at bbox math);
this is the standard pre-tiling vertex-diet stage its users run before
``split_combine``-style tiling, so it is first-class here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec.schema import (LINESTRING, MULTILINESTRING, MULTIPOLYGON,
                            POLYGON, list_column_parts)
from ..codec.varint import ramp as _ramp


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, starts: np.ndarray,
                 sizes: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for Douglas–Peucker over many polylines.

    ``starts``/``sizes`` delimit each polyline inside the flat
    ``xs``/``ys``; every polyline keeps its endpoints.  ``eps`` is the
    perpendicular-distance tolerance in coordinate units.
    """
    n = len(xs)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    ends = starts + sizes - 1
    keep[starts] = True
    keep[ends] = True
    # active segments as (lo, hi) flat-index pairs, interior non-empty
    lo = starts[sizes > 2]
    hi = ends[sizes > 2]
    while len(lo):
        # vertex -> segment assignment: segments are disjoint and
        # sorted by construction (each round splits in place)
        order = np.argsort(lo, kind="stable")
        lo, hi = lo[order], hi[order]
        # interior vertices of each segment
        counts = hi - lo - 1
        seg_of = np.repeat(np.arange(len(lo)), counts)
        idx = np.repeat(lo + 1, counts) + _ramp(counts)
        ax, ay = xs[lo][seg_of], ys[lo][seg_of]
        bx, by = xs[hi][seg_of], ys[hi][seg_of]
        px, py = xs[idx], ys[idx]
        dxx, dyy = bx - ax, by - ay
        # distance to the (possibly degenerate) chord: cross/len, or
        # point distance when the chord endpoints coincide
        num = np.abs(dxx * (py - ay) - dyy * (px - ax))
        den = np.hypot(dxx, dyy)
        degen = den == 0
        dist = np.where(degen, np.hypot(px - ax, py - ay),
                        num / np.where(degen, 1.0, den))
        # per-segment max + FIRST argmax (the scalar recursion's rule)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        seg_max = np.maximum.reduceat(dist, bounds[:-1])
        seg_max[counts == 0] = 0.0
        split = seg_max > eps
        if not split.any():
            break
        # first position where dist == its segment max
        is_max = dist == seg_max[seg_of]
        # first True per segment: positions ascending, take min index
        pos = np.where(is_max, np.arange(len(dist)), np.iinfo(np.int64).max)
        first = np.minimum.reduceat(pos, bounds[:-1])
        first[counts == 0] = np.iinfo(np.int64).max
        sel = np.flatnonzero(split)
        cut = idx[first[sel]] if len(dist) else np.empty(0, np.int64)
        keep[cut] = True
        # split segments: (lo, cut) and (cut, hi), keep only those
        # with interior vertices
        new_lo = np.concatenate([lo[sel], cut])
        new_hi = np.concatenate([cut, hi[sel]])
        inner = new_hi - new_lo > 1
        lo, hi = new_lo[inner], new_hi[inner]
    return keep


def simplify_batch(batch: pa.Table, eps: float) -> pa.Table:
    """Simplify every ring/polyline of a canonical feature-table batch.

    Point-family features pass through; polygon rings keep their
    explicit closure (first == last vertex are both endpoints of the
    DP run, so closure is preserved by construction).  ``dim > 2``
    features keep their extra ordinates on surviving vertices."""
    n = batch.num_rows
    if n == 0:
        return batch
    coords, offs = list_column_parts(batch["coords"], np.float64)
    ring_sizes, r_offs = list_column_parts(batch["ring_sizes"], np.int64)
    gtype = batch["geom_type"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    dim = np.maximum(batch["dim"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64), 1)

    rings_per_feat = np.diff(r_offs)
    ring_feat = np.repeat(np.arange(n), rings_per_feat)
    ring_dim = dim[ring_feat]
    ring_starts_v = (np.concatenate(([0], np.cumsum(ring_sizes)[:-1]))
                     if len(ring_sizes) else np.empty(0, np.int64))

    counts = np.diff(offs)
    if (dim == 2).all():
        xs, ys = coords[0::2], coords[1::2]
    else:
        local = np.arange(len(coords)) - np.repeat(offs[:-1], counts)
        dd = np.repeat(dim, counts)
        xs = coords[(local % dd) == 0]
        ys = coords[(local % dd) == 1]

    # simplify line/polygon rings; points and 2-vertex rings pass
    simplifiable = (np.isin(gtype[ring_feat],
                        (LINESTRING, POLYGON, MULTILINESTRING,
                         MULTIPOLYGON))
                & (ring_sizes > 2))
    keep = np.ones(int(ring_sizes.sum()), bool)
    if simplifiable.any():
        km = dp_keep_mask(xs, ys, ring_starts_v[simplifiable],
                          ring_sizes[simplifiable], eps)
        # km covers ALL vertices (masked per segment); merge only the
        # simplifiable rings' spans — boundary-scatter + cumsum, no
        # per-ring Python loop
        delta = np.zeros(len(keep) + 1, np.int8)
        ss = ring_starts_v[simplifiable]
        np.add.at(delta, ss, 1)
        np.add.at(delta, ss + ring_sizes[simplifiable], -1)
        span_sel = np.cumsum(delta[:-1]) > 0
        keep[span_sel] = km[span_sel]

    # rebuild per-ring sizes and flat coords (all dims of kept vertices)
    vfeat_ring = np.repeat(np.arange(len(ring_sizes)), ring_sizes)
    new_ring_sizes = np.bincount(vfeat_ring[keep],
                                 minlength=len(ring_sizes)).astype(np.int64)
    kept_idx = np.flatnonzero(keep)
    # vertex -> flat coord positions for each of its dim values
    vdim = np.repeat(dim, counts // dim)  # per-vertex dim
    vstart = np.concatenate(([0], np.cumsum(vdim)[:-1])) \
        if len(vdim) else np.empty(0, np.int64)
    take = (vstart[kept_idx][:, None]
            + np.arange(int(dim.max()) if n else 2)[None, :])
    dmask = np.arange(int(dim.max()) if n else 2)[None, :] \
        < vdim[kept_idx][:, None]
    flat_take = take[dmask]
    new_coords = coords[flat_take]

    new_vals_per_feat = np.bincount(
        ring_feat, weights=new_ring_sizes,
        minlength=n).astype(np.int64) * dim
    new_offs = np.concatenate(([0], np.cumsum(new_vals_per_feat)))
    ring_list_offs = r_offs  # ring COUNT per feature is unchanged

    out_cols = {}
    for name in batch.column_names:
        if name == "coords":
            out_cols[name] = pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int32()), pa.array(new_coords))
        elif name == "ring_sizes":
            out_cols[name] = pa.ListArray.from_arrays(
                pa.array(ring_list_offs, pa.int32()),
                pa.array(new_ring_sizes, pa.int32()))
        else:
            out_cols[name] = batch[name]
    return pa.table(out_cols)


def simplify(ds, eps: float, **map_kwargs):
    """Dataset stage: Douglas–Peucker over feature-table blocks — one
    embarrassingly-parallel ``map_batches``, no shuffle."""
    return ds.map_batches(lambda b: simplify_batch(b, eps),
                          batch_format="pyarrow", zero_copy_batch=True,
                          **map_kwargs)
