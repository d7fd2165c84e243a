"""Exact 2-D line-segment intersection join on an integer grid.

The missing third leg of the spatial-join family (bbox overlap =
``bbox_intersection_join``, point-in-polygon = ``pip_s2_join``): given
two Datasets of quantized integer segments, emit every (a, b) pair
whose segments intersect — properly or at a touch point — decided
entirely in int64 orientation arithmetic (floats never enter the
predicate, so the result is bit-reproducible and SQL-checkable).

Scale shape (same contract as the reference's tile split-combine,
splitcombine/split_combine.go:240-260, re-expressed Ray-first):

* each segment fans out to the uniform grid cells its bbox overlaps
  (segments are short relative to ``cell``, so the fan-out is O(1));
* one hash co-group on cell — nothing centralizes;
* per cell, vectorized candidate pairing (sort + searchsorted), bbox
  prefilter, then the exact CLRS orientation predicate;
* a pair sharing many cells is emitted EXACTLY ONCE with the standard
  reference-point rule: only the cell containing
  ``(max(minx_a, minx_b), max(miny_a, miny_b))`` — a point inside both
  bboxes, hence covered by both sides' fan-outs — reports it.  No
  second dedup shuffle.

Coordinates must satisfy ``|coord| < 2**30`` so every cross product
stays inside int64 (differences < 2**31, products < 2**62, their
difference < 2**63); the map stage validates per batch and raises.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_COORD_BOUND = 1 << 30
_P1 = np.uint64(0xFF51AFD7ED558CCD)


def _cell_of(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Pack grid coords into one int64 cell id (must match between the
    fan-out and the reference-point rule)."""
    return (cx.astype(np.int64) << np.int64(32)) ^ (
        cy.astype(np.int64) & np.int64(0xFFFFFFFF))


def _orient(px, py, qx, qy, rx, ry):
    """sign-carrying cross product (Q-P) x (R-P), exact in int64."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _on_seg(px, py, qx, qy, rx, ry):
    """Given R collinear with segment PQ: is R inside PQ's bbox?"""
    return (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx)) & \
           (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))


def segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Vectorized exact segment-intersection predicate (CLRS 33.1).

    Correct for degenerate (zero-length) segments too: a point's two
    orientations coincide, so only the collinear+bbox branch can fire,
    which is exactly point-on-segment / point-equality."""
    d1 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
             (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    touch = ((d1 == 0) & _on_seg(bx1, by1, bx2, by2, ax1, ay1)) | \
            ((d2 == 0) & _on_seg(bx1, by1, bx2, by2, ax2, ay2)) | \
            ((d3 == 0) & _on_seg(ax1, ay1, ax2, ay2, bx1, by1)) | \
            ((d4 == 0) & _on_seg(ax1, ay1, ax2, ay2, bx2, by2))
    return proper | touch


_SEG_COLS = ("x1", "y1", "x2", "y2")


def _seg_arrays(tbl: pa.Table, id_col: str):
    ids = tbl[id_col].cast(pa.int64()).combine_chunks().to_numpy(
        zero_copy_only=False)
    cs = [tbl[c].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64) for c in _SEG_COLS]
    return ids, cs


def _side_bucket_fn(id_col: str, cell: int, nbuckets: int):
    def fn(batch: pa.Table):
        ids, (x1, y1, x2, y2) = _seg_arrays(batch, id_col)
        if len(ids):
            m = max(abs(int(x1.min(initial=0))), int(x1.max(initial=0)),
                    abs(int(y1.min(initial=0))), int(y1.max(initial=0)),
                    abs(int(x2.min(initial=0))), int(x2.max(initial=0)),
                    abs(int(y2.min(initial=0))), int(y2.max(initial=0)))
            if m >= _COORD_BOUND:
                raise ValueError(
                    f"segment coordinate {m} >= 2**30: the int64 "
                    "orientation predicate would overflow")
        cx0 = np.minimum(x1, x2) // cell
        cx1 = np.maximum(x1, x2) // cell
        cy0 = np.minimum(y1, y2) // cell
        cy1 = np.maximum(y1, y2) // cell
        nx = (cx1 - cx0 + 1)
        ny = (cy1 - cy0 + 1)
        cnt = nx * ny
        rows = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
        # per-row local index 0..cnt-1 -> (dx, dy)
        tot = int(cnt.sum())
        local = (np.arange(tot, dtype=np.int64)
                 - np.repeat(np.cumsum(cnt) - cnt, cnt))
        nyr = ny[rows]
        cxs = cx0[rows] + local // nyr
        cys = cy0[rows] + local % nyr
        cells = _cell_of(cxs, cys)
        tbl = pa.table({
            "cell": pa.array(cells),
            "sid": pa.array(ids[rows]),
            "x1": pa.array(x1[rows]), "y1": pa.array(y1[rows]),
            "x2": pa.array(x2[rows]), "y2": pa.array(y2[rows]),
        })
        buckets = ((cells.view(np.uint64) * _P1)
                   % np.uint64(nbuckets)).astype(np.int64)
        return buckets, tbl
    return fn


def segment_intersect_join(a_ds, b_ds, *, cell: int, nbuckets: int = 64,
                           a_id_col: str = "id", b_id_col: str = "id",
                           out_a: str = "a_id", out_b: str = "b_id"):
    """Distributed exact segment-intersection join.

    ``a_ds`` / ``b_ds``: Datasets with integer columns
    (``id_col``, x1, y1, x2, y2), every |coord| < 2**30.
    ``cell``: grid pitch — pick a few times the typical segment length
    so the fan-out stays O(1) per segment.  Returns (out_a, out_b)
    pairs, each intersecting pair exactly once.
    """
    from ..functions.exchange import hash_cogroup

    schema = pa.schema([("cell", pa.int64()), ("sid", pa.int64()),
                        ("x1", pa.int64()), ("y1", pa.int64()),
                        ("x2", pa.int64()), ("y2", pa.int64())])
    empty = pa.table({out_a: pa.array([], pa.int64()),
                      out_b: pa.array([], pa.int64())})

    def reduce_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        lcell = lt["cell"].to_numpy(zero_copy_only=False)
        rcell = rt["cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(rcell, kind="stable")
        rs_ = rcell[order]
        lo = np.searchsorted(rs_, lcell, side="left")
        hi = np.searchsorted(rs_, lcell, side="right")
        cnt = hi - lo
        li = np.flatnonzero(cnt > 0)
        if len(li) == 0:
            return empty
        c = cnt[li]
        l_rep = np.repeat(li, c)
        gather = (np.repeat(lo[li], c)
                  + np.arange(int(c.sum())) - np.repeat(np.cumsum(c) - c, c))
        r_rep = order[gather]

        la = {k: lt[k].to_numpy(zero_copy_only=False)[l_rep]
              for k in _SEG_COLS}
        rb = {k: rt[k].to_numpy(zero_copy_only=False)[r_rep]
              for k in _SEG_COLS}
        aminx = np.minimum(la["x1"], la["x2"])
        aminy = np.minimum(la["y1"], la["y2"])
        bminx = np.minimum(rb["x1"], rb["x2"])
        bminy = np.minimum(rb["y1"], rb["y2"])
        # bbox prefilter (cheap; the orientation test subsumes it but
        # runs 4 multiplies per lane)
        pre = (aminx <= np.maximum(rb["x1"], rb["x2"])) & \
              (bminx <= np.maximum(la["x1"], la["x2"])) & \
              (aminy <= np.maximum(rb["y1"], rb["y2"])) & \
              (bminy <= np.maximum(la["y1"], la["y2"]))
        keep = np.flatnonzero(pre)
        if len(keep) == 0:
            return empty
        hit = segments_intersect(
            la["x1"][keep], la["y1"][keep], la["x2"][keep], la["y2"][keep],
            rb["x1"][keep], rb["y1"][keep], rb["x2"][keep], rb["y2"][keep])
        keep = keep[hit]
        if len(keep) == 0:
            return empty
        # reference-point exactly-once rule
        ref_cell = _cell_of(np.maximum(aminx[keep], bminx[keep]) // cell,
                            np.maximum(aminy[keep], bminy[keep]) // cell)
        keep = keep[ref_cell == lcell[l_rep[keep]]]
        if len(keep) == 0:
            return empty
        lid = lt["sid"].to_numpy(zero_copy_only=False)[l_rep[keep]]
        rid = rt["sid"].to_numpy(zero_copy_only=False)[r_rep[keep]]
        return pa.table({out_a: pa.array(lid), out_b: pa.array(rid)})

    return hash_cogroup(
        a_ds, b_ds, nbuckets=nbuckets,
        left_bucket_fn=_side_bucket_fn(a_id_col, cell, nbuckets),
        right_bucket_fn=_side_bucket_fn(b_id_col, cell, nbuckets),
        reduce_fn=reduce_fn, left_schema=schema, right_schema=schema)


def line_merge_components(segs_ds, *, id_col: str = "id",
                          nbuckets: int = 32):
    """Polyline stitching (the ST_LineMerge grouping step): segments
    sharing an endpoint belong to one merged polyline.  Endpoints
    rendezvous on a hash co-group (each segment ships two (vertex,
    seg) rows), every shared vertex emits segment-segment equivalence
    edges, and the engine's pointer-doubling ``connected_components``
    resolves the merged groups — nothing centralizes except the final
    per-group labels.

    Input rows: (``id_col``, x1, y1, x2, y2) integer coords (|coord|
    < 2**31: endpoints pack into one int64 rendezvous key).  Returns
    the component table (node=segment id, component=min segment id of
    its merged polyline).
    """
    from ..functions.exchange import grouped_exchange
    from ..functions.graph import connected_components

    vert_schema = pa.schema([("v", pa.int64()), ("sid", pa.int64())])

    def endpoints(batch: pa.Table) -> pa.Table:
        ids, (x1, y1, x2, y2) = _seg_arrays(batch, id_col)
        m = np.int64(0xFFFFFFFF)
        v1 = ((x1 & m) << np.int64(32)) | (y1 & m)
        v2 = ((x2 & m) << np.int64(32)) | (y2 & m)
        return pa.table({"v": pa.array(np.concatenate([v1, v2])),
                         "sid": pa.array(np.concatenate([ids, ids]))})

    verts = segs_ds.map_batches(endpoints, batch_format="pyarrow",
                                zero_copy_batch=True)
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def link(tbl: pa.Table) -> pa.Table:
        """One shared vertex: star-link every segment to the group's
        minimum id (O(group) edges, not O(group^2))."""
        s = tbl["sid"].to_numpy(zero_copy_only=False)
        lo = s.min()
        return pa.table({"src": pa.array(s),
                         "dst": pa.array(np.full(len(s), lo, np.int64))})

    edges = grouped_exchange(verts, "v", link, nbuckets=nbuckets,
                             schema=edge_schema)
    return connected_components(edges, src="src", dst="dst",
                                nbuckets=nbuckets)
