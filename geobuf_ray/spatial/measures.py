"""Vectorized per-feature geometry measures: signed area, length /
perimeter, area-weighted centroid, vertex counts.

The reference engine has no measure kernels (its only geometry math is
bbox folding, bb.go:137-154, and the 1-D interval overlap of
splitcombine); measures are the first thing a reference user computes
downstream of a decode, so they are first-class here.

Two domains:

* **Quantized int64** (``*_q`` outputs): the codec's native domain
  (geom.go:173-179 works in the same trunc-toward-zero 1e7 lattice).
  Shoelace cross products are ring-bbox-centered so every legal
  lon/lat feature stays inside int64 — EXACT integer arithmetic
  end-to-end, which is what lets the driver hash a measures query
  against a DuckDB oracle bit-for-bit.  (Output domain: |area2_q| of
  a feature covering > ~46% of the world rectangle would exceed
  int64; an explicit OverflowError guards it.)
* **float64 degrees**: Euclidean length and area-weighted centroid for
  human consumption (no exactness contract; pytest-oracled).

All kernels are one pass of numpy segmented ops over the flat
interleaved coords buffer — no per-feature Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec.schema import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                            MULTIPOLYGON, POINT, POLYGON,
                            list_column_parts)

_POLY_TYPES = (POLYGON, MULTIPOLYGON)
_LINE_TYPES = (LINESTRING, MULTILINESTRING)


def _ring_structure(batch: pa.Table):
    """(xs, ys, ring_feat, ring_starts, ring_sizes_v, gtype, nfeat)
    from the canonical feature table — x/y extracted per feature dim
    (extra dims beyond 2 are ignored for planar measures)."""
    n = batch.num_rows
    coords, offs = list_column_parts(batch["coords"], np.float64)
    ring_sizes, r_offs = list_column_parts(batch["ring_sizes"], np.int64)
    gtype = batch["geom_type"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    dim = batch["dim"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)

    counts = np.diff(offs)
    d = np.maximum(dim, 1)
    if (d == 2).all():
        xs, ys = coords[0::2], coords[1::2]
    else:
        local = np.arange(len(coords)) - np.repeat(offs[:-1], counts)
        dd = np.repeat(d, counts)
        xs = coords[(local % dd) == 0]
        ys = coords[(local % dd) == 1]

    rings_per_feat = np.diff(r_offs)
    ring_feat = np.repeat(np.arange(n), rings_per_feat)
    ring_starts = (np.concatenate(([0], np.cumsum(ring_sizes)[:-1]))
                   if len(ring_sizes) else np.empty(0, np.int64))
    if len(ring_sizes) and (ring_sizes == 0).any():
        # a zero-vertex ring has no edges and would corrupt the
        # successor scatter (end index = start - 1)
        keep = ring_sizes > 0
        ring_feat, ring_starts, ring_sizes = (
            ring_feat[keep], ring_starts[keep], ring_sizes[keep])
    return xs, ys, ring_feat, ring_starts, ring_sizes, gtype, n, \
        rings_per_feat


def _next_index(ring_starts, ring_sizes, ring_wraps):
    """Per-vertex successor index: +1 inside a ring; the ring's LAST
    vertex wraps to the ring start when ``ring_wraps`` (polygon rings,
    where the closing edge must contribute even if the input ring is
    not explicitly closed) else points at itself (polylines: no
    closing edge, self-edge contributes zero)."""
    total = int(ring_sizes.sum())
    nxt = np.arange(1, total + 1, dtype=np.int64)
    ends = ring_starts + ring_sizes - 1
    nxt[ends] = np.where(ring_wraps, ring_starts, ends)
    return nxt


def measures_batch(batch: pa.Table, *, quantized: bool = True,
                   euclid: bool = True) -> pa.Table:
    """Per-feature measures over a canonical feature-table batch.

    Output columns (keyed by the input ``id``):

    * ``n_rings``, ``n_vertices`` — int64 structure counts.
    * ``area2_q`` (``quantized=True``) — TWICE the signed shoelace
      area in quantum^2 (1e-7 deg lattice), summed over rings, so
      GeoJSON-wound holes (CW) subtract from their CCW exterior.
      Exact int64; 0 for non-polygon features.
    * ``perim_mh_q`` (``quantized=True``) — Manhattan perimeter /
      polyline length in quanta: sum of |dx| + |dy| per edge.  Exact
      int64 (and equal to the Euclidean perimeter for axis-aligned
      rectangles); 0 for point features.
    * ``length_deg`` (``euclid=True``) — Euclidean perimeter /
      polyline length in degrees, float64.
    * ``centroid_x`` / ``centroid_y`` (``euclid=True``) — area-weighted
      centroid for polygons (falls back to the vertex mean when the
      signed area cancels to ~0), vertex mean otherwise.
    """
    from ..codec.feature import quantize

    (xs, ys, ring_feat, ring_starts, ring_sizes,
     gtype, n, rings_per_feat) = _ring_structure(batch)
    ids = batch["id"].combine_chunks()

    nver = np.zeros(n, np.int64)
    np.add.at(nver, ring_feat, ring_sizes)
    # structural count (includes zero-vertex rings filtered above)
    nrings = rings_per_feat.astype(np.int64)

    cols: dict[str, pa.Array] = {"id": ids}
    cols["n_rings"] = pa.array(nrings, pa.int64())
    cols["n_vertices"] = pa.array(nver, pa.int64())

    if len(xs) == 0:
        z = pa.array(np.zeros(n, np.int64))
        if quantized:
            cols["area2_q"] = z
            cols["perim_mh_q"] = z
        if euclid:
            cols["length_deg"] = pa.array(np.zeros(n))
            cols["centroid_x"] = pa.array(np.full(n, np.nan))
            cols["centroid_y"] = pa.array(np.full(n, np.nan))
        return pa.table(cols)

    is_poly = np.isin(gtype, _POLY_TYPES)
    is_line = np.isin(gtype, _LINE_TYPES)
    ring_wraps = is_poly[ring_feat]
    ring_edges = ring_wraps | is_line[ring_feat]  # points: no edges
    nxt = _next_index(ring_starts, ring_sizes, ring_wraps)
    # point-family features contribute no edges: make every vertex a
    # self-edge (zero length, zero cross)
    pos = np.arange(len(xs))
    no_edge = ~np.repeat(ring_edges, ring_sizes)
    if no_edge.any():
        nxt = np.where(no_edge, pos, nxt)

    if quantized:
        qx = quantize(xs)
        qy = quantize(ys)
        # ring-BBOX-CENTERED shoelace: |centered coord| <= extent/2
        # (<= 1.8e9 quanta even for a full-world ring), so each cross
        # term stays <= 2*(1.8e9)^2 = 6.5e18 < 2^63 — exact int64 for
        # EVERY legal lon/lat geometry.  (Ring-start centering would
        # overflow past ~214 degrees of extent.)  The summed output
        # itself is the remaining domain edge: |area2_q| of a feature
        # covering > ~46% of the full lon x lat rectangle exceeds
        # int64 — guarded below with a cheap float bound.
        base = np.repeat(np.arange(len(ring_starts)), ring_sizes)
        gx_min = np.minimum.reduceat(qx, ring_starts)
        gx_max = np.maximum.reduceat(qx, ring_starts)
        gy_min = np.minimum.reduceat(qy, ring_starts)
        gy_max = np.maximum.reduceat(qy, ring_starts)
        cxc = (gx_min + gx_max) // 2
        cyc = (gy_min + gy_max) // 2
        bound = np.zeros(n, np.float64)
        np.add.at(bound, ring_feat,
                  2.0 * (gx_max - gx_min).astype(np.float64)
                  * (gy_max - gy_min).astype(np.float64))
        if (bound > 8.5e18).any():
            raise OverflowError(
                "doubled shoelace area exceeds the int64 quantum "
                "domain (feature spans > ~46% of the lon x lat world "
                "rectangle); compute in the float domain instead")
        rx = qx - np.repeat(cxc, ring_sizes)
        ry = qy - np.repeat(cyc, ring_sizes)
        cross = rx * ry[nxt] - rx[nxt] * ry
        ring_area2 = np.zeros(len(ring_starts), np.int64)
        np.add.at(ring_area2, base, cross)
        area2 = np.zeros(n, np.int64)
        np.add.at(area2, ring_feat, ring_area2)
        area2[~is_poly] = 0
        cols["area2_q"] = pa.array(area2, pa.int64())

        mh = np.abs(qx[nxt] - qx) + np.abs(qy[nxt] - qy)
        perim = np.zeros(n, np.int64)
        np.add.at(perim, np.repeat(ring_feat, ring_sizes), mh)
        cols["perim_mh_q"] = pa.array(perim, pa.int64())

    if euclid:
        dx = xs[nxt] - xs
        dy = ys[nxt] - ys
        el = np.sqrt(dx * dx + dy * dy)
        vfeat = np.repeat(ring_feat, ring_sizes)
        length = np.bincount(vfeat, weights=el, minlength=n)
        cols["length_deg"] = pa.array(length)

        # area-weighted centroid (float): sum (v_i + v_{i+1}) * cross_i
        # over polygon rings / (3 * area2); vertex mean elsewhere
        fcross = (xs * ys[nxt] - xs[nxt] * ys)
        numx = np.bincount(vfeat, weights=(xs + xs[nxt]) * fcross,
                           minlength=n)
        numy = np.bincount(vfeat, weights=(ys + ys[nxt]) * fcross,
                           minlength=n)
        farea2 = np.bincount(vfeat, weights=fcross, minlength=n)
        mx = np.bincount(vfeat, weights=xs, minlength=n)
        my = np.bincount(vfeat, weights=ys, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_x = np.where(nver > 0, mx / np.maximum(nver, 1), np.nan)
            mean_y = np.where(nver > 0, my / np.maximum(nver, 1), np.nan)
            use_area = is_poly & (np.abs(farea2) > 1e-30)
            cx = np.where(use_area, numx / (3.0 * farea2), mean_x)
            cy = np.where(use_area, numy / (3.0 * farea2), mean_y)
        cols["centroid_x"] = pa.array(cx)
        cols["centroid_y"] = pa.array(cy)

    return pa.table(cols)


def geometry_measures(ds, *, quantized: bool = True, euclid: bool = True,
                      **map_kwargs):
    """Dataset-level measures: one embarrassingly-parallel
    ``map_batches`` over feature-table blocks (no shuffle; scales
    linearly with input)."""
    return ds.map_batches(
        lambda b: measures_batch(b, quantized=quantized, euclid=euclid),
        batch_format="pyarrow", zero_copy_batch=True, **map_kwargs)


def directed_hausdorff_groups(ds, ref_xy: np.ndarray,
                              ref_codes: np.ndarray, *,
                              x_col: str = "x", y_col: str = "y",
                              code_col: str = "code",
                              ncodes: int | None = None,
                              **map_kwargs):
    """Directed Hausdorff distance between GROUP point sets:
    ``H2(a -> b) = max over a-points of min over b-points of squared
    euclidean distance`` for every ordered group pair (a != b) — the
    set-similarity measure of shape matching / coverage analysis.

    Shape: the reference sets broadcast once (sorted by group, so the
    per-group min collapses to one ``minimum.reduceat`` over the
    distance matrix's columns); the big side STREAMS through a map
    stage whose per-batch kernel is one (m x P) int32 matrix and two
    reduction passes — partials carry only the per-(a, b) running max,
    and the driver-side combine is |groups|^2 cells.  For reference
    sets too big to broadcast, use the cell-join kNN machinery
    instead; this operator targets the many-vs-small-reference shape.

    Coordinates must be integers with |dx^2 + dy^2| < 2^31 (int32
    matrix — guarded)."""
    from ..collect import collect_table

    order = np.argsort(ref_codes, kind="stable")
    rxy = np.ascontiguousarray(ref_xy[order], dtype=np.int64)
    rc = ref_codes[order].astype(np.int64)
    K = int(ncodes if ncodes is not None else (rc.max() + 1 if len(rc)
                                               else 0))
    seg_starts = np.searchsorted(rc, np.arange(K))
    seg_has = np.searchsorted(rc, np.arange(K), side="right") > seg_starts
    span = float(np.abs(rxy).max()) if len(rxy) else 0.0

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], pa.int64()),
                          "maxmin": pa.array([], pa.int64())})
        if b.num_rows == 0 or len(rc) == 0:
            return empty
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        code = b[code_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if (max(float(np.abs(x).max()), float(np.abs(y).max()), span)
                > 32000):
            raise ValueError("directed_hausdorff_groups: coordinates "
                             "exceed the int32 distance bound")
        dx = x[:, None] - rxy[:, 0][None, :]
        dy = y[:, None] - rxy[:, 1][None, :]
        d2 = (dx * dx + dy * dy).astype(np.int32)
        # per-row min within each reference group: reduceat over the
        # group-sorted columns (empty groups yield garbage — masked)
        mins = np.minimum.reduceat(d2, seg_starts, axis=1)
        # max over the batch rows per (row-group, ref-group) cell
        out = np.full(K * K, -1, np.int64)
        pairidx = code[:, None] * K + np.arange(K)[None, :]
        np.maximum.at(out, pairidx.ravel(),
                      mins.astype(np.int64).ravel())
        valid = np.zeros(K * K, bool)
        vp = np.unique(pairidx)
        valid[vp] = True
        # mask: empty ref groups and the diagonal never emit
        pa_, pb_ = np.divmod(np.arange(K * K), K)
        keep = valid & seg_has[pb_] & (pa_ != pb_) & (out >= 0)
        sel = np.flatnonzero(keep)
        return pa.table({"pair": pa.array(sel),
                         "maxmin": pa.array(out[sel])})

    parts = collect_table(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        **map_kwargs))
    pairs = parts["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
    mm = parts["maxmin"].to_numpy(zero_copy_only=False).astype(np.int64)
    agg = np.full(K * K, -1, np.int64)
    np.maximum.at(agg, pairs, mm)
    sel = np.flatnonzero(agg >= 0)
    return pa.table({"code_a": pa.array(sel // K),
                     "code_b": pa.array(sel % K),
                     "hausdorff_d2": pa.array(agg[sel])})


def discrete_frechet_pairs(ax: np.ndarray, ay: np.ndarray,
                           bx: np.ndarray, by: np.ndarray) -> np.ndarray:
    """Discrete Fréchet distance (squared euclidean, exact int64) for
    MANY sequence pairs at once: inputs are (npairs, m) / (npairs, p)
    integer coordinate arrays; the classic Eiter–Mannila DP runs
    sequentially over the small (i, j) grid with every cell one
    vectorized op ACROSS pairs — the pair set is the parallel
    dimension, never a Python loop body.

    Ragged sequences pad by REPEATING their last point: the discrete
    Fréchet distance is invariant under consecutive duplication (a
    coupling may hold one side still), so the padded terminal equals
    the unpadded answer — asserted against the scalar DP in tests.
    Coordinates are guarded to |v| < 2^31 so squared distances stay
    exact int64."""
    for arr in (ax, ay, bx, by):
        if arr.size and int(np.abs(arr).max()) >= 1 << 31:
            raise OverflowError("discrete_frechet_pairs: |coord| < 2^31")
    npairs, m = ax.shape
    p = bx.shape[1]
    prev = np.empty((npairs, p), np.int64)
    cur = np.empty((npairs, p), np.int64)
    for i in range(m):
        for j in range(p):
            dx = ax[:, i] - bx[:, j]
            dy = ay[:, i] - by[:, j]
            dd = dx * dx + dy * dy
            if i == 0 and j == 0:
                cur[:, 0] = dd
            elif i == 0:
                cur[:, j] = np.maximum(cur[:, j - 1], dd)
            elif j == 0:
                cur[:, j] = np.maximum(prev[:, 0], dd)
            else:
                cur[:, j] = np.maximum(dd, np.minimum(
                    np.minimum(prev[:, j], prev[:, j - 1]),
                    cur[:, j - 1]))
        prev, cur = cur, prev
    return prev[:, p - 1].copy()


def viterbi_decode_costs(emit: np.ndarray, lam: int) -> tuple:
    """Exact Viterbi decode over an |rank-distance| transition model —
    the HMM map-matching core: ``emit`` is (n_seqs, n_steps, n_states)
    int64 emission costs, transition(p -> s) = ``lam * |p - s|`` in
    state-rank space.  The min-plus convolution with an L1 kernel
    collapses to TWO running-minimum accumulates per step (the same
    separability the L1 distance transform exploits), so each step is
    O(states) vectorized across sequences — never the states² naive
    product.  Returns (total_cost, last_state) per sequence, the
    argmin final state tie-breaking to the smallest rank."""
    u, t, s = emit.shape
    if s == 0 or t == 0:
        raise ValueError("viterbi_decode_costs: empty grid")
    ranks = np.arange(s, dtype=np.int64)
    bound = int(np.abs(emit).max(initial=0))
    if (bound + lam * s) * t >= 1 << 62:
        raise OverflowError("viterbi_decode_costs: cost accumulation "
                            "exceeds int64")
    c = emit[:, 0, :].astype(np.int64).copy()
    for step in range(1, t):
        fwd = np.minimum.accumulate(c - lam * ranks, axis=1) \
            + lam * ranks
        bwd = np.minimum.accumulate(
            (c + lam * ranks)[:, ::-1], axis=1)[:, ::-1] - lam * ranks
        c = emit[:, step, :] + np.minimum(fwd, bwd)
    best = np.argmin(c, axis=1)  # first minimum = smallest rank
    return c[np.arange(u), best], best


def token_edit_distance_pairs(a_codes: np.ndarray, b_codes: np.ndarray,
                              len_a: np.ndarray,
                              len_b: np.ndarray) -> np.ndarray:
    """Levenshtein distance between MANY token-code sequence pairs at
    once (unit insert/delete/substitute — the Wagner–Fischer DP, the
    token-level twin of strjoin's byte-level Myers kernel): inputs are
    (npairs, m) / (npairs, p) padded int arrays with true lengths; the
    DP runs sequentially over the small grid with every cell one
    vectorized op ACROSS pairs, and each pair's answer reads at its
    own true terminal — cells beyond a pair's true lengths are
    computed but never read (a DP cell depends only on smaller
    indices, so padding cannot contaminate the terminal)."""
    npairs, m = a_codes.shape
    p = b_codes.shape[1]
    prev = np.arange(p + 1, dtype=np.int64)[None, :].repeat(npairs, 0)
    out = np.zeros(npairs, np.int64)
    done_b0 = len_a == 0
    out[done_b0] = len_b[done_b0]
    for i in range(1, m + 1):
        cur = np.empty((npairs, p + 1), np.int64)
        cur[:, 0] = i
        for j in range(1, p + 1):
            neq = (a_codes[:, i - 1] != b_codes[:, j - 1]) \
                .astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + neq)
        hit = len_a == i
        if hit.any():
            out[hit] = cur[hit, len_b[hit]]
        prev = cur
    return out


def dtw_distance_pairs(ax: np.ndarray, ay: np.ndarray,
                       bx: np.ndarray, by: np.ndarray,
                       len_a: np.ndarray,
                       len_b: np.ndarray) -> np.ndarray:
    """Dynamic-time-warping distance between MANY trajectory pairs at
    once — the alignment-tolerant trajectory similarity the pointwise
    (Frechet / Hausdorff) measures cannot express.  Cell cost is the
    exact integer SQUARED Euclidean distance, steps are the classic
    (i-1,j), (i,j-1), (i-1,j-1) — i.e. DTW == min-cost monotone path
    where entering cell (i,j) costs d(i,j), which is also the
    recursive-CTE formulation the SQL twin walks.  Same shape as
    :func:`token_edit_distance_pairs`: (npairs, m)/(npairs, p) padded
    int coordinate arrays with true lengths, every DP cell one
    vectorized op ACROSS pairs, each pair reading its answer at its
    own true terminal (cells depend only on smaller indices, so
    padding cannot contaminate).  Lengths must be >= 1."""
    if (len_a < 1).any() or (len_b < 1).any():
        raise ValueError("DTW needs non-empty trajectories")
    npairs, m = ax.shape
    p = bx.shape[1]
    out = np.zeros(npairs, np.int64)
    prev = None
    for i in range(m):
        cur = np.empty((npairs, p), np.int64)
        for j in range(p):
            dij = (ax[:, i] - bx[:, j]) ** 2 \
                + (ay[:, i] - by[:, j]) ** 2
            if i == 0 and j == 0:
                cur[:, 0] = dij
            elif i == 0:
                cur[:, j] = cur[:, j - 1] + dij
            elif j == 0:
                cur[:, 0] = prev[:, 0] + dij
            else:
                cur[:, j] = dij + np.minimum(
                    np.minimum(prev[:, j], cur[:, j - 1]),
                    prev[:, j - 1])
        hit = len_a == i + 1
        if hit.any():
            out[hit] = cur[hit, len_b[hit] - 1]
        prev = cur
    return out
