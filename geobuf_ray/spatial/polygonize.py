"""Raster -> vector polygonize: distributed connected-component
labeling (CCL) over tiled occupancy masks.

Completes the raster<->vector pair (north_rule): ``rasterize_polygons``
goes vector->raster; this goes back — equal-valued 4-connected pixel
regions become vector records (component id, pixel count, bbox), the
GDAL-polygonize shape re-expressed Ray-first as TWO-LEVEL CCL:

1. **Local** (``map_batches``, embarrassingly parallel): run-based CCL
   inside each tile — horizontal runs found with one ``diff`` over the
   padded bit matrix, run-adjacency pairs with two segmented
   ``searchsorted``, then vectorized min-label + pointer jumping.
   Emits per-tile REGION rows (min-pixel-id label, count, bbox) and
   boundary STRIP rows — only O(perimeter) data leaves a tile.
2. **Global** (region graph, |regions| << |pixels|): strips co-group
   by shared tile edge and emit region-region equivalence edges; the
   engine's own ``connected_components`` (pointer-doubling label
   propagation, functions/graph.py) resolves them; self-loops keep
   interior-only regions alive.

The final component id is the minimum global pixel id
(``gy * W + gx``, ``W = ntiles * px``) of the region — deterministic
and SQL-reproducible (the oracle's recursive-CTE closure computes MIN
over reachable pixel ids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_I64 = pa.int64()
_TAG_SCHEMA = pa.schema([("kind", pa.int8()), ("c0", _I64), ("c1", _I64),
                         ("c2", _I64), ("c3", _I64), ("c4", _I64),
                         ("c5", _I64)])


def _tagged(kind, c0, c1, c2, c3, c4, c5) -> pa.Table:
    n = len(c0)
    return pa.table({
        "kind": pa.array(np.full(n, kind, np.int8)),
        "c0": pa.array(np.asarray(c0, np.int64)),
        "c1": pa.array(np.asarray(c1, np.int64)),
        "c2": pa.array(np.asarray(c2, np.int64)),
        "c3": pa.array(np.asarray(c3, np.int64)),
        "c4": pa.array(np.asarray(c4, np.int64)),
        "c5": pa.array(np.asarray(c5, np.int64))})


def _binary_rows(masks: pa.ChunkedArray | pa.Array, n: int,
                 nbytes: int) -> np.ndarray:
    """(n, nbytes) uint8 view of an equal-width binary column."""
    ba = masks.combine_chunks() if isinstance(masks, pa.ChunkedArray) \
        else masks
    bufs = ba.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[ba.offset: ba.offset + n + 1]
    if not (np.diff(offs) == nbytes).all():
        raise ValueError(f"mask rows are not all {nbytes} bytes")
    data = np.frombuffer(bufs[2], np.uint8)
    return data[offs[0]:offs[0] + n * nbytes].reshape(n, nbytes)


def _mask_bits(masks: pa.ChunkedArray | pa.Array, n: int, px: int):
    """(n, px, px) bool bits from the packed mask column (row-major
    (y, x) bit order, matching rasterize_batch)."""
    flat = _binary_rows(masks, n, px * px // 8)
    return np.unpackbits(flat, axis=1).astype(bool).reshape(n, px, px)


def union_tile_masks(raster_ds, *, px: int, nbuckets: int = 16,
                     **map_kwargs):
    """OR all per-polygon masks of a tile into one occupancy row
    (tile_x, tile_y, mask) — one hash exchange on the tile key."""
    from ..functions.exchange import grouped_exchange

    nbytes = px * px // 8
    schema = pa.schema([("tile_x", _I64), ("tile_y", _I64),
                        ("mask", pa.binary())])

    def group_fn(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        flat = _binary_rows(tbl["mask"], n, nbytes)
        u = np.bitwise_or.reduce(flat, axis=0)
        return pa.table({
            "tile_x": tbl["tile_x"].slice(0, 1),
            "tile_y": tbl["tile_y"].slice(0, 1),
            "mask": pa.array([u.tobytes()], pa.binary())})

    return grouped_exchange(raster_ds, ["tile_x", "tile_y"], group_fn,
                            nbuckets=nbuckets, schema=schema, **map_kwargs)


def _local_ccl_batch(batch: pa.Table, *, ntiles: int, px: int) -> pa.Table:
    """Per-tile run-based CCL, vectorized across the whole batch.

    Emits kind=0 REGION rows (c0=min-pixel-id, c1=n_pixels, c2=min_gx,
    c3=min_gy, c4=max_gx, c5=max_gy) and kind=1 STRIP rows (c0=edge id,
    c1=side, c2=pos, c3=region id) for set pixels on shared tile
    borders."""
    n = batch.num_rows
    if n == 0:
        return _TAG_SCHEMA.empty_table()
    W = ntiles * px
    tx = batch["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64)
    ty = batch["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
    bits = _mask_bits(batch["mask"], n, px)

    # --- horizontal runs: one diff over the zero-padded bit matrix ---
    padded = np.zeros((n * px, px + 2), np.int8)
    padded[:, 1:-1] = bits.reshape(n * px, px)
    d = np.diff(padded, axis=1)
    srow, x0 = np.nonzero(d == 1)     # run starts (row-major order)
    _, x1 = np.nonzero(d == -1)       # aligned exclusive ends
    nruns = len(srow)
    if nruns == 0:
        return _TAG_SCHEMA.empty_table()
    tile_i = srow // px
    y = srow % px

    # --- run-adjacency pairs: segmented two-searchsorted interval join
    # (segment = flat row id; a probe looks at the row ABOVE, which is
    # in the same tile iff y > 0 — tile borders stitch via strips) ---
    K = px + 2
    comp_x0 = srow * K + x0
    comp_x1 = srow * K + x1
    probe = np.flatnonzero(y > 0)
    p_seg = srow[probe] - 1
    a = np.searchsorted(comp_x0, p_seg * K + x1[probe], side="left")
    b = np.searchsorted(comp_x1, p_seg * K + x0[probe], side="right")
    cnt = a - b
    pu = np.repeat(probe, cnt)
    pv = (np.repeat(b, cnt) + np.arange(int(cnt.sum()))
          - np.repeat(np.cumsum(cnt) - cnt, cnt))

    # --- vectorized min-label union: minimum.at + pointer jumping ---
    lab = np.arange(nruns, dtype=np.int64)
    while len(pu):
        old = lab
        m = np.minimum(lab[pu], lab[pv])
        lab = lab.copy()
        np.minimum.at(lab, pu, m)
        np.minimum.at(lab, pv, m)
        while True:
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, old):
            break

    # --- per-region stats; label = min global pixel id of the region
    gx0 = tx[tile_i] * px + x0
    gx1 = tx[tile_i] * px + x1          # exclusive
    gy = ty[tile_i] * px + y
    run_gid = gy * W + gx0
    uniq, inv = np.unique(lab, return_inverse=True)
    nreg = len(uniq)
    big = np.iinfo(np.int64).max
    gid = np.full(nreg, big, np.int64)
    np.minimum.at(gid, inv, run_gid)
    npix = np.bincount(inv, weights=(x1 - x0).astype(np.float64),
                       minlength=nreg).astype(np.int64)
    mnx = np.full(nreg, big, np.int64)
    np.minimum.at(mnx, inv, gx0)
    mxx = np.full(nreg, -1, np.int64)
    np.maximum.at(mxx, inv, gx1 - 1)
    mny = np.full(nreg, big, np.int64)
    np.minimum.at(mny, inv, gy)
    mxy = np.full(nreg, -1, np.int64)
    np.maximum.at(mxy, inv, gy)
    parts = [_tagged(0, gid, npix, mnx, mny, mxx, mxy)]

    # --- boundary strips (only set pixels on shared borders) ---
    rg = gid[inv]                       # region id per run
    nt2 = ntiles * ntiles
    right = np.flatnonzero((x1 == px) & (tx[tile_i] < ntiles - 1))
    if len(right):
        r = right
        parts.append(_tagged(1, ty[tile_i[r]] * ntiles + tx[tile_i[r]],
                             np.zeros(len(r)), y[r], rg[r],
                             np.zeros(len(r)), np.zeros(len(r))))
    left = np.flatnonzero((x0 == 0) & (tx[tile_i] > 0))
    if len(left):
        r = left
        parts.append(_tagged(1, ty[tile_i[r]] * ntiles + tx[tile_i[r]] - 1,
                             np.ones(len(r)), y[r], rg[r],
                             np.zeros(len(r)), np.zeros(len(r))))

    def expand(rows, edge, side):
        w = (x1[rows] - x0[rows]).astype(np.int64)
        rr = np.repeat(rows, w)
        pos = (x0[rows].repeat(w)
               + np.arange(int(w.sum())) - np.repeat(np.cumsum(w) - w, w)
               + tx[tile_i[rr]] * px)   # global gx disambiguates pos
        return _tagged(1, np.repeat(edge, w), np.full(len(rr), side),
                       pos, rg[rr], np.zeros(len(rr)), np.zeros(len(rr)))

    bot = np.flatnonzero((y == px - 1) & (ty[tile_i] < ntiles - 1))
    if len(bot):
        parts.append(expand(bot, nt2 + ty[tile_i[bot]] * ntiles
                            + tx[tile_i[bot]], 0))
    top = np.flatnonzero((y == 0) & (ty[tile_i] > 0))
    if len(top):
        parts.append(expand(top, nt2 + (ty[tile_i[top]] - 1) * ntiles
                            + tx[tile_i[top]], 1))
    return pa.concat_tables(parts)


def _stitch_group(tbl: pa.Table) -> pa.Table:
    """One shared tile edge: match side-0 / side-1 set pixels on equal
    ``pos`` and emit region equivalence edges."""
    side = tbl["c1"].to_numpy(zero_copy_only=False)
    pos = tbl["c2"].to_numpy(zero_copy_only=False)
    rg = tbl["c3"].to_numpy(zero_copy_only=False)
    i0 = np.flatnonzero(side == 0)
    i1 = np.flatnonzero(side == 1)
    if len(i0) == 0 or len(i1) == 0:
        return pa.table({"src": pa.array([], _I64),
                         "dst": pa.array([], _I64)})
    o0 = i0[np.argsort(pos[i0])]
    o1 = i1[np.argsort(pos[i1])]
    # positions are unique per side, so one searchsorted matches them
    loc = np.searchsorted(pos[o0], pos[o1])
    loc = np.clip(loc, 0, len(o0) - 1)
    hit = pos[o0][loc] == pos[o1]
    u, v = rg[o0[loc[hit]]], rg[o1[hit]]
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    return pa.table({"src": pa.array(uv[:, 0]), "dst": pa.array(uv[:, 1])})


def polygonize(raster_ds, *, ntiles: int, px: int, nbuckets: int = 16,
               pre_unioned: bool = False) -> pa.Table:
    """Tiled raster occupancy -> vector regions.

    ``raster_ds``: rows (tile_x, tile_y, mask) — per-polygon rows from
    ``rasterize_polygons`` (unioned here) or pre-unioned occupancy
    (``pre_unioned=True``).  Returns a pyarrow Table
    (component, n_pixels, min_gx, min_gy, max_gx, max_gy) sorted by
    component, where ``component`` is the region's minimum global
    pixel id ``gy * (ntiles * px) + gx``."""
    import ray

    from ..functions.exchange import grouped_exchange
    from ..functions.graph import connected_components

    occ = raster_ds if pre_unioned else \
        union_tile_masks(raster_ds, px=px, nbuckets=nbuckets)

    def ccl(batch: pa.Table) -> pa.Table:
        return _local_ccl_batch(batch, ntiles=ntiles, px=px)

    tagged = occ.map_batches(ccl, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def only(kind: int):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "kind" not in b.column_names:
                return _TAG_SCHEMA.empty_table()
            return b.filter(pc.equal(b["kind"], kind))
        return fn

    regions = tagged.map_batches(only(0), batch_format="pyarrow",
                                 zero_copy_batch=True)
    strips = tagged.map_batches(only(1), batch_format="pyarrow",
                                zero_copy_batch=True)

    edge_schema = pa.schema([("src", _I64), ("dst", _I64)])
    cross = grouped_exchange(strips, "c0", _stitch_group,
                             nbuckets=nbuckets, schema=edge_schema)

    def loops(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["c0"], "dst": b["c0"]})

    self_loops = regions.map_batches(loops, batch_format="pyarrow",
                                     zero_copy_batch=True)
    comp = connected_components(cross.union(self_loops),
                                src="src", dst="dst", nbuckets=nbuckets)

    # broadcast the (small, one row per region) label map; relabel and
    # partially aggregate per block, final-combine on the driver
    node = comp["node"].to_numpy(zero_copy_only=False)
    label = comp["component"].to_numpy(zero_copy_only=False)
    order = np.argsort(node)
    ref = ray.put((node[order], label[order]))

    def relabel_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "component": pa.array([], _I64),
                "n_pixels": pa.array([], _I64),
                "min_gx": pa.array([], _I64), "min_gy": pa.array([], _I64),
                "max_gx": pa.array([], _I64), "max_gy": pa.array([], _I64)})
        nodes, labels = ray.get(ref)
        g = b["c0"].to_numpy(zero_copy_only=False)
        lab = labels[np.searchsorted(nodes, g)]
        t = pa.table({"component": pa.array(lab),
                      "n_pixels": b["c1"], "min_gx": b["c2"],
                      "min_gy": b["c3"], "max_gx": b["c4"],
                      "max_gy": b["c5"]})
        return t.group_by("component").aggregate(
            [("n_pixels", "sum"), ("min_gx", "min"), ("min_gy", "min"),
             ("max_gx", "max"), ("max_gy", "max")]).rename_columns(
            ["component", "n_pixels", "min_gx", "min_gy",
             "max_gx", "max_gy"])

    from ..collect import collect_table

    partials = collect_table(regions.map_batches(
        relabel_partial, batch_format="pyarrow", zero_copy_batch=True))
    out = partials.group_by("component").aggregate(
        [("n_pixels", "sum"), ("min_gx", "min"), ("min_gy", "min"),
         ("max_gx", "max"), ("max_gy", "max")]).rename_columns(
        ["component", "n_pixels", "min_gx", "min_gy", "max_gx", "max_gy"])
    return out.sort_by("component")
