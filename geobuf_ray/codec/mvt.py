"""Mapbox Vector Tile (MVT) encoder — the tile SERVING format, on top
of the engine's tile pipeline.

The reference's flagship splits features into per-tile geobuf subfiles
(split_combine.go:244-257, tileclip.ClipFeature); the web-map consumer
of that layout is a vector-tile endpoint.  This module closes that last
mile: clipped per-tile features (``pipelines.tiling.tile_clip`` output)
encode into spec-compliant MVT protobuf tiles, per the PUBLIC
Mapbox Vector Tile spec v2.1 (github.com/mapbox/vector-tile-spec).

Layout per spec: a Tile holds Layers (field 3); a Layer holds
version=2 (15), name (1), Features (2), keys (3), values (4), extent
(5); a Feature holds id (1), packed key/value-index tags (2), type (3)
and a packed command-integer geometry (4) — MoveTo/LineTo/ClosePath
with zigzag-delta parameters in tile-local integer coordinates, the
same varint-delta discipline as the geobuf codec itself
(reference write_feature.go), so the whole encoder rides the existing
vectorized varint/zigzag/ramp primitives (codec/varint).

Vectorization shape: geometry (quantize -> open rings -> dedup ->
orientation -> command stream -> varints) is computed in ONE pass over
the whole batch regardless of how many tiles it spans; only the final
per-LAYER assembly (value dictionaries are per layer by spec) walks
tiles, with all inner work still array ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import varint as vi
from .schema import list_column_parts

MVT_EXTENT = 4096
_MAX_LAT = 85.05112877980659

MVT_TILE_SCHEMA = pa.schema([
    ("tile_key", pa.uint64()), ("zoom", pa.int32()),
    ("tile_x", pa.int32()), ("tile_y", pa.int32()),
    ("mvt", pa.binary()), ("features", pa.int64()),
    ("nbytes", pa.int64()),
])

_GEOM_COLS = ("geom_type", "dim", "coords", "ring_sizes", "poly_sizes")
# tile bookkeeping columns a tile_clip output carries besides props
_AUX_COLS = ("tile_key", "tile_str", "tile_salt")


def _quantize(xs, ys, zoom: int, extent: int):
    """lon/lat -> GLOBAL integer mercator-pixel coords at
    ``zoom``/``extent`` (tile-local follows by subtracting
    tile_index*extent) — half-away-from-zero rounding so the
    convention is pinned, not numpy's banker's default."""
    n = float(1 << zoom) * extent
    px = np.floor((xs + 180.0) / 360.0 * n + 0.5).astype(np.int64)
    lat = np.clip(ys, -_MAX_LAT, _MAX_LAT)
    lr = np.radians(lat)
    py = np.floor(
        (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n
        + 0.5
    ).astype(np.int64)
    return px, py


def _compact(x, y, sizes, keep):
    """Drop vertices where ``keep`` is False; return new (x, y, sizes)."""
    part_of = np.repeat(np.arange(len(sizes)), sizes)
    new_sizes = np.bincount(part_of[keep], minlength=len(sizes))
    return x[keep], y[keep], new_sizes.astype(np.int64)


def _tag(field: int, wire: int) -> bytes:
    return vi.encode_varint_scalar((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return (_tag(field, 2) + vi.encode_varint_scalar(len(payload))
            + payload)


def _value_bytes(arr: pa.Array) -> list[bytes]:
    """Layer-level ``values`` entries (wrapped Value messages) for the
    UNIQUE values ``arr`` — one spec-typed message per value:
    string (1), double (3), sint64 (6), bool (7)."""
    t = arr.type
    out = []
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        for s in arr.to_pylist():
            b = s.encode()
            inner = b"\x0a" + vi.encode_varint_scalar(len(b)) + b
            out.append(_len_delim(4, inner))
    elif pa.types.is_integer(t):
        for v in arr.to_pylist():
            zz = (int(v) << 1) ^ (int(v) >> 63)
            out.append(_len_delim(4, b"\x30"
                                  + vi.encode_varint_scalar(zz)))
    elif pa.types.is_boolean(t):
        for v in arr.to_pylist():
            out.append(_len_delim(4, b"\x38" + bytes([int(v)])))
    elif pa.types.is_floating(t):
        for v in arr.to_pylist():
            inner = b"\x19" + np.float64(v).tobytes()
            out.append(_len_delim(4, inner))
    else:
        raise ValueError(f"MVT value type unsupported: {t}")
    return out


def encode_mvt_batch(batch: pa.Table, zoom: int, *,
                     extent: int = MVT_EXTENT,
                     layer_name: str = "layer",
                     prop_cols: list[str] | None = None,
                     id_col: str = "id") -> pa.Table:
    """Clipped per-tile feature rows -> one MVT tile blob per distinct
    ``tile_key`` in the batch.

    Input is the ``tile_clip`` output schema (geometry columns +
    ``tile_key`` + ride-along property columns).  Rows of one tile
    must be contiguous is NOT required — tiles are resolved by key —
    but the per-layer feature order is the batch row order, so callers
    wanting deterministic bytes should sort first.

    Spec obligations handled here: GeoJSON ring closures drop (MVT
    rings close implicitly via ClosePath), consecutive duplicate
    vertices collapse after quantization, degenerate parts drop
    (lines < 2 points, rings < 3 points or zero area — a polygon whose
    EXTERIOR dies takes its holes with it), and ring winding is
    enforced (exterior positive shoelace area in y-down tile coords,
    interior negative, spec §4.3.3.3).

    Returns one row per tile: ``tile_key, zoom, tile_x, tile_y, mvt
    (binary), features, nbytes``.
    """
    from ..spatial import tiles

    n = batch.num_rows
    if n == 0:
        return MVT_TILE_SCHEMA.empty_table()
    if prop_cols is None:
        prop_cols = [c for c in batch.column_names
                     if c not in _GEOM_COLS + _AUX_COLS
                     and c != id_col]

    gt = (batch["geom_type"].combine_chunks()
          .to_numpy(zero_copy_only=False).astype(np.int64))
    if "dim" in batch.column_names:
        dim = (batch["dim"].combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        if (dim != 2).any():
            raise ValueError("MVT encodes dim-2 geometry only")
    coords, offs = list_column_parts(batch["coords"], np.float64)
    rs, rs_offs = list_column_parts(batch["ring_sizes"], np.int64)
    ps, ps_offs = list_column_parts(batch["poly_sizes"], np.int64)
    keys = (batch["tile_key"].combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.uint64))
    _, txs, tys = tiles.unpack(keys)

    # ---- quantize to tile-local ints (batch-wide) -------------------
    vcounts = np.diff(offs) // 2          # vertices per feature
    if int(rs.sum()) != int(vcounts.sum()):
        raise ValueError("ring_sizes inconsistent with coords")
    vfeat = np.repeat(np.arange(n), vcounts)
    px, py = _quantize(coords[0::2], coords[1::2], zoom, extent)
    x = px - txs.astype(np.int64)[vfeat] * extent
    y = py - tys.astype(np.int64)[vfeat] * extent

    # ---- parts = ring_sizes entries, kind from the feature type -----
    parts_per_feat = np.diff(rs_offs)
    part_feat = np.repeat(np.arange(n), parts_per_feat)
    pgt = gt[part_feat]
    ringk = (pgt == 3) | (pgt == 6)
    linek = (pgt == 2) | (pgt == 5)
    sizes = rs.copy()

    # drop the GeoJSON closing vertex of closed rings
    starts = np.cumsum(sizes) - sizes
    ends = np.cumsum(sizes)
    closed = ringk & (sizes > 1)
    if closed.any():
        c_last = ends[closed] - 1
        c_first = starts[closed]
        dup = (x[c_last] == x[c_first]) & (y[c_last] == y[c_first])
        keep = np.ones(len(x), bool)
        keep[c_last[dup]] = False
        x, y, sizes = _compact(x, y, sizes, keep)

    # collapse consecutive duplicate vertices (post-quantization runs)
    starts = np.cumsum(sizes) - sizes
    is_start = np.zeros(len(x), bool)
    is_start[starts[sizes > 0]] = True
    neq = np.ones(len(x), bool)
    neq[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    x, y, sizes = _compact(x, y, sizes, is_start | neq)

    # ---- ring area / winding / validity -----------------------------
    starts = np.cumsum(sizes) - sizes
    ends = np.cumsum(sizes)
    area2 = np.zeros(len(sizes), np.int64)
    ridx = np.flatnonzero(ringk & (sizes >= 3))
    if len(ridx):
        rsz = sizes[ridx]
        rstart = starts[ridx]
        vid = np.repeat(rstart, rsz) + vi.ramp(rsz)
        nxt = vid + 1
        nxt[np.cumsum(rsz) - 1] = rstart  # cyclic close per ring
        cross = x[vid] * y[nxt] - x[nxt] * y[vid]
        area2[ridx] = np.add.reduceat(cross, np.cumsum(rsz) - rsz)

    pointk = ~ringk & ~linek
    valid = ((pointk & (sizes >= 1))
             | (linek & (sizes >= 2))
             | (ringk & (sizes >= 3) & (area2 != 0)))

    # exterior = first ring of its polygon; spec: exterior area > 0,
    # interior < 0 (tile y grows down).  Polygon grouping: poly_sizes
    # entries are rings-per-polygon in part order.
    if int(ps.sum()) != len(sizes):
        raise ValueError("poly_sizes inconsistent with ring_sizes")
    ring_in_poly = vi.ramp(ps)
    is_ext = ring_in_poly == 0
    # a dead exterior takes its interior rings down with it
    poly_of_part = np.repeat(np.arange(len(ps)), ps)
    ext_alive = np.ones(len(ps), bool)
    ext_alive[poly_of_part[ringk & is_ext & ~valid]] = False
    valid &= ext_alive[poly_of_part] | ~ringk
    reverse = (ringk & valid
               & ((is_ext & (area2 < 0)) | (~is_ext & (area2 > 0))))

    # ---- final vertex order: valid parts, reversed where needed -----
    vsz = np.where(valid, sizes, 0)
    r = vi.ramp(vsz)
    part_rep = np.repeat(np.arange(len(sizes)), vsz)
    fwd = starts[part_rep] + r
    rev = starts[part_rep] + vsz[part_rep] - 1 - r
    gidx = np.where(reverse[part_rep], rev, fwd)
    fx, fy = x[gidx], y[gidx]

    # ---- per-feature zigzag deltas (cursor starts at 0,0 per spec) --
    fsz = np.bincount(part_feat, weights=vsz,
                      minlength=n).astype(np.int64)
    fstarts = np.cumsum(fsz) - fsz
    dx, dy = fx.copy(), fy.copy()
    dx[1:] -= fx[:-1]
    dy[1:] -= fy[:-1]
    nz = fstarts[fsz > 0]
    dx[nz], dy[nz] = fx[nz], fy[nz]
    zz = np.empty(2 * len(fx), np.uint32)
    zz[0::2] = vi.zigzag_encode(dx).astype(np.uint32)
    zz[1::2] = vi.zigzag_encode(dy).astype(np.uint32)

    # ---- command-integer stream --------------------------------------
    # point part: [Move|m]  2m params
    # line  part: [Move|1] p p [Line|m-1]  2(m-1) params
    # ring  part: line layout + [Close|1]
    vp = valid & (vsz > 0)
    out_len = np.zeros(len(sizes), np.int64)
    out_len[vp & pointk] = 1 + 2 * vsz[vp & pointk]
    out_len[vp & linek] = 2 + 2 * vsz[vp & linek]
    out_len[vp & ringk] = 3 + 2 * vsz[vp & ringk]
    ostarts = np.cumsum(out_len) - out_len
    stream = np.zeros(int(out_len.sum()), np.uint32)
    mv = np.flatnonzero(vp)
    cnt = np.where(pointk[mv], vsz[mv], 1)
    stream[ostarts[mv]] = (1 | (cnt << 3)).astype(np.uint32)
    lr = np.flatnonzero(vp & (linek | ringk))
    stream[ostarts[lr] + 3] = (2 | ((vsz[lr] - 1) << 3)).astype(np.uint32)
    rg = np.flatnonzero(vp & ringk)
    stream[ostarts[rg] + 2 * vsz[rg] + 2] = np.uint32(15)  # ClosePath|1
    # params: per-part contiguous slice of zz; line/ring skip the
    # LineTo slot after the first pair
    j = vi.ramp(2 * vsz[vp])
    prep = np.repeat(np.arange(len(mv)), 2 * vsz[mv])
    lrk = (linek | ringk)[mv]
    # line/ring params after the first pair sit ONE slot later (the
    # LineTo command occupies s+3)
    dst = ostarts[mv][prep] + 1 + j + ((j >= 2) & lrk[prep])
    stream[dst] = zz  # zz is already in final emit order
    geom_bytes, geom_nb = vi.varint_encode(stream)

    # per-feature stream spans -> per-feature geometry byte spans
    f_outlen = np.bincount(part_feat, weights=out_len,
                           minlength=n).astype(np.int64)
    f_ostarts = np.cumsum(f_outlen) - f_outlen
    f_bytes = np.zeros(n, np.int64)
    nzf = f_outlen > 0
    if nzf.any():
        f_bytes[nzf] = np.add.reduceat(geom_nb, f_ostarts[nzf])
    f_bstarts = np.cumsum(f_bytes) - f_bytes

    # MVT geometry type per feature: 1 point, 2 line, 3 polygon
    mtype = np.where((gt == 1) | (gt == 4), 1,
                     np.where((gt == 2) | (gt == 5), 2, 3))
    feat_alive = f_outlen > 0

    # ---- per-layer assembly (value dicts are per layer by spec) -----
    uniq, inv = np.unique(keys, return_inverse=True)
    rows_of_tile = [np.flatnonzero(inv == t) for t in range(len(uniq))]

    id_vals = None
    if id_col in batch.column_names:
        c = batch[id_col].combine_chunks()
        if pa.types.is_integer(c.type):
            mask = (~c.is_null().to_numpy(zero_copy_only=False)
                    if c.null_count else np.ones(n, bool))
            v = c.fill_null(0).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            id_vals = (v, mask & (v >= 0))

    key_block = b"".join(_len_delim(3, k.encode()) for k in prop_cols)
    tiles_out = {"tile_key": [], "zoom": [], "tile_x": [], "tile_y": [],
                 "mvt": [], "features": [], "nbytes": []}
    for t, rows in enumerate(rows_of_tile):
        rows = rows[feat_alive[rows]]
        if len(rows) == 0:
            continue  # every feature degenerated: no tile at all
        # per-layer value dictionary: first-appearance order per column
        vals_block = []
        tag_pairs = []  # per column: (rowpos, key_idx, val_idx)
        nvals = 0
        for ci, cname in enumerate(prop_cols):
            col = batch[cname].combine_chunks().take(
                pa.array(rows, pa.int64()))
            d = pc.dictionary_encode(col)
            idx = d.indices.fill_null(-1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            vals_block.extend(_value_bytes(d.dictionary))
            ok = np.flatnonzero(idx >= 0)
            tag_pairs.append((ok, ci, idx[ok] + nvals))
            nvals += len(d.dictionary)
        # feature-major tags: (row, col) sorted by row then col
        m = len(rows)
        tag_cnt = np.zeros(m, np.int64)
        flat_rows, flat_k, flat_v = [], [], []
        for ok, ci, vidx in tag_pairs:
            tag_cnt[ok] += 2
            flat_rows.append(ok)
            flat_k.append(np.full(len(ok), ci, np.int64))
            flat_v.append(vidx)
        if flat_rows:
            fr = np.concatenate(flat_rows)
            fk = np.concatenate(flat_k)
            fv = np.concatenate(flat_v)
            order = np.argsort(fr, kind="stable")
            tags = np.empty(2 * len(fr), np.uint32)
            tags[0::2] = fk[order].astype(np.uint32)
            tags[1::2] = fv[order].astype(np.uint32)
        else:
            tags = np.empty(0, np.uint32)
        tags_b, tags_nb = vi.varint_encode(tags)
        if len(tags_nb):
            tstart_idx = np.minimum(np.cumsum(tag_cnt) - tag_cnt,
                                    len(tags_nb) - 1)
            t_bytes = np.add.reduceat(tags_nb, tstart_idx)
            t_bytes[tag_cnt == 0] = 0  # reduceat repeats, not zeros
        else:
            t_bytes = np.zeros(m, np.int64)
        t_starts = np.cumsum(t_bytes) - t_bytes

        # feature messages via rowwise byte concat
        segs = []
        if id_vals is not None:
            v, ok = id_vals
            vb, vnb = vi.varint_encode(v[rows].astype(np.uint64))
            # null/negative ids: omit the field entirely
            keep = np.repeat(ok[rows], vnb)
            hl = np.where(ok[rows], 1, 0).astype(np.int64)
            segs.append((np.repeat(np.uint8(0x08), int(hl.sum())),
                         hl))
            segs.append((vb[keep],
                         np.where(ok[rows], vnb, 0).astype(np.int64)))
        # tags field: 0x12 + len + payload (omitted when empty)
        has_t = t_bytes > 0
        tl_hdr_b, tl_hdr_nb = vi.varint_encode(
            t_bytes[has_t].astype(np.uint64))
        hdr_len = np.zeros(m, np.int64)
        hdr_len[has_t] = 1 + tl_hdr_nb
        hdr_flat = np.zeros(int(hdr_len.sum()), np.uint8)
        hpos = np.cumsum(hdr_len) - hdr_len
        hdr_flat[hpos[has_t]] = 0x12
        dst2 = (np.repeat(hpos[has_t] + 1, tl_hdr_nb)
                + vi.ramp(tl_hdr_nb))
        hdr_flat[dst2] = tl_hdr_b
        segs.append((hdr_flat, hdr_len))
        tag_flat = np.zeros(int(t_bytes.sum()), np.uint8)
        tdst = (np.repeat(np.cumsum(t_bytes) - t_bytes, t_bytes)
                + vi.ramp(t_bytes))
        src = (np.repeat(t_starts, t_bytes) + vi.ramp(t_bytes))
        tag_flat[tdst] = tags_b[src]
        segs.append((tag_flat, t_bytes))
        # type field: 0x18 + enum (1 byte)
        tflat = np.empty(2 * m, np.uint8)
        tflat[0::2] = 0x18
        tflat[1::2] = mtype[rows].astype(np.uint8)
        segs.append((tflat, np.full(m, 2, np.int64)))
        # geometry field: 0x22 + len + packed commands
        gl = f_bytes[rows]
        gl_b, gl_nb = vi.varint_encode(gl.astype(np.uint64))
        ghdr_len = 1 + gl_nb
        ghdr = np.zeros(int(ghdr_len.sum()), np.uint8)
        gpos = np.cumsum(ghdr_len) - ghdr_len
        ghdr[gpos] = 0x22
        ghdr[np.repeat(gpos + 1, gl_nb) + vi.ramp(gl_nb)] = gl_b
        segs.append((ghdr, ghdr_len))
        gflat = np.zeros(int(gl.sum()), np.uint8)
        gdst = np.repeat(np.cumsum(gl) - gl, gl) + vi.ramp(gl)
        gsrc = np.repeat(f_bstarts[rows], gl) + vi.ramp(gl)
        gflat[gdst] = geom_bytes[gsrc]
        segs.append((gflat, gl))

        feat_flat, feat_lens = vi.rowwise_concat(segs)
        # wrap each feature: 0x12 + len + body  (field 2 of Layer)
        fh_b, fh_nb = vi.varint_encode(feat_lens.astype(np.uint64))
        wrapped = vi.rowwise_concat([
            (np.repeat(np.uint8(0x12), m), np.ones(m, np.int64)),
            (fh_b, fh_nb),
            (feat_flat, feat_lens),
        ])[0]

        layer = (b"\x78\x02"                      # version = 2
                 + _len_delim(1, layer_name.encode())
                 + wrapped.tobytes()
                 + key_block
                 + b"".join(vals_block)
                 + b"\x28" + vi.encode_varint_scalar(extent))
        tile = _len_delim(3, layer)
        tiles_out["tile_key"].append(int(uniq[t]))
        z_, x_, y_ = tiles.unpack(np.array([uniq[t]], np.uint64))
        tiles_out["zoom"].append(int(z_[0]))
        tiles_out["tile_x"].append(int(x_[0]))
        tiles_out["tile_y"].append(int(y_[0]))
        tiles_out["mvt"].append(tile)
        tiles_out["features"].append(m)
        tiles_out["nbytes"].append(len(tile))
    return pa.table({
        "tile_key": pa.array(tiles_out["tile_key"], pa.uint64()),
        "zoom": pa.array(tiles_out["zoom"], pa.int32()),
        "tile_x": pa.array(tiles_out["tile_x"], pa.int32()),
        "tile_y": pa.array(tiles_out["tile_y"], pa.int32()),
        "mvt": pa.array(tiles_out["mvt"], pa.binary()),
        "features": pa.array(tiles_out["features"], pa.int64()),
        "nbytes": pa.array(tiles_out["nbytes"], pa.int64()),
    })


# --------------------------------------------------------------------
# scalar decoder — test oracle + debugging surface (not a hot path)
# --------------------------------------------------------------------

def decode_mvt(buf: bytes) -> list[dict]:
    """Parse an MVT tile into layers of features with absolute
    tile-coordinate geometry — a deliberately independent SCALAR
    walk of the spec used as the round-trip oracle."""
    layers = []
    pos = 0
    while pos < len(buf):
        key, pos = vi.decode_varint_scalar(buf, pos)
        if key >> 3 == 3 and (key & 7) == 2:
            ln, pos = vi.decode_varint_scalar(buf, pos)
            layers.append(_decode_layer(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip(buf, pos, key & 7)
    return layers


def _skip(buf, pos, wire):
    if wire == 0:
        _, pos = vi.decode_varint_scalar(buf, pos)
    elif wire == 2:
        ln, pos = vi.decode_varint_scalar(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    elif wire == 1:
        pos += 8
    else:
        raise ValueError(f"wire {wire}")
    return pos


def _decode_value(b: bytes):
    key, pos = vi.decode_varint_scalar(b, 0)
    f, w = key >> 3, key & 7
    if f == 1:
        ln, pos = vi.decode_varint_scalar(b, pos)
        return b[pos:pos + ln].decode()
    if f == 6:
        v, _ = vi.decode_varint_scalar(b, pos)
        return (v >> 1) ^ -(v & 1)
    if f == 4:
        v, _ = vi.decode_varint_scalar(b, pos)
        return v if v < (1 << 63) else v - (1 << 64)
    if f == 3:
        return float(np.frombuffer(b[pos:pos + 8], "<f8")[0])
    if f == 7:
        return bool(b[pos])
    raise ValueError(f"value field {f}")


def _decode_layer(b: bytes) -> dict:
    out = {"name": None, "version": None, "extent": 4096,
           "keys": [], "values": [], "features": []}
    pos = 0
    while pos < len(b):
        key, pos = vi.decode_varint_scalar(b, pos)
        f, w = key >> 3, key & 7
        if f == 15:
            out["version"], pos = vi.decode_varint_scalar(b, pos)
        elif f == 1:
            ln, pos = vi.decode_varint_scalar(b, pos)
            out["name"] = b[pos:pos + ln].decode(); pos += ln
        elif f == 5:
            out["extent"], pos = vi.decode_varint_scalar(b, pos)
        elif f == 3:
            ln, pos = vi.decode_varint_scalar(b, pos)
            out["keys"].append(b[pos:pos + ln].decode()); pos += ln
        elif f == 4:
            ln, pos = vi.decode_varint_scalar(b, pos)
            out["values"].append(_decode_value(b[pos:pos + ln]))
            pos += ln
        elif f == 2:
            ln, pos = vi.decode_varint_scalar(b, pos)
            out["features"].append(_decode_feature(b[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip(b, pos, w)
    for ft in out["features"]:
        tags = ft.pop("tags")
        ft["properties"] = {out["keys"][k]: out["values"][v]
                            for k, v in zip(tags[0::2], tags[1::2])}
    return out


def _decode_feature(b: bytes) -> dict:
    ft = {"id": None, "type": None, "tags": [], "parts": []}
    pos = 0
    geom = []
    while pos < len(b):
        key, pos = vi.decode_varint_scalar(b, pos)
        f, w = key >> 3, key & 7
        if f == 1:
            ft["id"], pos = vi.decode_varint_scalar(b, pos)
        elif f == 2:
            ln, pos = vi.decode_varint_scalar(b, pos)
            end = pos + ln
            while pos < end:
                v, pos = vi.decode_varint_scalar(b, pos)
                ft["tags"].append(v)
        elif f == 3:
            ft["type"], pos = vi.decode_varint_scalar(b, pos)
        elif f == 4:
            ln, pos = vi.decode_varint_scalar(b, pos)
            end = pos + ln
            while pos < end:
                v, pos = vi.decode_varint_scalar(b, pos)
                geom.append(v)
        else:
            pos = _skip(b, pos, w)
    # walk command integers by declared geometry type (spec §4.3.4):
    # type 1 = one MoveTo(k) -> k points; type 2 = repeated
    # MoveTo(1)+LineTo(c); type 3 = repeated MoveTo(1)+LineTo(c)+Close
    cx = cy = 0
    i = 0
    parts = []

    def _pt():
        nonlocal cx, cy, i
        cx += (geom[i] >> 1) ^ -(geom[i] & 1); i += 1
        cy += (geom[i] >> 1) ^ -(geom[i] & 1); i += 1
        return (cx, cy)

    while i < len(geom):
        cmd, cnt = geom[i] & 7, geom[i] >> 3
        i += 1
        if cmd != 1:
            raise ValueError(f"part must start with MoveTo, got {cmd}")
        if ft["type"] == 1:
            if cnt < 1:
                raise ValueError("point MoveTo count 0")
            for _ in range(cnt):
                parts.append({"points": [_pt()], "closed": False})
            continue
        if cnt != 1:
            raise ValueError("line/ring MoveTo count must be 1")
        part = {"points": [_pt()], "closed": False}
        cmd2, cnt2 = geom[i] & 7, geom[i] >> 3
        if cmd2 != 2 or cnt2 < 1:
            raise ValueError("expected LineTo after MoveTo")
        i += 1
        for _ in range(cnt2):
            part["points"].append(_pt())
        if ft["type"] == 3:
            if i >= len(geom) or geom[i] != 15:  # ClosePath|1
                raise ValueError("ring missing ClosePath")
            part["closed"] = True
            i += 1
        parts.append(part)
    ft["parts"] = parts
    return ft
