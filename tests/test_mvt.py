"""MVT encoder: spec conformance via an independent scalar decode.

The oracle chain: encode with the vectorized batch encoder
(codec/mvt), decode every tile with the deliberately scalar
spec-walk decoder, and compare geometry against a SEPARATE scalar
quantization of the same source coordinates — plus the spec's
structural obligations (winding, ClosePath, implicit ring closure,
typed values)."""

import math
import os

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.codec.mvt import (MVT_EXTENT, decode_mvt,
                                  encode_mvt_batch)
from geobuf_ray.spatial import tiles as T

COUNTY = "/root/reference/test_data/county.geobuf"


def quantize(lon, lat, z, tx, ty, extent=MVT_EXTENT):
    """Independent scalar reference quantizer (half-away rounding)."""
    n = (1 << z) * extent
    px = math.floor((lon + 180.0) / 360.0 * n + 0.5)
    la = max(min(lat, 85.05112877980659), -85.05112877980659)
    lr = math.radians(la)
    py = math.floor(
        (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi)
        / 2.0 * n + 0.5)
    return px - tx * extent, py - ty * extent


def ref_part(pairs, z, tx, ty, ring=False):
    """Scalar reference: quantize, open the ring, collapse runs."""
    pts = [quantize(lo, la, z, tx, ty) for lo, la in pairs]
    if ring and len(pts) > 1 and pts[-1] == pts[0]:
        pts = pts[:-1]
    out = [pts[0]]
    for p in pts[1:]:
        if p != out[-1]:
            out.append(p)
    return out


def shoelace(pts):
    return sum(pts[i][0] * pts[(i + 1) % len(pts)][1]
               - pts[(i + 1) % len(pts)][0] * pts[i][1]
               for i in range(len(pts)))


def cyclic_eq(a, b):
    """Ring equality up to rotation and direction."""
    if len(a) != len(b):
        return False
    for s in range(len(b)):
        rot = b[s:] + b[:s]
        if rot == a or rot[::-1] == a:
            return True
    return False


def geo_table(rows, tile_key, extra=None):
    """rows: list of (gt, [parts], ps) with parts = lists of (x, y)."""
    gts, coords, rs, ps = [], [], [], []
    for gt, parts, psz in rows:
        gts.append(gt)
        flat = []
        for p in parts:
            for xy in p:
                flat.extend(xy)
        coords.append(flat)
        rs.append([len(p) for p in parts])
        ps.append(psz)
    cols = {
        "id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "geom_type": pa.array(gts, pa.int8()),
        "dim": pa.array([2] * len(rows), pa.int8()),
        "coords": pa.array(coords, pa.list_(pa.float64())),
        "ring_sizes": pa.array(rs, pa.list_(pa.int32())),
        "poly_sizes": pa.array(ps, pa.list_(pa.int32())),
        "tile_key": pa.array([tile_key] * len(rows), pa.uint64()),
    }
    cols.update(extra or {})
    return pa.table(cols)


def tk(z, x, y):
    return int(T.pack(np.array([z]), np.array([x]), np.array([y]))[0])


def test_point_line_multis_roundtrip():
    key = tk(1, 0, 0)
    sq = [(-170, 10), (-100, 10), (-100, 70), (-170, 70), (-170, 10)]
    t = geo_table([
        (1, [[(-120.0, 40.0)]], [1]),                      # Point
        (4, [[(-150.0, 20.0), (-110.0, 55.0), (-91.0, 3.0)]], [1]),
        (2, [[(-170.0, 5.0), (-120.0, 44.0), (-95.0, 60.0)]], [1]),
        (5, [[(-160.0, 12.0), (-140.0, 33.0)],
             [(-130.0, 50.0), (-99.0, 8.0), (-91.5, 71.0)]], [1, 1]),
        (3, [sq], [1]),                                    # Polygon
    ], key)
    out = encode_mvt_batch(t, 1, layer_name="u")
    assert out.num_rows == 1
    lay = decode_mvt(out["mvt"][0].as_py())[0]
    assert lay["version"] == 2 and lay["extent"] == MVT_EXTENT
    assert lay["name"] == "u"
    f = lay["features"]
    assert [x["id"] for x in f] == [1, 2, 3, 4, 5]
    assert [x["type"] for x in f] == [1, 1, 2, 2, 3]
    # geometry equals the scalar reference path exactly
    src = t.to_pylist()
    for ft, row in zip(f, src):
        parts = []
        c = row["coords"]
        o = 0
        for m in row["ring_sizes"]:
            parts.append([(c[2 * (o + i)], c[2 * (o + i) + 1])
                          for i in range(m)])
            o += m
        ring = row["geom_type"] in (3, 6)
        want = [ref_part(p, 1, 0, 0, ring) for p in parts]
        if ft["type"] == 1:
            got = [p["points"][0] for p in ft["parts"]]
            assert got == [w[0] for w in want] \
                or got == [xy for w in want for xy in w]
        elif ft["type"] == 2:
            assert [p["points"] for p in ft["parts"]] == want
        else:
            for p, w in zip(ft["parts"], want):
                assert p["closed"]
                assert cyclic_eq(p["points"], w)
                assert shoelace(p["points"]) > 0  # exterior winding


def test_polygon_holes_winding_and_degenerates():
    key = tk(2, 0, 1)
    w, s, e, n = -170.0, 10.0, -100.0, 60.0
    outer = [(w, s), (e, s), (e, n), (w, n), (w, s)]
    hole = [(-150.0, 25.0), (-150.0, 45.0), (-120.0, 45.0),
            (-120.0, 25.0), (-150.0, 25.0)]
    # feature 2: zero-area sliver (collapses after quantization)
    eps = 1e-9
    sliver = [(-140.0, 30.0), (-140.0 + eps, 30.0),
              (-140.0, 30.0 + eps), (-140.0, 30.0)]
    # feature 3: multipolygon whose SECOND polygon is the sliver
    t = geo_table([
        (3, [outer, hole], [2]),
        (3, [sliver], [1]),
        (6, [outer, sliver], [1, 1]),
    ], key)
    out = encode_mvt_batch(t, 2, layer_name="h")
    lay = decode_mvt(out["mvt"][0].as_py())[0]
    assert [x["id"] for x in lay["features"]] == [1, 3]  # sliver dies
    f1 = lay["features"][0]
    assert len(f1["parts"]) == 2
    assert shoelace(f1["parts"][0]["points"]) > 0   # exterior CW
    assert shoelace(f1["parts"][1]["points"]) < 0   # hole CCW
    f3 = lay["features"][1]
    assert len(f3["parts"]) == 1  # dead second polygon dropped
    # input holes arrive in GeoJSON orientation-agnostic order; a
    # REVERSED exterior must still encode positive
    t2 = geo_table([(3, [outer[::-1], hole[::-1]], [2])], key)
    lay2 = decode_mvt(
        encode_mvt_batch(t2, 2)["mvt"][0].as_py())[0]
    pts = lay2["features"][0]["parts"]
    assert shoelace(pts[0]["points"]) > 0
    assert shoelace(pts[1]["points"]) < 0


def test_properties_typed_and_null_omitted():
    key = tk(0, 0, 0)
    extra = {
        "name": pa.array(["a", None, "a"], pa.string()),
        "rank": pa.array([7, -3, None], pa.int64()),
        "score": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "flag": pa.array([True, False, True], pa.bool_()),
    }
    t = geo_table([(1, [[(-60.0, 10.0)]], [1]),
                   (1, [[(-50.0, 11.0)]], [1]),
                   (1, [[(-40.0, 12.0)]], [1])], key, extra)
    lay = decode_mvt(encode_mvt_batch(t, 0)["mvt"][0].as_py())[0]
    assert lay["keys"] == ["name", "rank", "score", "flag"]
    p = [f["properties"] for f in lay["features"]]
    assert p[0] == {"name": "a", "rank": 7, "score": 1.5, "flag": True}
    assert p[1] == {"rank": -3, "score": 2.5, "flag": False}
    assert p[2] == {"name": "a", "score": 3.5, "flag": True}
    # value table deduplicates: "a" and True appear once each
    assert lay["values"].count("a") == 1
    assert lay["values"].count(True) == 1


@pytest.mark.skipif(not os.path.exists(COUNTY),
                    reason="reference corpus absent")
def test_county_mvt_pipeline(ray_session):
    """End-to-end over the reference corpus: clip -> exchange ->
    encode; every decoded ring matches the scalar reference path and
    every feature count reconciles with the clip output."""
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.io import geobuf_file as gbf
    from geobuf_ray.pipelines.tiling import make_mvt_tiles, tile_clip
    from geobuf_ray.stages import codec_stages as cs

    zoom = 6
    feats = cs.decode(gbf.read_geobuf(COUNTY))
    tiles_tab = collect_table(
        make_mvt_tiles(feats, zoom, layer_name="county",
                       prop_cols=["COLORKEY"],
                       order_by=("tile_key", "index")))
    assert tiles_tab.num_rows > 100
    # clip output for the reference comparison
    clip_tab = collect_table(
        tile_clip(cs.decode(gbf.read_geobuf(COUNTY)), zoom))
    bytile: dict = {}
    for r in clip_tab.to_pylist():
        bytile.setdefault(r["tile_key"], []).append(r)

    total = 0
    rng = np.random.default_rng(7)
    rows = tiles_tab.to_pylist()
    for trow in [rows[i] for i in
                 rng.choice(len(rows), size=25, replace=False)]:
        z, tx, ty = trow["zoom"], trow["tile_x"], trow["tile_y"]
        lay = decode_mvt(trow["mvt"])[0]
        assert lay["name"] == "county"
        src = bytile[trow["tile_key"]]
        for ft in lay["features"]:
            # 'index' is not unique corpus-wide; match on property
            # equality and accept any geometry-identical candidate
            cand = [s for s in src
                    if s["COLORKEY"] == ft["properties"]["COLORKEY"]]
            assert cand
            matched = False
            for s in cand:
                parts, o = [], 0
                c = s["coords"]
                for m in s["ring_sizes"]:
                    parts.append([(c[2 * (o + i)], c[2 * (o + i) + 1])
                                  for i in range(m)])
                    o += m
                want = [ref_part(p, z, tx, ty, ring=True)
                        for p in parts]
                want = [wp for wp in want
                        if len(wp) >= 3 and shoelace(wp) != 0]
                got = [p["points"] for p in ft["parts"]]
                if len(got) == len(want) and all(
                        cyclic_eq(g, w) for g, w in zip(got, want)):
                    matched = True
                    break
            assert matched
            for p in ft["parts"]:
                assert p["closed"]
            assert shoelace(ft["parts"][0]["points"]) > 0
            total += 1
    assert total > 25


def test_make_mvt_tiles_partition_invariant(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.pipelines import queries as q
    from geobuf_ray.pipelines.tiling import make_mvt_tiles

    rects = q.supplier_rects("/root/testdata/sf0.001")
    maps = []
    for k in (1, 5):
        ds = ray.data.from_arrow(rects).repartition(k)
        t = collect_table(make_mvt_tiles(ds, 4))
        maps.append(dict(zip(t["tile_key"].to_pylist(),
                             t["mvt"].to_pylist())))
    assert maps[0] == maps[1] and len(maps[0]) > 10
