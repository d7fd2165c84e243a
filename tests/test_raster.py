"""Raster<->vector kernels: rasterize vs direct center-in-rect oracle,
mask pack/unpack round-trip, and run-box vectorization inverse."""

import numpy as np
import pyarrow as pa

from geobuf_ray.spatial import raster


def _rect_table(rects):
    from geobuf_ray.io.geojson import features_to_table

    feats = [
        {"type": "Feature", "id": i, "properties": {},
         "geometry": {"type": "Polygon", "coordinates": [[
             [w, s], [e, s], [e, n], [w, n], [w, s]]]}}
        for i, (w, s, e, n) in enumerate(rects)
    ]
    return features_to_table(feats)


def test_rasterize_matches_center_in_rect():
    rng = np.random.default_rng(11)
    rects = []
    for _ in range(25):
        w = rng.uniform(-175, 120)
        s = rng.uniform(-80, 50)
        rects.append((w, s, w + rng.uniform(0.5, 50),
                      s + rng.uniform(0.5, 30)))
    out = raster.rasterize_batch(_rect_table(rects), ntiles=16, px=16,
                                 id_col="id", emit_mask=True)
    got = {(r["polygon_id"], r["tile_x"], r["tile_y"]): r["n_pixels"]
           for r in out.to_pylist()}
    # direct oracle: all 256x256 global pixel centers
    ii = np.arange(256)
    cx = -180.0 + (ii + 0.5) * (360.0 / 256)
    cy = -85.0 + (ii + 0.5) * (170.0 / 256)
    CX, CY = np.meshgrid(cx, cy, indexing="ij")
    want = {}
    for pid, (w, s, e, n) in enumerate(rects):
        inside = (CX >= w) & (CX <= e) & (CY >= s) & (CY <= n)
        gx, gy = np.nonzero(inside)
        for tx, ty in zip(gx // 16, gy // 16):
            want[(pid, tx, ty)] = want.get((pid, tx, ty), 0) + 1
    assert got == want


def test_mask_bits_equal_inside_pixels():
    rects = [(-10.0, -5.0, 30.0, 20.0)]
    out = raster.rasterize_batch(_rect_table(rects), ntiles=16, px=16,
                                 id_col="id", emit_mask=True)
    for r in out.to_pylist():
        bits = np.unpackbits(np.frombuffer(r["mask"], np.uint8))
        assert int(bits.sum()) == r["n_pixels"]


def test_masks_to_boxes_inverse():
    """Union of run boxes == set pixels, exactly."""
    rng = np.random.default_rng(4)
    rects = [(-60.0, -30.0, 25.0, 10.0), (100.0, 40.0, 170.0, 80.0)]
    out = raster.rasterize_batch(_rect_table(rects), ntiles=16, px=16,
                                 id_col="id", emit_mask=True)
    tx = np.array([r["tile_x"] for r in out.to_pylist()])
    ty = np.array([r["tile_y"] for r in out.to_pylist()])
    masks = [r["mask"] for r in out.to_pylist()]
    boxes = raster.masks_to_boxes(tx, ty, masks, ntiles=16, px=16)
    tw, th, pw, ph = raster.grid_spec(16, 16)
    # rebuild bitmaps from boxes; must equal the original masks
    rebuilt = [np.zeros((16, 16), bool) for _ in masks]
    for r in boxes.to_pylist():
        k = r["row_idx"]
        x0 = int(round((r["west"] - (-180.0 + tx[k] * tw)) / pw))
        x1 = int(round((r["east"] - (-180.0 + tx[k] * tw)) / pw))
        y = int(round((r["south"] - (-85.0 + ty[k] * th)) / ph))
        assert 0 <= x0 < x1 <= 16 and 0 <= y < 16
        assert not rebuilt[k][y, x0:x1].any()  # runs never overlap
        rebuilt[k][y, x0:x1] = True
    for k, m in enumerate(masks):
        bits = np.unpackbits(np.frombuffer(m, np.uint8)).reshape(16, 16)
        assert (rebuilt[k] == bits.astype(bool)).all()


def _brute_dt(occ_xy, N):
    import numpy as np
    d = np.full((N, N), 1 << 30, np.int64)
    for (ox, oy) in occ_xy:
        gx, gy = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        d = np.minimum(d, np.abs(gx - ox) + np.abs(gy - oy))
    return d


def _occ_ds_from_pixels(pix, ntiles, px):
    """Build union_tile_masks-shaped occupancy rows from pixel list."""
    import numpy as np
    import pyarrow as pa
    import ray

    tiles = {}
    for gx, gy in pix:
        key = (gx // px, gy // px)
        m = tiles.setdefault(key, np.zeros((px, px), np.uint8))
        m[gy % px, gx % px] = 1
    tx, ty, masks = [], [], []
    for (a, b), m in sorted(tiles.items()):
        tx.append(a)
        ty.append(b)
        masks.append(np.packbits(m.reshape(-1)).tobytes())
    tbl = pa.table({"tile_x": pa.array(tx, pa.int64()),
                    "tile_y": pa.array(ty, pa.int64()),
                    "mask": pa.array(masks, pa.binary())})
    return ray.data.from_arrow(tbl).repartition(max(len(tx) // 2, 1))


def test_distance_transform_matches_brute_force(ray_session):
    import random

    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.raster import distance_transform_l1

    rng = random.Random(3)
    ntiles, px = 4, 8
    N = ntiles * px
    pix = sorted({(rng.randrange(N), rng.randrange(N))
                  for _ in range(25)})
    ds = _occ_ds_from_pixels(pix, ntiles, px)
    out = pa.concat_tables(ray.get(distance_transform_l1(
        ds, ntiles=ntiles, px=px, nbuckets=8).to_arrow_refs()))
    assert out.num_rows == N * N
    got = np.full((N, N), -1, np.int64)
    got[out["gx"].to_numpy(), out["gy"].to_numpy()] = \
        out["dist"].to_numpy()
    np.testing.assert_array_equal(got, _brute_dt(pix, N))


def test_distance_transform_empty_and_single(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.raster import distance_transform_l1

    ntiles, px = 2, 4
    N = ntiles * px
    empty = pa.table({"tile_x": pa.array([], pa.int64()),
                      "tile_y": pa.array([], pa.int64()),
                      "mask": pa.array([], pa.binary())})
    out = pa.concat_tables(ray.get(distance_transform_l1(
        ray.data.from_arrow(empty), ntiles=ntiles, px=px,
        nbuckets=4).to_arrow_refs()))
    assert out.num_rows == 0  # all-empty raster -> empty field

    one = _occ_ds_from_pixels([(5, 2)], ntiles, px)
    out = pa.concat_tables(ray.get(distance_transform_l1(
        one, ntiles=ntiles, px=px, nbuckets=4).to_arrow_refs()))
    got = np.zeros((N, N), np.int64)
    got[out["gx"].to_numpy(), out["gy"].to_numpy()] = \
        out["dist"].to_numpy()
    np.testing.assert_array_equal(got, _brute_dt([(5, 2)], N))


def test_distance_transform_bucket_invariance(ray_session):
    import random

    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.raster import distance_transform_l1

    rng = random.Random(9)
    ntiles, px = 4, 4
    N = ntiles * px
    pix = sorted({(rng.randrange(N), rng.randrange(N))
                  for _ in range(10)})

    def run(nb):
        ds = _occ_ds_from_pixels(pix, ntiles, px)
        t = pa.concat_tables(ray.get(distance_transform_l1(
            ds, ntiles=ntiles, px=px, nbuckets=nb).to_arrow_refs()))
        o = np.lexsort((t["gy"].to_numpy(), t["gx"].to_numpy()))
        return t["dist"].to_numpy()[o].tolist()

    assert run(2) == run(16)


def _brute_marching(pix, N):
    """Pure-Python per-cell case walk over the same pinned table."""
    from geobuf_ray.spatial.raster import _MS_SEGS
    EX, EY = [0, 1, 2, 1], [1, 0, 1, 2]
    occ = set(pix)
    segs = []
    for x in range(N - 1):
        for y in range(N - 1):
            c = (((x, y) in occ) + 2 * ((x + 1, y) in occ)
                 + 4 * ((x + 1, y + 1) in occ)
                 + 8 * ((x, y + 1) in occ))
            for (a, b) in _MS_SEGS[c]:
                if a < 0:
                    continue
                p0 = (2 * x + EX[a], 2 * y + EY[a])
                p1 = (2 * x + EX[b], 2 * y + EY[b])
                if p1 < p0:
                    p0, p1 = p1, p0
                segs.append((*p0, *p1))
    return sorted(segs)


def test_marching_squares_brute_force(ray_session):
    import random

    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.raster import marching_squares

    rng = random.Random(13)
    ntiles, px = 4, 8
    N = ntiles * px
    # dense enough to hit saddles and all case classes
    pix = sorted({(rng.randrange(N), rng.randrange(N))
                  for _ in range(300)})
    ds = _occ_ds_from_pixels(pix, ntiles, px)
    out = pa.concat_tables(ray.get(marching_squares(
        ds, ntiles=ntiles, px=px, nbuckets=8).to_arrow_refs()))
    got = sorted(zip(out["x0"].to_pylist(), out["y0"].to_pylist(),
                     out["x1"].to_pylist(), out["y1"].to_pylist()))
    assert got == _brute_marching(pix, N)


def test_marching_squares_single_pixel_ring(ray_session):
    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.raster import marching_squares

    ntiles, px = 2, 4
    out = pa.concat_tables(ray.get(marching_squares(
        _occ_ds_from_pixels([(3, 3)], ntiles, px), ntiles=ntiles,
        px=px, nbuckets=4).to_arrow_refs()))
    got = sorted(zip(out["x0"].to_pylist(), out["y0"].to_pylist(),
                     out["x1"].to_pylist(), out["y1"].to_pylist()))
    # an isolated interior pixel contours as a 4-segment diamond
    assert got == _brute_marching([(3, 3)], ntiles * px)
    assert len(got) == 4


def test_marching_squares_bucket_invariance_and_empty(ray_session):
    import random

    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.raster import marching_squares

    ntiles, px = 4, 4
    N = ntiles * px
    empty = pa.table({"tile_x": pa.array([], pa.int64()),
                      "tile_y": pa.array([], pa.int64()),
                      "mask": pa.array([], pa.binary())})
    out = pa.concat_tables(ray.get(marching_squares(
        ray.data.from_arrow(empty), ntiles=ntiles, px=px,
        nbuckets=4).to_arrow_refs()))
    assert out.num_rows == 0

    rng = random.Random(2)
    pix = sorted({(rng.randrange(N), rng.randrange(N))
                  for _ in range(40)})

    def run(nb):
        t = pa.concat_tables(ray.get(marching_squares(
            _occ_ds_from_pixels(pix, ntiles, px), ntiles=ntiles,
            px=px, nbuckets=nb).to_arrow_refs()))
        return sorted(zip(t["x0"].to_pylist(), t["y0"].to_pylist(),
                          t["x1"].to_pylist(), t["y1"].to_pylist()))

    assert run(2) == run(16) == _brute_marching(pix, N)


def test_pole_of_inaccessibility_brute_force(ray_session):
    """Query-level polylabel composition replayed brute force: the
    interior cell maximizing min-L1-to-exterior, ties to smallest
    (gx, gy)."""
    import numpy as np

    from geobuf_ray.pipelines import queries as q

    out = q.rects_pole_of_inaccessibility("/root/testdata/sf0.001",
                                          ntiles=4, px=8)
    N = 32
    # rebuild the same occupancy the query rasterizes
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW supplier AS SELECT * FROM "
                "'/root/testdata/sf0.001/supplier.parquet'")
    occ = np.zeros((N, N), bool)
    rows = con.execute("""
      SELECT (-180.0 + (s_suppkey*37) % 300) w,
             (-85.0 + (s_suppkey*53) % 160) s,
             (-180.0 + (s_suppkey*37) % 300 + 5.0 + (s_suppkey%7)*3.0 + 0.005) e,
             (-85.0 + (s_suppkey*53) % 160 + 4.0 + (s_suppkey%5)*3.0 + 0.005) n
      FROM supplier WHERE s_suppkey % 5 = 0""").fetchall()
    for w, s, e, n in rows:
        for i in range(N):
            cx = -180.0 + (i + 0.5) * (360.0 / N)
            if not (w <= cx <= e):
                continue
            for j in range(N):
                cy = -85.0 + (j + 0.5) * (170.0 / N)
                if s <= cy <= n:
                    occ[i, j] = True
    best = None
    for i in range(N):
        for j in range(N):
            if not occ[i, j]:
                continue
            dmin = min(abs(i - a) + abs(j - b)
                       for a in range(N) for b in range(N)
                       if not occ[a, b])
            cand = (-dmin, i, j)
            if best is None or cand < best:
                best = cand
    want = (best[1], best[2], -best[0])
    got = (out["gx"][0].as_py(), out["gy"][0].as_py(),
           out["depth"][0].as_py())
    assert got == want


def test_rasterize_lines_dda_scalar_reference():
    from geobuf_ray.spatial.raster import rasterize_lines_dda

    rng = np.random.default_rng(6)
    n = 200
    tbl = pa.table({
        "sid": pa.array(np.arange(n), pa.int64()),
        "x0": pa.array(rng.integers(-300, 300, n), pa.int64()),
        "y0": pa.array(rng.integers(-300, 300, n), pa.int64()),
        "x1": pa.array(rng.integers(-300, 300, n), pa.int64()),
        "y1": pa.array(rng.integers(-300, 300, n), pa.int64())})
    out = rasterize_lines_dda(tbl, cell=16)
    got = {}
    for s, cx, cy in zip(out["sid"].to_pylist(), out["cx"].to_pylist(),
                         out["cy"].to_pylist()):
        got.setdefault(s, []).append((cx, cy))
    import math
    for i in range(n):
        x0, y0 = tbl["x0"][i].as_py(), tbl["y0"][i].as_py()
        x1, y1 = tbl["x1"][i].as_py(), tbl["y1"][i].as_py()
        dx, dy = x1 - x0, y1 - y0
        steps = max(abs(dx), abs(dy))
        dv = max(steps, 1)
        exp = []
        for t in range(steps + 1):
            x = x0 + math.floor(t * dx / dv)
            y = y0 + math.floor(t * dy / dv)
            exp.append((math.floor(x / 16), math.floor(y / 16)))
        assert got[i] == exp, i


def test_rasterize_lines_dda_degenerate_and_props():
    from geobuf_ray.spatial.raster import rasterize_lines_dda

    tbl = pa.table({"sid": pa.array([0, 1], pa.int64()),
                    "x0": pa.array([5, -100], pa.int64()),
                    "y0": pa.array([5, 0], pa.int64()),
                    "x1": pa.array([5, 100], pa.int64()),
                    "y1": pa.array([5, 0], pa.int64())})
    out = rasterize_lines_dda(tbl, cell=64)
    df = out.to_pandas()
    assert len(df[df.sid == 0]) == 1  # zero-length segment: one cell
    seg1 = df[df.sid == 1]
    assert len(seg1) == 201  # major axis never repeats
    assert seg1["cx"].tolist() == sorted(seg1["cx"].tolist())
    # endpoints land in their own cells
    assert seg1["cx"].iloc[0] == -2 and seg1["cx"].iloc[-1] == 1


def test_morphology_open_brute_force(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.raster import morphology_open

    # hand grid: a 4x4 solid block + speckle pixels that opening removes
    ntiles, px = 4, 4
    n = ntiles * px
    pix = {(5, 5), (5, 6), (5, 7), (5, 8),
           (6, 5), (6, 6), (6, 7), (6, 8),
           (7, 5), (7, 6), (7, 7), (7, 8),
           (8, 5), (8, 6), (8, 7), (8, 8),
           (1, 1), (12, 3), (0, 15)}  # speckles
    # build per-tile masks
    rows = {}
    for gx, gy in pix:
        key = (gx // px, gy // px)
        m = rows.setdefault(key, np.zeros((px, px), bool))
        m[gy % px, gx % px] = True
    occ = pa.table({
        "tile_x": pa.array([k[0] for k in rows], pa.int64()),
        "tile_y": pa.array([k[1] for k in rows], pa.int64()),
        "mask": pa.array([bytes(np.packbits(m)) for m in rows.values()],
                         pa.binary())})
    out = collect_table(morphology_open(
        ray.data.from_arrow(occ), ntiles=ntiles, px=px, nbuckets=4))
    got = set(zip(out["gx"].to_pylist(), out["gy"].to_pylist()))

    # brute-force reference
    eroded = {(x, y) for (x, y) in pix
              if all((x + dx, y + dy) in pix
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1))}
    dilated = {(x + dx, y + dy) for (x, y) in eroded
               for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if 0 <= x + dx < n and 0 <= y + dy < n}
    assert got == dilated
    assert (6, 6) in got and (1, 1) not in got  # speckles gone


def test_affine_warp_nn_brute_force(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.raster import affine_warp_nn

    ntiles, px = 4, 8
    n = ntiles * px
    rng = np.random.default_rng(9)
    pix = {(int(x), int(y))
           for x, y in rng.integers(0, n, (150, 2))}
    rows = {}
    for gx, gy in pix:
        key = (gx // px, gy // px)
        m = rows.setdefault(key, np.zeros((px, px), bool))
        m[gy % px, gx % px] = True
    occ = pa.table({
        "tile_x": pa.array([k[0] for k in rows], pa.int64()),
        "tile_y": pa.array([k[1] for k in rows], pa.int64()),
        "mask": pa.array([bytes(np.packbits(m)) for m in rows.values()],
                         pa.binary())})
    out = collect_table(affine_warp_nn(
        ray.data.from_arrow(occ), ntiles=ntiles, px=px, nbuckets=4))
    got = set(zip(out["gx"].to_pylist(), out["gy"].to_pylist()))

    import math
    c = n // 2
    exp = set()
    for ox in range(n):
        for oy in range(n):
            ix = c + math.floor((4 * (ox - c) + 3 * (oy - c)) / 5)
            iy = c + math.floor((-3 * (ox - c) + 4 * (oy - c)) / 5)
            if 0 <= ix < n and 0 <= iy < n and (ix, iy) in pix:
                exp.add((ox, oy))
    assert got == exp


def test_affine_warp_identity_and_guard(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.raster import affine_warp_nn

    px = 8
    m = np.zeros((px, px), bool)
    m[2, 3] = m[5, 1] = True
    occ = pa.table({"tile_x": pa.array([1], pa.int64()),
                    "tile_y": pa.array([2], pa.int64()),
                    "mask": pa.array([bytes(np.packbits(m))],
                                     pa.binary())})
    out = collect_table(affine_warp_nn(
        ray.data.from_arrow(occ), ntiles=4, px=px, nbuckets=2,
        coeffs=(1, 0, 0, 1, 1)))
    got = set(zip(out["gx"].to_pylist(), out["gy"].to_pylist()))
    assert got == {(1 * px + 3, 2 * px + 2), (1 * px + 1, 2 * px + 5)}

    import pytest

    with pytest.raises(ValueError, match="px must be"):
        affine_warp_nn(ray.data.from_arrow(occ), ntiles=4, px=4,
                       nbuckets=2)


def test_box_density_brute_force(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.raster import box_density

    ntiles, px, r = 4, 8, 2
    n = ntiles * px
    rng = np.random.default_rng(21)
    pix = {(int(x), int(y)) for x, y in rng.integers(0, n, (60, 2))}
    rows = {}
    for gx, gy in pix:
        key = (gx // px, gy // px)
        m = rows.setdefault(key, np.zeros((px, px), bool))
        m[gy % px, gx % px] = True
    occ = pa.table({
        "tile_x": pa.array([k[0] for k in rows], pa.int64()),
        "tile_y": pa.array([k[1] for k in rows], pa.int64()),
        "mask": pa.array([bytes(np.packbits(m)) for m in rows.values()],
                         pa.binary())})
    out = collect_table(box_density(
        ray.data.from_arrow(occ), ntiles=ntiles, px=px, radius=r,
        nbuckets=4))
    got = {(x, y): d for x, y, d in zip(out["gx"].to_pylist(),
                                        out["gy"].to_pylist(),
                                        out["density"].to_pylist())}
    for x in range(n):
        for y in range(n):
            exp = sum(1 for (px_, py_) in pix
                      if abs(px_ - x) <= r and abs(py_ - y) <= r)
            assert got.get((x, y), 0) == exp, (x, y)


def test_rects_line_of_sight_brute_force(ray_session):
    """Independent scalar replay: rebuild the density terrain with a
    dense numpy grid, walk each probe pair with the pinned DDA rule,
    and apply the cross-multiplied visibility test."""
    import duckdb

    from geobuf_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    out = q.rects_line_of_sight(sf)

    keys = duckdb.connect().execute(
        f"SELECT s_suppkey FROM '{sf}/supplier.parquet'"
    ).fetchnumpy()["s_suppkey"].astype(np.int64)
    N = 256
    occ = np.zeros((N, N), bool)
    for k in keys:
        a, b = int(k * 37 % 248), int(k * 53 % 248)
        sx, sy = int(k % 3 + 1), int(k * 7 % 3 + 1)
        occ[a:a + sx + 1, b:b + sy + 1] = True
    dens = np.zeros((N, N), np.int64)
    xs, ys = np.nonzero(occ)
    for x, y in zip(xs, ys):
        dens[max(0, x - 2):x + 3, max(0, y - 2):y + 3] += 1

    for i in range(out.num_rows):
        ax, ay = i * 379 % N, i * 523 % N
        bx, by = (i * 691 + 37) % N, (i * 811 + 91) % N
        k = max(abs(bx - ax), abs(by - ay))
        dv = max(k, 1)
        path = [(ax + (t * (bx - ax)) // dv, ay + (t * (by - ay)) // dv)
                for t in range(k + 1)]
        z = [int(dens[x, y]) for x, y in path]
        za, zb = z[0] + 2, z[-1] + 2
        blocked = [t for t in range(1, k)
                   if z[t] * k >= za * (k - t) + zb * t]
        assert out["steps"][i].as_py() == k
        assert out["path_mass"][i].as_py() == sum(z)
        assert out["n_block"][i].as_py() == len(blocked)
        assert out["first_block"][i].as_py() == (blocked[0] if blocked
                                                 else 0)
        assert out["visible"][i].as_py() == (0 if blocked else 1)


def test_terrain_aspect_dense_brute_force(ray_session):
    """rects_terrain_aspect vs a dense-grid numpy brute force built
    straight from the supplier-key fan (the SQL twin's derivation)."""
    import duckdb

    from geobuf_ray.pipelines.queries import rects_terrain_aspect

    sf = "/root/testdata/sf0.001"
    out = rects_terrain_aspect(sf).to_pandas()

    k = duckdb.connect().execute(
        f"SELECT s_suppkey FROM '{sf}/supplier.parquet'").fetchnumpy()[
        "s_suppkey"].astype(np.int64)
    N = 256
    occ = np.zeros((N, N), bool)
    for kk in k:
        a, b = (kk * 37) % 248, (kk * 53) % 248
        sx, sy = kk % 3 + 1, (kk * 7) % 3 + 1
        occ[a:a + sx + 1, b:b + sy + 1] = True
    z = np.zeros((N, N), np.int64)
    xs, ys = np.nonzero(occ)
    for x, y in zip(xs, ys):
        z[max(0, x - 2):x + 3, max(0, y - 2):y + 3] += 1

    DIRS = [(1, 0), (1, 1), (0, 1), (-1, 1),
            (-1, 0), (-1, -1), (0, -1), (1, -1)]
    assert len(out) > 0
    for _, r in out.iterrows():
        gx, gy = int(r["gx"]), int(r["gy"])
        assert z[gx, gy] == r["z"] and z[gx, gy] > 0
        drops, higher = [], 0
        for dx, dy in DIRS:
            nx, ny = gx + dx, gy + dy
            zn = z[nx, ny] if 0 <= nx < N and 0 <= ny < N else 0
            drops.append(z[gx, gy] - zn)
            higher += zn > z[gx, gy]
        steep = max(drops)
        assert r["steepest"] == steep
        assert r["n_higher"] == higher
        assert r["aspect"] == (drops.index(steep) if steep > 0 else -1)
    # every sampled nonzero cell appears
    want = sum(1 for x in range(N) for y in range(N)
               if z[x, y] > 0 and (x * 31 + y * 17) % 13 == 0)
    assert len(out) == want


def test_flow_accumulation_brute_force():
    """flow_accumulation vs a per-cell chain-walk brute force on a
    random sparse field (pointer forest: strictly-downhill D8)."""
    import pyarrow as pa

    from geobuf_ray.spatial.raster import D8_DIRS, flow_accumulation

    rng = np.random.RandomState(5)
    N = 32
    z = np.zeros((N, N), np.int64)
    pts = rng.randint(1, N - 1, (60, 2))
    for x, y in pts:
        z[x - 1:x + 2, y - 1:y + 2] += rng.randint(1, 4)
    xs, ys = np.nonzero(z)

    rows = []
    for x, y in zip(xs, ys):
        drops = []
        for dx, dy in D8_DIRS:
            nx, ny = x + dx, y + dy
            zn = z[nx, ny] if 0 <= nx < N and 0 <= ny < N else 0
            drops.append(z[x, y] - zn)
        steep = max(drops)
        asp = drops.index(steep) if steep > 0 else -1
        rows.append((x, y, z[x, y], steep, asp, 0))
    t = pa.table({
        "gx": pa.array([r[0] for r in rows], pa.int64()),
        "gy": pa.array([r[1] for r in rows], pa.int64()),
        "z": pa.array([r[2] for r in rows], pa.int64()),
        "steepest": pa.array([r[3] for r in rows], pa.int64()),
        "aspect": pa.array([r[4] for r in rows], pa.int64()),
        "n_higher": pa.array([r[5] for r in rows], pa.int64())})
    acc = flow_accumulation(t, grid=N)

    # brute force: walk every cell's chain, count visits per cell
    exists = {(r[0], r[1]): i for i, r in enumerate(rows)}
    want = np.zeros(len(rows), np.int64)
    for i, (x, y, _, _, asp, _) in enumerate(rows):
        cx, cy = x, y
        while True:
            want[exists[(cx, cy)]] += 1
            a = rows[exists[(cx, cy)]][4]
            if a < 0:
                break
            nx, ny = cx + D8_DIRS[a][0], cy + D8_DIRS[a][1]
            if (nx, ny) not in exists:
                break
            cx, cy = nx, ny
    assert np.array_equal(acc, want)
    # conservation: total accumulation == total chain length
    assert acc.sum() == want.sum() and acc.min() >= 1


def test_watershed_labels_brute_force():
    """watershed_labels vs a per-cell chain-walk brute force on a
    random sparse field: pits own their cell id, exits share -1, and
    labels are consistent with flow accumulation (the pit's acc ==
    its basin's cell count when no chain through it exits)."""
    import pyarrow as pa

    from geobuf_ray.spatial.raster import D8_DIRS, watershed_labels

    rng = np.random.RandomState(11)
    N = 32
    z = np.zeros((N, N), np.int64)
    pts = rng.randint(1, N - 1, (60, 2))
    for x, y in pts:
        z[x - 1:x + 2, y - 1:y + 2] += rng.randint(1, 4)
    xs, ys = np.nonzero(z)

    rows = []
    for x, y in zip(xs, ys):
        drops = []
        for dx, dy in D8_DIRS:
            nx, ny = x + dx, y + dy
            zn = z[nx, ny] if 0 <= nx < N and 0 <= ny < N else 0
            drops.append(z[x, y] - zn)
        steep = max(drops)
        asp = drops.index(steep) if steep > 0 else -1
        rows.append((x, y, int(z[x, y]), steep, asp, 0))
    t = pa.table({
        "gx": pa.array([r[0] for r in rows], pa.int64()),
        "gy": pa.array([r[1] for r in rows], pa.int64()),
        "z": pa.array([r[2] for r in rows], pa.int64()),
        "steepest": pa.array([r[3] for r in rows], pa.int64()),
        "aspect": pa.array([r[4] for r in rows], pa.int64()),
        "n_higher": pa.array([r[5] for r in rows], pa.int64())})
    basin, is_exit = watershed_labels(t, grid=N)

    exists = {(r[0], r[1]): i for i, r in enumerate(rows)}
    want = np.empty(len(rows), np.int64)
    for i, (x, y, _, _, asp, _) in enumerate(rows):
        cx, cy = x, y
        while True:
            a = rows[exists[(cx, cy)]][4]
            if a < 0:
                want[i] = cx * N + cy
                break
            nx, ny = cx + D8_DIRS[a][0], cy + D8_DIRS[a][1]
            if (nx, ny) not in exists:
                want[i] = -1
                break
            cx, cy = nx, ny
    assert np.array_equal(basin, want)
    assert np.array_equal(is_exit, want == -1)
    # pits are fixed points of their own basin; at least one of each
    for i, (x, y, _, _, asp, _) in enumerate(rows):
        if asp < 0:
            assert basin[i] == x * N + y
    assert (basin == -1).any() or (basin >= 0).all()
    assert len(np.unique(basin[basin >= 0])) == \
        sum(1 for r in rows if r[4] < 0)


def test_voronoi_label_grid_brute_force(ray_session):
    """voronoi_label_grid vs a dense numpy argmin replay — random
    sites plus two COINCIDENT sites (the tie must go to the smaller
    id) and a site outside the grid's bbox."""
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.raster import voronoi_label_grid

    ids = np.array([9, 2, 5, 17, 3, 40], np.int64)
    sx = np.array([10, 95, 95, -50, 42, 400], np.int64)
    sy = np.array([7, 33, 33, 20, -8, 400], np.int64)  # 2 and 5 coincide
    sites = pa.table({"id": pa.array(ids),
                      "x": pa.array(sx), "y": pa.array(sy)})
    GX, GY, X0, Y0, CW, CH = 12, 9, -60, -20, 14, 6
    out = collect_table(voronoi_label_grid(
        sites, gx=GX, gy=GY, x0=X0, y0=Y0, cw=CW, ch=CH,
        batch_rows=16))
    assert out.num_rows == GX * GY
    got = {(r["cx"], r["cy"]): r["site"] for r in out.to_pylist()}
    order = np.argsort(ids)
    for cx in range(GX):
        for cy in range(GY):
            px = X0 + cx * CW + CW // 2
            py = Y0 + cy * CH + CH // 2
            d2 = (px - sx[order]) ** 2 + (py - sy[order]) ** 2
            want = ids[order][np.argmin(d2)]
            assert got[(cx, cy)] == want, (cx, cy)
    # the coincident pair: id 5 never wins a cell (2 < 5 at equal d2)
    assert 5 not in set(got.values())
