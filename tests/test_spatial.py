"""Spatial engine correctness vs brute-force oracles (FIXTURES.md F5/F7)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.io import geojson as gj
from geobuf_ray.spatial import tiles
from geobuf_ray.spatial.geometry import haversine_m, point_in_rings
from geobuf_ray.spatial.join import PolygonIndex, knn_join, point_in_polygon_join
from geobuf_ray.pipelines import tiling


def _random_polygons(rng, n):
    """Seeded star-convex polygons (some with holes) as feature dicts."""
    feats = []
    for i in range(n):
        cx, cy = rng.uniform(-10, 10), rng.uniform(-10, 10)
        r = rng.uniform(0.3, 2.0)
        k = rng.integers(5, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        radii = r * rng.uniform(0.5, 1.0, k)
        ring = [[cx + rr * np.cos(a), cy + rr * np.sin(a)] for a, rr in zip(ang, radii)]
        ring.append(ring[0])
        rings = [ring]
        if i % 4 == 0:  # add a hole
            hr = r * 0.2
            hole = [[cx + hr * np.cos(a), cy + hr * np.sin(a)] for a in np.linspace(0, 2 * np.pi, 6)]
            hole.append(hole[0])
            rings.append(hole)
        feats.append({
            "type": "Feature", "id": i, "properties": {},
            "geometry": {"type": "Polygon", "coordinates": rings},
        })
    return feats


def _oracle_pip(px, py, rings):
    """Independent scalar even-odd crossing test."""
    inside = False
    for ring in rings:
        c = False
        m = len(ring)
        j = m - 1
        for i in range(m):
            xi, yi = ring[i][0], ring[i][1]
            xj, yj = ring[j][0], ring[j][1]
            if (yi > py) != (yj > py):
                xint = xi + (py - yi) / (yj - yi) * (xj - xi)
                if px < xint:
                    c = not c
            j = i
        inside ^= c
    return inside


def test_point_in_rings_vs_oracle():
    rng = np.random.default_rng(3)
    feats = _random_polygons(rng, 20)
    px = rng.uniform(-12, 12, 400)
    py = rng.uniform(-12, 12, 400)
    for f in feats:
        rings = f["geometry"]["coordinates"]
        xs = np.array([p[0] for ring in rings for p in ring])
        ys = np.array([p[1] for ring in rings for p in ring])
        offs = np.concatenate(([0], np.cumsum([len(r) for r in rings])))
        got = point_in_rings(px, py, xs, ys, offs)
        want = np.array([_oracle_pip(a, b, rings) for a, b in zip(px, py)])
        assert (got == want).all()


def test_polygon_index_contains_matches_bruteforce():
    rng = np.random.default_rng(11)
    feats = _random_polygons(rng, 50)
    tbl = gj.features_to_table(feats)
    idx = PolygonIndex(tbl, zoom=7)
    px = rng.uniform(-12, 12, 1000)
    py = rng.uniform(-12, 12, 1000)
    pt_i, poly_id = idx.contains(px, py)
    got = set(zip(pt_i.tolist(), poly_id.tolist()))
    want = set()
    for j, f in enumerate(feats):
        rings = f["geometry"]["coordinates"]
        for i in range(len(px)):
            if _oracle_pip(px[i], py[i], rings):
                want.add((i, j))
    assert got == want


def test_pip_join_ray(ray_session):
    import ray

    rng = np.random.default_rng(5)
    feats = _random_polygons(rng, 30)
    polys = gj.features_to_table(feats)
    pts = pa.table({
        "pid": pa.array(np.arange(2000), pa.int64()),
        "lon": pa.array(rng.uniform(-12, 12, 2000)),
        "lat": pa.array(rng.uniform(-12, 12, 2000)),
    })
    ds = ray.data.from_arrow(pts).repartition(4)
    joined = point_in_polygon_join(ds, polys, zoom=7, concurrency=2)
    got = {(r["pid"], r["polygon_id"]) for r in joined.take_all()}
    idx = PolygonIndex(polys, zoom=7)
    pi, pg = idx.contains(
        pts["lon"].to_numpy(), pts["lat"].to_numpy()
    )
    want = set(zip(pts["pid"].to_numpy()[pi].tolist(), pg.tolist()))
    assert got == want
    assert len(got) > 0


def test_knn_join_matches_bruteforce(ray_session):
    import ray

    rng = np.random.default_rng(9)
    ref = pa.table({
        "id": pa.array(np.arange(500), pa.int64()),
        "lon": pa.array(rng.uniform(-5, 5, 500)),
        "lat": pa.array(rng.uniform(-5, 5, 500)),
    })
    qs = pa.table({
        "qid": pa.array(np.arange(100), pa.int64()),
        "lon": pa.array(rng.uniform(-5, 5, 100)),
        "lat": pa.array(rng.uniform(-5, 5, 100)),
    })
    ds = ray.data.from_arrow(qs).repartition(2)
    out = knn_join(ds, ref, k=5, concurrency=2).take_all()
    assert len(out) == 100 * 5
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["neighbor_id"], r["distance_m"]))
    qlon, qlat = qs["lon"].to_numpy(), qs["lat"].to_numpy()
    rlon, rlat = ref["lon"].to_numpy(), ref["lat"].to_numpy()
    for qid in range(100):
        d = haversine_m(qlon[qid], qlat[qid], rlon, rlat)
        want = np.argsort(d, kind="stable")[:5]
        got = [nid for _, nid, _ in sorted(by_q[qid])]
        assert got == want.tolist(), qid


needs_ref = pytest.mark.skipif(
    not os.path.exists("/root/reference/test_data/county.geojson"),
    reason="reference corpus absent",
)


@needs_ref
def test_split_combine_tiling(ray_session, tmp_path):
    import ray

    from geobuf_ray.io import geobuf_file as gbf
    from geobuf_ray.stages import codec_stages as cs

    feats = gj.load_feature_collection("/root/reference/test_data/county.geojson")[:500]
    tbl = gj.features_to_table(feats)
    ds = ray.data.from_arrow(tbl).repartition(4)
    out_dir = str(tmp_path / "tiles")
    zoom = 6
    manifest = tiling.split_combine(ds, out_dir, zoom)
    # oracle: bbox cover of every feature at zoom 6
    from geobuf_ray.codec.schema import list_column_parts
    from geobuf_ray.spatial.geometry import feature_bbox

    coords, offs = list_column_parts(tbl["coords"], np.float64)
    dim = tbl["dim"].to_numpy().astype(np.int64)
    bb = feature_bbox(coords, offs, dim)
    want_counts: dict[str, int] = {}
    for i in range(tbl.num_rows):
        x0, x1, y0, y1 = tiles.bbox_tile_cover(bb[i, 0], bb[i, 1], bb[i, 2], bb[i, 3], zoom)
        for x in range(int(x0), int(x1) + 1):
            for y in range(int(y0), int(y1) + 1):
                key = f"{x}-{y}-{zoom}"
                want_counts[key] = want_counts.get(key, 0) + 1
    got_counts = dict(zip(manifest["key"].to_pylist(), manifest["num_features"].to_pylist()))
    assert got_counts == want_counts
    # each tile file reads back with the right count and TILE column
    row = manifest.to_pylist()[0]
    back = gbf.read_geobuf(row["path"])
    dec = cs.decode(back)
    assert dec.count() == row["num_features"]


def test_knn_cell_join_matches_brute_force(ray_session):
    """Shuffle kNN (groupby-on-cell + boundary ring): non-truncated
    rows must match the exact broadcast kNN; truncation flags the
    partitioning-assumption violations instead of returning wrong
    neighbors."""
    import ray

    from geobuf_ray.spatial.join import knn_cell_join, knn_join

    rng = np.random.default_rng(21)
    n_pts, n_ref = 300, 400
    pts = pa.table({
        "custkey": pa.array(np.arange(n_pts), pa.int64()),
        "lon": pa.array(rng.uniform(-60, 60, n_pts)),
        "lat": pa.array(rng.uniform(-50, 50, n_pts)),
    })
    refs = pa.table({
        "id": pa.array(np.arange(1000, 1000 + n_ref), pa.int64()),
        "lon": pa.array(rng.uniform(-60, 60, n_ref)),
        "lat": pa.array(rng.uniform(-50, 50, n_ref)),
    })
    ds = ray.data.from_arrow(pts).repartition(3)
    exact = {}
    for r in knn_join(ds, refs, k=3, concurrency=(1, 2)).take_all():
        exact[(r["custkey"], r["rank"])] = r["neighbor_id"]
    got = knn_cell_join(ray.data.from_arrow(pts).repartition(3), refs,
                        k=3, zoom=3, ring=1).take_all()
    by_pt = {}
    for r in got:
        by_pt.setdefault(r["custkey"], []).append(r)
    assert len(by_pt) == n_pts
    n_trunc = 0
    for ck, rows in by_pt.items():
        if any(r["truncated"] for r in rows):
            n_trunc += 1
            continue
        for r in rows:
            assert exact[(ck, r["rank"])] == r["neighbor_id"], (ck, r)
    # at zoom 3 with dense refs, truncation should be the exception
    assert n_trunc < n_pts * 0.5, f"{n_trunc}/{n_pts} truncated"


def test_pip_cell_join_matches_broadcast(ray_session):
    """Shuffle PIP (both sides distributed, co-partitioned on cell)
    must produce exactly the broadcast-index join's pairs."""
    import ray

    from geobuf_ray.pipelines import queries as q
    from geobuf_ray.spatial.join import pip_cell_join, point_in_polygon_join

    sf = "/root/testdata/sf0.001"
    pts = q.customer_points(sf)
    polys = q.supplier_rects(sf)
    want = {(r["custkey"], r["polygon_id"]) for r in
            point_in_polygon_join(q.customer_points(sf), polys, zoom=5,
                                  concurrency=(1, 2)).take_all()}
    got_rows = pip_cell_join(pts, ray.data.from_arrow(polys), zoom=5).take_all()
    got = {(r["custkey"], r["polygon_id"]) for r in got_rows}
    assert len(got_rows) == len(got)  # no duplicate pairs
    assert got == want and len(want) > 0


def _morton_ref(qx: int, qy: int, bits: int) -> int:
    """Per-bit reference interleave (x at even positions)."""
    out = 0
    for b in range(bits):
        out |= ((qx >> b) & 1) << (2 * b)
        out |= ((qy >> b) & 1) << (2 * b + 1)
    return out


def test_morton_key_matches_per_bit_reference():
    from geobuf_ray.spatial.curves import morton_key, quantize_lonlat

    rng = np.random.default_rng(20)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for bits in (4, 8, 16):
        keys = morton_key(lon, lat, bits=bits)
        qx, qy = quantize_lonlat(lon, lat, bits)
        exp = np.array([_morton_ref(int(x), int(y), bits)
                        for x, y in zip(qx, qy)])
        assert (keys == exp).all()
    # edge coords clamp, never overflow
    k = morton_key(np.array([-180.0, 180.0]), np.array([-90.0, 90.0]),
                   bits=16)
    assert k[0] == 0 and k[1] == (1 << 32) - 1


def test_geohash_known_values():
    from geobuf_ray.spatial.curves import geohash_key

    # canonical published examples (geohash.org)
    got = geohash_key(np.array([10.40744, -5.6]),
                      np.array([57.64911, 42.6]), precision=5)
    assert got.to_pylist() == ["u4pru", "ezs42"]
    got11 = geohash_key(np.array([10.40744]), np.array([57.64911]),
                        precision=11)
    assert got11.to_pylist() == ["u4pruydqqvj"]


def test_geohash_prefix_property():
    """Longer precision strings extend shorter ones (binary
    subdivision consistency)."""
    from geobuf_ray.spatial.curves import geohash_key

    rng = np.random.default_rng(21)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    g4 = geohash_key(lon, lat, precision=4).to_pylist()
    g8 = geohash_key(lon, lat, precision=8).to_pylist()
    assert all(b.startswith(a) for a, b in zip(g4, g8))


def test_zorder_sort_clusters(ray_session):
    import ray

    from geobuf_ray.spatial.curves import morton_key, zorder_sort

    rng = np.random.default_rng(22)
    n = 5000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    tbl = pa.table({"lon": pa.array(lon), "lat": pa.array(lat),
                    "id": pa.array(np.arange(n, dtype=np.int64))})
    out = zorder_sort(ray.data.from_arrow(tbl).repartition(6),
                      "lon", "lat", bits=12).to_pandas()
    keys = out["zkey"].to_numpy()
    assert (np.diff(keys) >= 0).all()
    # same multiset of rows, keys consistent with the stamped coords
    assert (morton_key(out["lon"].to_numpy(), out["lat"].to_numpy(),
                       bits=12) == keys).all()
    assert sorted(out["id"]) == list(range(n))


def test_rect_areal_weights_brute_force_and_cell_invariance(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.interp import rect_areal_weights

    rng = np.random.default_rng(7)
    NT, NZ = 250, 60
    tw = rng.integers(0, 5000, NT)
    ts_ = rng.integers(0, 5000, NT)
    te = tw + rng.integers(1, 400, NT)
    tn = ts_ + rng.integers(1, 400, NT)
    zw = rng.integers(0, 5000, NZ)
    zs = rng.integers(0, 5000, NZ)
    ze = zw + rng.integers(1, 900, NZ)
    zn = zs + rng.integers(1, 900, NZ)
    zv = rng.integers(-50, 1000, NZ)
    T = pa.table({"id": pa.array(np.arange(NT)), "w": tw, "s": ts_,
                  "e": te, "n": tn})
    Z = pa.table({"value": zv, "w": zw, "s": zs, "e": ze, "n": zn})
    exp = {}
    for i in range(NT):
        va = ia = 0
        for j in range(NZ):
            w = max(tw[i], zw[j]); s = max(ts_[i], zs[j])
            e = min(te[i], ze[j]); n = min(tn[i], zn[j])
            if w < e and s < n:
                a = int(e - w) * int(n - s)
                va += int(zv[j]) * a
                ia += a
        if ia:
            exp[i] = (va, ia)
    for bits, parts, nb in ((9, 5, 8), (7, 1, 4), (11, 3, 16)):
        out = collect_table(rect_areal_weights(
            ray.data.from_arrow(T).repartition(parts),
            ray.data.from_arrow(Z).repartition(max(1, parts - 2)),
            cell_bits=bits, target_cols=("w", "s", "e", "n"),
            zone_cols=("w", "s", "e", "n"), nbuckets=nb))
        agg = out.group_by("id").aggregate(
            [("val_area", "sum"), ("inter_area", "sum")])
        got = {r["id"]: (r["val_area_sum"], r["inter_area_sum"])
               for r in agg.to_pylist()}
        assert got == exp, (bits, parts)


def test_rect_areal_weights_rejects_bad_input(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.interp import rect_areal_weights

    T = pa.table({"id": pa.array([0], pa.int64()),
                  "w": pa.array([0.5]), "s": pa.array([0.0]),
                  "e": pa.array([1.0]), "n": pa.array([1.0])})
    Z = pa.table({"value": pa.array([1], pa.int64()),
                  "w": pa.array([0], pa.int64()),
                  "s": pa.array([0], pa.int64()),
                  "e": pa.array([1], pa.int64()),
                  "n": pa.array([1], pa.int64())})
    with pytest.raises(Exception):
        collect_table(rect_areal_weights(
            ray.data.from_arrow(T), ray.data.from_arrow(Z), cell_bits=4,
            target_cols=("w", "s", "e", "n"),
            zone_cols=("w", "s", "e", "n"), nbuckets=2))


def test_rect_union_area_raster_oracle_and_partition_invariance(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.interp import rect_union_area

    rng = np.random.default_rng(3)
    N = 350
    g = rng.integers(0, 11, N)
    w = rng.integers(-1200, 800, N)
    s = rng.integers(-1200, 800, N)
    e = w + rng.integers(1, 500, N)
    n = s + rng.integers(1, 500, N)
    T = pa.table({"g": g, "w": w, "s": s, "e": e, "n": n})
    exp = {}
    for gg in np.unique(g):
        m = g == gg
        grid = np.zeros((2600, 2600), bool)
        for W, S, E, Nn in zip(w[m] + 1300, s[m] + 1300,
                               e[m] + 1300, n[m] + 1300):
            grid[W:E, S:Nn] = True
        exp[int(gg)] = int(grid.sum())
    for parts, nb in ((1, 4), (7, 8)):
        out = collect_table(rect_union_area(
            ray.data.from_arrow(T).repartition(parts), group="g",
            cols=("w", "s", "e", "n"), nbuckets=nb))
        got = {r["g"]: r["union_area"] for r in out.to_pylist()}
        assert got == exp, parts
    # identical stacked rects: union == single rect, not 3x
    T2 = pa.table({"g": pa.array([5, 5, 5], pa.int64()),
                   "w": pa.array([0, 0, 0], pa.int64()),
                   "s": pa.array([0, 0, 0], pa.int64()),
                   "e": pa.array([10, 10, 10], pa.int64()),
                   "n": pa.array([4, 4, 4], pa.int64())})
    out2 = collect_table(rect_union_area(
        ray.data.from_arrow(T2), group="g", cols=("w", "s", "e", "n"),
        nbuckets=2))
    assert out2.to_pylist() == [{"g": 5, "union_area": 40}]


def test_trajectory_stats_scalar_reference(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.trajectory import trajectory_stats

    rng = np.random.default_rng(21)
    N = 500
    k = rng.integers(0, 17, N)
    o = rng.permutation(N).astype(np.int64)   # unique order values
    x = rng.integers(-1000, 1000, N)
    y = rng.integers(-1000, 1000, N)
    T = pa.table({"k": k, "o": o, "x": x, "y": y})
    exp = {}
    for kk in np.unique(k):
        m = k == kk
        sel = np.argsort(o[m])
        xs, ys = x[m][sel], y[m][sel]
        exp[int(kk)] = (int(m.sum()),
                        int(np.abs(np.diff(xs)).sum()
                            + np.abs(np.diff(ys)).sum()),
                        int(abs(xs[-1] - xs[0]) + abs(ys[-1] - ys[0])))
    for parts in (1, 9):
        out = collect_table(trajectory_stats(
            ray.data.from_arrow(T).repartition(parts), key="k",
            order="o", x="x", y="y", nbuckets=4))
        got = {r["k"]: (r["n_points"], r["path_l1"], r["net_l1"])
               for r in out.to_pylist()}
        assert got == exp, parts


def test_kernel_interpolate_brute_force(ray_session):
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.spatial.interp import kernel_interpolate

    rng = np.random.default_rng(4)
    NT, NS = 300, 90
    tx = rng.integers(-3000, 3000, NT)
    ty = rng.integers(-3000, 3000, NT)
    sx = rng.integers(-3000, 3000, NS)
    sy = rng.integers(-3000, 3000, NS)
    sv = rng.integers(-100, 2000, NS)
    R = 700
    T = pa.table({"id": np.arange(NT), "x": tx, "y": ty})
    S = pa.table({"value": sv, "x": sx, "y": sy})
    exp = {}
    for i in range(NT):
        d2 = (tx[i] - sx) ** 2 + (ty[i] - sy) ** 2
        w = R * R - d2
        m = w > 0
        if m.any():
            exp[i] = (int((sv[m] * w[m]).sum()), int(w[m].sum()))
    for bits, parts in ((9, 5), (11, 1)):
        out = collect_table(kernel_interpolate(
            ray.data.from_arrow(T).repartition(parts),
            ray.data.from_arrow(S).repartition(2),
            radius=R, cell_bits=bits, nbuckets=8))
        got = {r["id"]: (r["num"], r["den"]) for r in out.to_pylist()}
        assert got == exp, bits


def test_morans_i_scalar_replay(ray_session, tmp_path):
    """customers_morans_i vs a scalar double-loop replay on a tiny
    synthetic customer file, plus sign sanity: a perfectly CLUSTERED
    field gives positive I, a checkerboard gives negative I."""
    import pyarrow.parquet as pq

    from geobuf_ray.pipelines import queries as q

    keys = np.arange(1, 400, dtype=np.int64)
    tbl = pa.table({"c_custkey": pa.array(keys)})
    pq.write_table(tbl, tmp_path / "customer.parquet")
    out = q.customers_morans_i(str(tmp_path)).to_pylist()[0]

    lon = ((keys * 7919) % 36000) / 100.0 - 180.0
    lat = ((keys * 104729) % 17000) / 100.0 - 85.0
    n_side = 64
    qx = np.clip(np.floor((lon + 180) / 360 * n_side).astype(int),
                 0, 63)
    qy = np.clip(np.floor((lat + 90) / 180 * n_side).astype(int),
                 0, 63)
    x = np.zeros((n_side, n_side), np.int64)
    for a, b in zip(qx, qy):
        x[a, b] += 1
    N, S = n_side * n_side, int(x.sum())
    z = N * x - S
    num = 0
    for i in range(n_side):
        for j in range(n_side):
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                if 0 <= i + di < n_side and 0 <= j + dj < n_side:
                    num += int(z[i, j]) * int(z[i + di, j + dj])
    assert out["moran_num"] == num
    assert out["moran_den"] == int((z.astype(object) ** 2).sum())
    assert out["n_cells"] == N and out["sum_w"] == 16128

    def moran(zgrid):
        n2 = zgrid.size
        a = 2 * (int((zgrid[:-1] * zgrid[1:]).sum())
                 + int((zgrid[:, :-1] * zgrid[:, 1:]).sum()))
        b = int((zgrid * zgrid).sum())
        w = 4 * zgrid.shape[0] * (zgrid.shape[0] - 1)
        return n2 * a / (w * b)

    half = np.zeros((8, 8), np.int64)
    half[:4] = 64          # clustered: one solid half
    zc = half.size * half - half.sum()
    assert moran(zc) > 0.5
    cb = np.indices((8, 8)).sum(axis=0) % 2 * 64  # checkerboard
    zb = cb.size * cb - cb.sum()
    assert moran(zb) < -0.5


def test_ransac_line_scalar_replay(ray_session, tmp_path):
    """customers_ransac_line vs an all-hypotheses scalar replay on a
    tiny synthetic customer file; the planted-line hypothesis must
    win and every planted point must be an exact inlier."""
    import itertools

    import pyarrow.parquet as pq

    from geobuf_ray.pipelines import queries as q

    keys = np.arange(1, 200, dtype=np.int64)
    pq.write_table(pa.table({"c_custkey": pa.array(keys)}),
                   tmp_path / "customer.parquet")
    out = q.customers_ransac_line(str(tmp_path)).to_pylist()[0]

    def pt(k):
        if k % 17 == 0:
            return (-15000 + (k % 300) * 100,
                    -7000 + (k % 300) * 40)
        return ((k * 7919) % 36000 - 18000,
                (k * 104729) % 17000 - 8500)

    n = len(keys)
    step = -(-n // 32)
    samp = list(keys[::step][:32])
    best = None
    for (ai, a), (bi, b) in itertools.combinations(
            enumerate(samp), 2):
        x0, y0 = pt(a)
        x1, y1 = pt(b)
        dx, dy = x1 - x0, y1 - y0
        lim = 2500 * (dx * dx + dy * dy)
        cnt = sum(1 for k in keys
                  if (dx * (pt(k)[1] - y0)
                      - dy * (pt(k)[0] - x0)) ** 2 <= lim)
        cand = (-cnt, ai, bi, a, b)
        if best is None or cand < best:
            best = cand
    assert (out["i_key"], out["j_key"], out["n_inliers"]) == \
        (best[3], best[4], -best[0])
    assert out["n_points"] == n
    # the winner must dominate the planted line's exact inliers; the
    # planted pair itself need not win — the modular point lattice
    # contains strong collinear structures of its own (observed at
    # this tiny n), which is exactly why the bound is the invariant
    n_planted = int((keys % 17 == 0).sum())
    assert out["n_inliers"] >= n_planted
