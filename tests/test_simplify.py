"""Douglas–Peucker kernel vs the scalar recursive reference."""

import numpy as np
import pyarrow as pa

from geobuf_ray.spatial.simplify import dp_keep_mask, simplify, simplify_batch


def scalar_dp(pts, eps):
    n = len(pts)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(a, b):
        if b - a < 2:
            return
        ax, ay = pts[a]
        bx, by = pts[b]
        dxx, dyy = bx - ax, by - ay
        den = (dxx * dxx + dyy * dyy) ** 0.5
        best, bi = -1.0, -1
        for i in range(a + 1, b):
            px, py = pts[i]
            if den == 0:
                d = ((px - ax) ** 2 + (py - ay) ** 2) ** 0.5
            else:
                d = abs(dxx * (py - ay) - dyy * (px - ax)) / den
            if d > best:
                best, bi = d, i
        if best > eps:
            keep[bi] = True
            rec(a, bi)
            rec(bi, b)

    rec(0, n - 1)
    return np.array(keep)


def test_dp_keep_mask_randomized_vs_scalar():
    rng = np.random.default_rng(11)
    for _ in range(200):
        m = int(rng.integers(2, 40))
        pts = rng.normal(0, 1, (m, 2)).round(2)  # rounding makes ties
        eps = float(rng.uniform(0.01, 1.5))
        got = dp_keep_mask(pts[:, 0].copy(), pts[:, 1].copy(),
                           np.array([0]), np.array([m]), eps)
        assert (got == scalar_dp(pts, eps)).all()


def test_dp_multi_polyline_equals_per_polyline():
    rng = np.random.default_rng(3)
    sizes = np.array([5, 12, 3, 30, 2])
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    pts = rng.normal(0, 1, (int(sizes.sum()), 2)).round(2)
    got = dp_keep_mask(pts[:, 0].copy(), pts[:, 1].copy(),
                       starts, sizes, 0.4)
    exp = np.concatenate([scalar_dp(pts[s:s + z], 0.4)
                          for s, z in zip(starts, sizes)])
    assert (got == exp).all()


def _ft(feats):
    ids, gt, dims, coords, rs, ps = [], [], [], [], [], []
    for fid, g, d, polys in feats:
        ids.append(fid)
        gt.append(g)
        dims.append(d)
        flat, r, p = [], [], []
        for rings in polys:
            p.append(len(rings))
            for ring in rings:
                r.append(len(ring))
                for pt in ring:
                    flat.extend(pt)
        coords.append(flat)
        rs.append(r)
        ps.append(p)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "geom_type": pa.array(np.array(gt, np.int8)),
        "dim": pa.array(np.array(dims, np.int8)),
        "coords": pa.array(coords, pa.list_(pa.float64())),
        "ring_sizes": pa.array(rs, pa.list_(pa.int32())),
        "poly_sizes": pa.array(ps, pa.list_(pa.int32())),
    })


def test_simplify_batch_table_plumbing():
    line = [(0., 0.), (2., 0.), (4., 0.), (4., 2.), (4., 4.)]
    ring = [(0., 0.), (1., 0.), (2., 0.), (2., 2.), (0., 2.), (0., 0.)]
    l3 = [(0., 0., 9.), (1., 0., 8.), (2., 0., 7.), (2., 5., 6.)]
    tbl = _ft([(1, 2, 2, [[line]]), (2, 3, 2, [[ring]]),
               (3, 2, 3, [[l3]]), (4, 1, 2, [[[(7., 8.)]]])])
    out = simplify_batch(tbl, eps=0.01).to_pydict()
    assert out["coords"][0] == [0., 0., 4., 0., 4., 4.]
    # ring keeps explicit closure
    assert out["coords"][1] == [0., 0., 2., 0., 2., 2., 0., 2., 0., 0.]
    # dim-3: surviving vertices keep their z
    assert out["coords"][2] == [0., 0., 9., 2., 0., 7., 2., 5., 6.]
    # points pass through untouched
    assert out["coords"][3] == [7., 8.]
    assert out["ring_sizes"] == [[3], [5], [3], [1]]


def test_simplify_dataset(ray_session):
    import ray

    line = [(0., 0.), (1., 0.01), (2., 0.), (2., 1.), (2., 2.)]
    tbl = _ft([(i, 2, 2, [[line]]) for i in range(20)])
    out = simplify(ray.data.from_arrow(tbl), eps=0.1).to_pandas()
    assert len(out) == 20
    assert all(len(c) == 6 for c in out.coords)  # 3 kept vertices
