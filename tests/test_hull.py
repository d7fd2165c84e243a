"""Batched QuickHull vs a scalar monotone-chain oracle."""

import numpy as np
import pyarrow as pa

from geobuf_ray.spatial.hull import (convex_hull, convex_hull_points,
                                     hull_indices)


def _chain_hull(pts):
    """Andrew's monotone chain (scalar oracle): CCW hull vertex list,
    collinear points excluded, starting at the leftmost-lowest."""
    pts = sorted(set(map(tuple, pts)))
    if len(pts) <= 2:
        return pts

    def half(points):
        h = []
        for p in points:
            while len(h) >= 2 and (
                    (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def test_hull_indices_random_sets():
    rng = np.random.default_rng(31)
    sizes = rng.integers(3, 120, 60).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    total = int(sizes.sum())
    xs = np.round(rng.normal(0, 10, total), 1)
    ys = np.round(rng.normal(0, 10, total), 1)  # rounding forces ties
    idx, sid = hull_indices(xs, ys, starts, sizes)
    for s in range(len(sizes)):
        mine = [(xs[i], ys[i]) for i in idx[sid == s]]
        pts = list(zip(xs[starts[s]:starts[s] + sizes[s]],
                       ys[starts[s]:starts[s] + sizes[s]]))
        want = _chain_hull(pts)
        assert set(mine) == set(want), s
        # CCW order starting at leftmost-lowest == oracle order exactly
        assert mine == want, s


def test_hull_degenerate_collinear_and_single():
    xs = np.array([0.0, 1.0, 2.0, 3.0, 5.0])
    ys = np.array([0.0, 0.0, 0.0, 0.0, 7.0])
    # set 0: 4 collinear points -> 2 extremes; set 1: single point
    idx, sid = hull_indices(xs, ys, np.array([0, 4]), np.array([4, 1]))
    assert [tuple(sorted((xs[i], ys[i]) for i in idx[sid == 0]))] == \
        [((0.0, 0.0), (3.0, 0.0))]
    assert list(idx[sid == 1]) == [4]


def test_hull_duplicate_points():
    xs = np.array([0.0, 0.0, 1.0, 1.0, 0.5, 0.5, 0.0, 1.0])
    ys = np.array([0.0, 0.0, 0.0, 1.0, 0.5, 0.5, 1.0, 0.0])
    idx, sid = hull_indices(xs, ys, np.array([0]), np.array([8]))
    got = sorted((xs[i], ys[i]) for i in idx)
    assert got == [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)]


def test_convex_hull_points_ring_closed():
    rng = np.random.default_rng(5)
    n = 500
    tbl = pa.table({
        "g": pa.array(np.sort(rng.integers(0, 8, n)), pa.int64()),
        "lon": pa.array(rng.uniform(-50, 50, n)),
        "lat": pa.array(rng.uniform(-30, 30, n)),
    })
    out = convex_hull_points(tbl, key="g")
    assert out.num_rows == 8
    for i in range(8):
        ring = np.asarray(out["hull"][i].as_py())
        nh = out["n_hull"][i].as_py()
        assert len(ring) == (nh + 1) * 2
        assert ring[0] == ring[-2] and ring[1] == ring[-1]  # closed
        # CCW: shoelace area positive
        x, y = ring[0::2], ring[1::2]
        area2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
        assert area2 > 0


def test_convex_hull_distributed_matches_local(ray_session):
    import ray

    rng = np.random.default_rng(17)
    n = 6000
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 12, n), pa.int64()),
        "lon": pa.array(rng.normal(0, 20, n)),
        "lat": pa.array(rng.normal(0, 20, n)),
    })
    ds = ray.data.from_arrow(tbl).repartition(6)
    out = convex_hull(ds, key="g", nbuckets=4).to_pandas()
    assert len(out) == 12
    df = tbl.to_pandas()
    for _, row in out.iterrows():
        pts = df[df.g == row["g"]][["lon", "lat"]].values
        want = _chain_hull([tuple(p) for p in pts])
        ring = np.asarray(row["hull"])
        mine = list(zip(ring[0::2], ring[1::2]))[:-1]
        assert mine == want, row["g"]
