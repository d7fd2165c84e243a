"""grid_dbscan vs a brute-force scalar DBSCAN reference."""

import numpy as np
import pyarrow as pa


def _dbscan_scalar(ids, x, y, eps, min_pts):
    """O(n^2) reference with the module's deterministic rules:
    component label = min core id, border -> cluster of min-id core
    neighbor."""
    n = len(ids)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    nbr = d2 <= eps * eps
    core = nbr.sum(axis=1) >= min_pts

    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                parent[ri] = rj
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (comp_min[find(i)], True)
        else:
            cn = [ids[j] for j in range(n) if core[j] and nbr[i, j]]
            if cn:
                jmin = min(cn)
                j = int(np.flatnonzero(ids == jmin)[0])
                out[ids[i]] = (comp_min[find(j)], False)
    return out


def test_grid_dbscan_vs_scalar_and_partitions(ray_session):
    import ray

    from geobuf_ray.spatial.dbscan import grid_dbscan

    rng = np.random.default_rng(17)
    # three planted blobs + uniform noise, integer coords
    blob = lambda cx, cy, n: np.stack(  # noqa: E731
        [rng.integers(cx - 40, cx + 40, n),
         rng.integers(cy - 40, cy + 40, n)], axis=1)
    pts = np.concatenate([
        blob(0, 0, 60), blob(500, 300, 50), blob(-400, 250, 40),
        np.stack([rng.integers(-1000, 1000, 80),
                  rng.integers(-800, 800, 80)], axis=1)])
    n = len(pts)
    ids = rng.permutation(n).astype(np.int64) * 7 + 3  # non-contiguous
    x = pts[:, 0].astype(np.int64)
    y = pts[:, 1].astype(np.int64)
    eps, min_pts = 45, 4
    want = _dbscan_scalar(ids, x, y, eps, min_pts)
    assert len(want) >= 140  # blobs actually cluster

    tbl = pa.table({"id": pa.array(ids), "x": pa.array(x),
                    "y": pa.array(y)})
    prev = None
    for nparts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = grid_dbscan(ds, eps=eps, min_pts=min_pts, nbuckets=8)
        got = {int(i): (int(c), bool(k)) for i, c, k in
               zip(out["id"].to_pylist(), out["cluster"].to_pylist(),
                   out["is_core"].to_pylist())}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_grid_dbscan_isolated_core_singleton(ray_session):
    import ray

    from geobuf_ray.spatial.dbscan import grid_dbscan

    # a tight pair (both core at min_pts=2) far from a lone point
    tbl = pa.table({"id": pa.array([10, 20, 99], pa.int64()),
                    "x": pa.array([0, 1, 10_000], pa.int64()),
                    "y": pa.array([0, 0, 10_000], pa.int64())})
    out = grid_dbscan(ray.data.from_arrow(tbl), eps=5, min_pts=2,
                      nbuckets=4)
    got = {int(i): (int(c), bool(k)) for i, c, k in
           zip(out["id"].to_pylist(), out["cluster"].to_pylist(),
               out["is_core"].to_pylist())}
    # 10,20 cluster together labeled 10; 99 is noise (absent)
    assert got == {10: (10, True), 20: (10, True)}
