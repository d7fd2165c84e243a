"""Hex grid index: cube rounding, ring algebra, k-ring co-group join."""

import numpy as np
import pyarrow as pa


def _cube_round_scalar(qf, rf):
    """Independent scalar cube rounding (half-away)."""
    import math

    sf = -qf - rf
    q1 = math.floor(qf + 0.5)
    r1 = math.floor(rf + 0.5)
    s1 = math.floor(sf + 0.5)
    dq, dr, ds = abs(q1 - qf), abs(r1 - rf), abs(s1 - sf)
    if dq > dr and dq > ds:
        q1 = -r1 - s1
    elif dr > ds:
        r1 = -q1 - s1
    return int(q1), int(r1)


def test_hex_axial_vs_scalar():
    from geobuf_ray.spatial.hexgrid import K_Q, hex_axial

    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-85, 85, 5000)
    size = 2.9
    q, r = hex_axial(lon, lat, size)
    assert int(np.abs(q + r).max()) < 200  # sane magnitude
    for i in range(0, 5000, 97):
        qf = (K_Q * lon[i] - lat[i] / 3.0) / size
        rf = (2.0 / 3.0 * lat[i]) / size
        assert (int(q[i]), int(r[i])) == _cube_round_scalar(qf, rf)


def test_hex_center_roundtrip_and_nearest():
    from geobuf_ray.spatial.hexgrid import hex_axial, hex_center

    size = 1.7
    qs = np.arange(-30, 31)
    rs = np.arange(-20, 21)
    Q, R = np.meshgrid(qs, rs, indexing="ij")
    x, y = hex_center(Q.ravel(), R.ravel(), size)
    q2, r2 = hex_axial(x, y, size)
    assert np.array_equal(q2, Q.ravel()) and np.array_equal(r2, R.ravel())
    # points near a center still map to that cell (interior radius)
    rng = np.random.default_rng(5)
    jx = x + rng.uniform(-0.3, 0.3, len(x)) * size
    jy = y + rng.uniform(-0.3, 0.3, len(y)) * size
    q3, r3 = hex_axial(jx, jy, size)
    assert np.array_equal(q3, Q.ravel()) and np.array_equal(r3, R.ravel())


def test_hex_k_ring_sizes_and_distance():
    from geobuf_ray.spatial.hexgrid import hex_distance, hex_k_ring

    for k in (0, 1, 2, 3):
        q, r = hex_k_ring(k)
        assert len(q) == 1 + 3 * k * (k + 1)
        assert int(hex_distance(q, r, 0, 0).max()) == (k if k else 0)
    # the 6 direct neighbors all have distance exactly 1
    q, r = hex_k_ring(1)
    d = hex_distance(q, r, 0, 0)
    assert (np.sort(d) == np.array([0, 1, 1, 1, 1, 1, 1])).all()


def test_hex_within_k_count_vs_brute_force(ray_session):
    import ray

    from geobuf_ray.spatial.hexgrid import hex_axial, hex_within_k_count

    rng = np.random.default_rng(9)
    nl, nr = 60, 800
    llon = rng.uniform(-40, 40, nl)
    llat = rng.uniform(-30, 30, nl)
    rlon = rng.uniform(-40, 40, nr)
    rlat = rng.uniform(-30, 30, nr)
    size, k = 3.1, 1
    lq, lr = hex_axial(llon, llat, size)
    rq, rr = hex_axial(rlon, rlat, size)
    dq = lq[:, None] - rq[None, :]
    dr = lr[:, None] - rr[None, :]
    dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
    want = (dist <= k).sum(axis=1)

    left = pa.table({"id": pa.array(np.arange(nl, dtype=np.int64)),
                     "lon": pa.array(llon), "lat": pa.array(llat)})
    right = pa.table({"lon": pa.array(rlon), "lat": pa.array(rlat)})
    prev = None
    for nparts in (1, 4):
        lds = ray.data.from_arrow(left).repartition(nparts)
        rds = ray.data.from_arrow(right).repartition(nparts)
        parts = hex_within_k_count(lds, rds, id_col="id", size=size,
                                   k=k, nbuckets=8).to_pandas()
        got = parts.groupby("id")["n_neighbors"].sum()
        full = np.zeros(nl, np.int64)
        full[got.index.to_numpy()] = got.to_numpy()
        assert np.array_equal(full, want)
        if prev is not None:
            assert np.array_equal(full, prev)
        prev = full
