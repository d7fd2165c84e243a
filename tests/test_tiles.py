"""Slippy tile math vs an independent scalar oracle (FIXTURES.md F5)."""

import math

import numpy as np

from geobuf_ray.spatial import tiles


def oracle_tile(lon, lat, zoom):
    """Scalar slippy formula, written independently (OSM wiki form)."""
    lat = max(min(lat, tiles.MAX_LAT), -tiles.MAX_LAT)
    n = 2 ** zoom
    x = int((lon + 180.0) / 360.0 * n)
    lat_r = math.radians(lat)
    y = int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n)
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def test_lonlat_to_tile_matches_oracle():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    for z in (0, 4, 8, 12):
        x, y = tiles.lonlat_to_tile(lon, lat, z)
        for i in range(len(lon)):
            assert (x[i], y[i]) == oracle_tile(lon[i], lat[i], z), (lon[i], lat[i], z)


def test_tile_bounds_inverse():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-80, 80, 200)
    z = 10
    x, y = tiles.lonlat_to_tile(lon, lat, z)
    w, s, e, n = tiles.tile_bounds(x, y, z)
    assert ((lon >= w) & (lon < e + 1e-12)).all()
    assert ((lat >= s - 1e-9) & (lat <= n + 1e-9)).all()


def test_pack_unpack_parent():
    z = np.array([10, 10, 3])
    x = np.array([511, 0, 7])
    y = np.array([340, 1023, 0])
    k = tiles.pack(z, x, y)
    zz, xx, yy = tiles.unpack(k)
    assert (zz == z).all() and (xx == x).all() and (yy == y).all()
    pk = tiles.parent(k, np.array([8, 8, 2]))
    pz, px, py = tiles.unpack(pk)
    assert (pz == [8, 8, 2]).all()
    assert (px == x >> np.array([2, 2, 1])).all()
    assert (py == y >> np.array([2, 2, 1])).all()


def test_cover_expand():
    x0 = np.array([0, 5])
    x1 = np.array([1, 5])
    y0 = np.array([0, 2])
    y1 = np.array([2, 2])
    row, x, y = tiles.cover_expand(x0, x1, y0, y1)
    got = set(zip(row.tolist(), x.tolist(), y.tolist()))
    want = {(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, 0), (0, 1, 1), (0, 1, 2), (1, 5, 2)}
    assert got == want


def test_k_ring():
    k = tiles.pack(np.array([5]), np.array([10]), np.array([10]))
    row, nbrs = tiles.k_ring(k, 1)
    z, x, y = tiles.unpack(nbrs)
    assert len(nbrs) == 9
    assert set(zip(x.tolist(), y.tolist())) == {
        (a, b) for a in (9, 10, 11) for b in (9, 10, 11)
    }
    # edge clamp at x=0
    k0 = tiles.pack(np.array([5]), np.array([0]), np.array([0]))
    _, nb0 = tiles.k_ring(k0, 1)
    _, x0, y0 = tiles.unpack(nb0)
    assert x0.min() == 0 and y0.min() == 0


def test_plan_zoom_matches_fd_budget_semantics():
    # whole-world bbox: zoom walks down until <=750 tiles (split_combine.go:440-448)
    z = tiles.plan_zoom(-180, -85, 180, 85, 12, max_grid=750)
    assert tiles.size_grid(-180, -85, 180, 85, z) <= 750
    assert tiles.size_grid(-180, -85, 180, 85, z + 1) > 750


def test_k_ring_wraps_antimeridian():
    """x must wrap across lon=±180 (cells x=0 and x=2^z-1 are
    geographically adjacent); y clips at the poles."""
    z = 4
    n = 1 << z
    k = tiles.pack(np.array([z]), np.array([0]), np.array([5]))
    _, ring = tiles.k_ring(k, 1)
    zz, xx, yy = tiles.unpack(ring)
    assert set(xx.tolist()) == {n - 1, 0, 1}
    assert set(yy.tolist()) == {4, 5, 6}
    # pole side clips
    k2 = tiles.pack(np.array([z]), np.array([5]), np.array([0]))
    _, ring2 = tiles.k_ring(k2, 1)
    _, _, yy2 = tiles.unpack(ring2)
    assert yy2.min() == 0 and set(yy2.tolist()) == {0, 1}
