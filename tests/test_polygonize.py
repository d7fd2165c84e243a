"""Distributed CCL polygonize vs a scalar flood-fill reference."""

from collections import deque

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.spatial.polygonize import polygonize, union_tile_masks


def _ref_components(grid: np.ndarray):
    """Scalar BFS flood fill (4-connectivity) over the assembled
    raster -> {component_min_gid: (n, min_gx, min_gy, max_gx, max_gy)}."""
    H, W = grid.shape
    seen = np.zeros_like(grid, bool)
    out = {}
    for sy in range(H):
        for sx in range(W):
            if not grid[sy, sx] or seen[sy, sx]:
                continue
            q = deque([(sy, sx)])
            seen[sy, sx] = True
            cells = []
            while q:
                y, x = q.popleft()
                cells.append((y, x))
                for ny, nx in ((y - 1, x), (y + 1, x),
                               (y, x - 1), (y, x + 1)):
                    if 0 <= ny < H and 0 <= nx < W and grid[ny, nx] \
                            and not seen[ny, nx]:
                        seen[ny, nx] = True
                        q.append((ny, nx))
            gids = [y * W + x for y, x in cells]
            xs = [x for _, x in cells]
            ys = [y for y, _ in cells]
            out[min(gids)] = (len(cells), min(xs), min(ys),
                              max(xs), max(ys))
    return out


def _raster_rows(grid: np.ndarray, ntiles: int, px: int) -> pa.Table:
    """Slice the assembled grid into per-tile packed mask rows
    (row-major (y, x) bit order, matching rasterize_batch)."""
    txs, tys, masks = [], [], []
    for ty in range(ntiles):
        for tx in range(ntiles):
            sub = grid[ty * px:(ty + 1) * px, tx * px:(tx + 1) * px]
            if sub.any():
                txs.append(tx)
                tys.append(ty)
                masks.append(np.packbits(sub, axis=None).tobytes())
    return pa.table({"tile_x": pa.array(txs, pa.int64()),
                     "tile_y": pa.array(tys, pa.int64()),
                     "mask": pa.array(masks, pa.binary())})


def _check(grid, ntiles, px, ray_blocks=3):
    import ray

    rows = _raster_rows(grid, ntiles, px)
    ds = ray.data.from_arrow(rows).repartition(max(1, ray_blocks))
    got = polygonize(ds, ntiles=ntiles, px=px, nbuckets=4,
                     pre_unioned=True)
    want = _ref_components(grid)
    gd = {int(c): (int(n), int(a), int(b), int(x), int(y))
          for c, n, a, b, x, y in zip(
              got["component"].to_pylist(), got["n_pixels"].to_pylist(),
              got["min_gx"].to_pylist(), got["min_gy"].to_pylist(),
              got["max_gx"].to_pylist(), got["max_gy"].to_pylist())}
    assert gd == want


@pytest.mark.parametrize("density", [0.2, 0.5, 0.72])
def test_polygonize_random_vs_flood_fill(ray_session, density):
    rng = np.random.default_rng(int(density * 100))
    ntiles, px = 4, 8
    W = ntiles * px
    grid = rng.random((W, W)) < density
    _check(grid, ntiles, px)


def test_polygonize_structures(ray_session):
    ntiles, px = 4, 8
    W = ntiles * px
    grid = np.zeros((W, W), bool)
    # a cross-tile snake spanning all four tile rows
    grid[2, 1:W - 1] = True
    grid[2:W - 2, W - 2] = True
    grid[W - 3, 3:W - 2] = True
    # a full tile block
    grid[8:16, 8:16] = True
    # single isolated pixels incl. corners
    grid[0, 0] = grid[W - 1, W - 1] = grid[0, W - 1] = True
    # diagonal pixels: NOT connected under 4-connectivity
    grid[20, 2] = grid[21, 3] = True
    _check(grid, ntiles, px)


def test_polygonize_all_set_one_component(ray_session):
    ntiles, px = 3, 8
    grid = np.ones((24, 24), bool)
    _check(grid, ntiles, px)


def test_union_tile_masks(ray_session):
    import ray

    rng = np.random.default_rng(5)
    px = 8
    # three overlapping per-polygon masks on the same tile + one other
    m = [rng.random((px, px)) < 0.3 for _ in range(3)]
    rows = pa.table({
        "tile_x": pa.array([1, 1, 1, 2], pa.int64()),
        "tile_y": pa.array([0, 0, 0, 1], pa.int64()),
        "mask": pa.array([np.packbits(x, axis=None).tobytes()
                          for x in m + [m[0]]], pa.binary())})
    out = union_tile_masks(ray.data.from_arrow(rows).repartition(2),
                           px=px, nbuckets=2).to_pandas() \
        .sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    assert len(out) == 2
    u = np.unpackbits(np.frombuffer(out["mask"][0], np.uint8)) \
        .reshape(px, px).astype(bool)
    assert (u == (m[0] | m[1] | m[2])).all()


@pytest.mark.parametrize("density", [0.15, 0.6])
def test_focal_box_sum_vs_direct_conv(ray_session, density):
    import ray

    from geobuf_ray.spatial.raster import focal_box_sum

    rng = np.random.default_rng(int(density * 1000))
    ntiles, px = 4, 8
    W = ntiles * px
    grid = rng.random((W, W)) < density
    # force cross-tile windows: a solid band across every tile border
    grid[px - 1:px + 1, :] = True
    rows = _raster_rows(grid, ntiles, px)
    ds = ray.data.from_arrow(rows).repartition(3)
    out = focal_box_sum(ds, ntiles=ntiles, px=px, nbuckets=4).to_pandas()
    # direct reference: padded 3x3 convolution
    padded = np.zeros((W + 2, W + 2), np.int64)
    padded[1:-1, 1:-1] = grid
    conv = sum(padded[1 + dy:1 + dy + W, 1 + dx:1 + dx + W]
               for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    want = {(x, y): int(conv[y, x])
            for y, x in zip(*np.nonzero(grid))}
    got = {(int(r.gx), int(r.gy)): int(r.focal)
           for r in out.itertuples()}
    assert got == want
