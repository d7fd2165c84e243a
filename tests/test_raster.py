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
