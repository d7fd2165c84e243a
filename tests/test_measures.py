"""Geometry measures vs a scalar shoelace/length oracle.

The kernel under test (spatial/measures.py) is fully segmented numpy;
the oracle below is deliberately per-feature Python so a vectorization
bug cannot hide in shared code.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.spatial.measures import geometry_measures, measures_batch

Q = 1e7


def _feat_table(feats):
    """feats: list of (fid, gtype, dim, rings) where rings is a list of
    polys, each poly a list of rings, each ring a list of (x, y[, z])
    tuples — flattened into the canonical feature-table layout."""
    ids, gt, dims, coords, ring_sizes, poly_sizes = [], [], [], [], [], []
    for fid, gtype, dim, polys in feats:
        ids.append(fid)
        gt.append(gtype)
        dims.append(dim)
        flat, rs, ps = [], [], []
        for rings in polys:
            ps.append(len(rings))
            for ring in rings:
                rs.append(len(ring))
                for pt in ring:
                    flat.extend(pt)
        coords.append(flat)
        ring_sizes.append(rs)
        poly_sizes.append(ps)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "geom_type": pa.array(np.array(gt, np.int8)),
        "dim": pa.array(np.array(dims, np.int8)),
        "coords": pa.array(coords, pa.list_(pa.float64())),
        "ring_sizes": pa.array(ring_sizes, pa.list_(pa.int32())),
        "poly_sizes": pa.array(poly_sizes, pa.list_(pa.int32())),
    })


def _scalar_oracle(fid, gtype, polys):
    """Per-feature scalar reference: signed doubled area (quantized),
    Manhattan perimeter (quantized), Euclidean length (degrees)."""
    area2 = 0
    mh = 0
    length = 0.0
    nver = 0
    is_poly = gtype in (3, 6)
    is_line = gtype in (2, 5)
    for rings in polys:
        for ring in rings:
            nver += len(ring)
            qr = [(int(np.float64(x) * Q), int(np.float64(y) * Q))
                  for x, y, *_ in ring]
            edges = []
            for i in range(len(qr) - 1):
                edges.append((qr[i], qr[i + 1]))
            if is_poly and len(qr):
                edges.append((qr[-1], qr[0]))  # implicit closure
            if not (is_poly or is_line):
                edges = []
            x0, y0 = qr[0] if qr else (0, 0)
            for (xa, ya), (xb, yb) in edges:
                if is_poly:
                    area2 += (xa - x0) * (yb - y0) - (xb - x0) * (ya - y0)
                mh += abs(xb - xa) + abs(yb - ya)
                length += math.hypot((xb - xa) / Q, (yb - ya) / Q)
    if not is_poly:
        area2 = 0
    return area2, mh, length, nver


CASES = [
    # closed CCW triangle
    (1, 3, 2, [[[(-10.0, -5.0), (3.123, 4.5), (-2.0, 8.25), (-10.0, -5.0)]]]),
    # UNCLOSED ring (kernel must add the closing edge)
    (2, 3, 2, [[[(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)]]]),
    # CW square (negative signed area)
    (3, 3, 2, [[[(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]]]),
    # polygon with a CW hole: exterior 10x10, hole 2x2
    (4, 3, 2, [[
        [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
        [(2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0), (2.0, 2.0)],
    ]]),
    # multipolygon: two squares
    (5, 6, 2, [
        [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]],
        [[(5.0, 5.0), (7.0, 5.0), (7.0, 7.0), (5.0, 7.0), (5.0, 5.0)]],
    ]),
    # linestring: open polyline, no closing edge, zero area
    (6, 2, 2, [[[(0.0, 0.0), (3.0, 4.0), (3.0, 8.0)]]]),
    # multilinestring
    (7, 5, 2, [[[(0.0, 0.0), (1.0, 1.0)]], [[(2.0, 2.0), (2.5, 2.0), (2.5, 9.5)]]]),
    # point / multipoint: no edges at all
    (8, 1, 2, [[[(12.5, -33.25)]]]),
    (9, 4, 2, [[[(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)]]]),
    # dim-3 triangle (z ignored by planar measures)
    (10, 3, 3, [[[(0.0, 0.0, 100.0), (6.0, 0.0, 200.0),
                  (6.0, 6.0, 300.0), (0.0, 0.0, 400.0)]]]),
]


def test_measures_vs_scalar_oracle():
    tbl = _feat_table(CASES)
    out = measures_batch(tbl).to_pandas().set_index("id")
    for fid, gtype, dim, polys in CASES:
        area2, mh, length, nver = _scalar_oracle(fid, gtype, polys)
        row = out.loc[fid]
        assert row.area2_q == area2, (fid, row.area2_q, area2)
        assert row.perim_mh_q == mh, (fid, row.perim_mh_q, mh)
        assert row.length_deg == pytest.approx(length, rel=1e-12), fid
        assert row.n_vertices == nver


def test_hole_subtracts_and_signs():
    out = measures_batch(_feat_table(CASES)).to_pandas().set_index("id")
    # CCW exterior positive, CW square negative
    assert out.loc[1].area2_q > 0
    assert out.loc[3].area2_q == -2 * int(2 * Q) * int(2 * Q)
    # hole case: 10x10 minus 2x2, doubled, in quanta^2
    assert out.loc[4].area2_q == 2 * (100 - 4) * int(Q) * int(Q)
    # multipolygon sums parts: 1 + 4 squares
    assert out.loc[5].area2_q == 2 * 5 * int(Q) * int(Q)


def test_area_centroid_rect():
    tbl = _feat_table([(1, 3, 2, [[[(2.0, 3.0), (6.0, 3.0), (6.0, 5.0),
                                    (2.0, 5.0), (2.0, 3.0)]]])])
    out = measures_batch(tbl).to_pandas().iloc[0]
    assert out.centroid_x == pytest.approx(4.0, abs=1e-9)
    assert out.centroid_y == pytest.approx(4.0, abs=1e-9)
    assert out.length_deg == pytest.approx(12.0, rel=1e-12)


def test_empty_and_zero_rings():
    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "geom_type": pa.array(np.array([3, 2], np.int8)),
        "dim": pa.array(np.array([2, 2], np.int8)),
        "coords": pa.array([[], [0.0, 0.0, 1.0, 0.0]], pa.list_(pa.float64())),
        "ring_sizes": pa.array([[], [0, 2]], pa.list_(pa.int32())),
        "poly_sizes": pa.array([[], [1]], pa.list_(pa.int32())),
    })
    out = measures_batch(tbl).to_pandas().set_index("id")
    assert out.loc[1].area2_q == 0 and out.loc[1].n_vertices == 0
    assert out.loc[2].perim_mh_q == int(Q)  # one unit edge survives


def test_dataset_level(ray_session):
    import ray

    tbl = _feat_table(CASES)
    out = geometry_measures(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == len(CASES)
    ref = measures_batch(tbl).to_pandas()
    assert sorted(out.area2_q) == sorted(ref.area2_q)


def test_quantized_matches_codec_roundtrip():
    """Measures after an encode->decode roundtrip equal measures on the
    pristine table — the dequantize requantization identity extends to
    derived integer measures."""
    from geobuf_ray.codec import decode as dc
    from geobuf_ray.codec import feature as fc

    tbl = _feat_table([c for c in CASES if c[1] in (2, 3, 5, 6)])
    direct = measures_batch(tbl).to_pandas()
    rt = measures_batch(dc.decode_batch(fc.encode_batch(tbl))).to_pandas()
    for col in ("area2_q", "perim_mh_q", "n_vertices"):
        assert list(direct[col]) == list(rt[col]), col


def test_wide_feature_exact_and_overflow_guard():
    """bbox-centering keeps a 300-degree-wide polygon exact; a
    near-world polygon whose |2A| genuinely exceeds int64 raises."""
    wide = [(-170., -80.), (130., -80.), (130., 20.),
            (-170., 20.), (-170., -80.)]
    tbl = _feat_table([(1, 3, 2, [[wide]])])
    out = measures_batch(tbl).to_pandas().iloc[0]
    assert out.area2_q == 2 * (300 * 10**7) * (100 * 10**7)
    world = [(-180., -85.), (180., -85.), (180., 85.),
             (-180., 85.), (-180., -85.)]
    import pytest as _pytest

    with _pytest.raises(OverflowError):
        measures_batch(_feat_table([(1, 3, 2, [[world]])]))


def test_directed_hausdorff_scalar_and_empty_group(ray_session):
    import random

    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.spatial.measures import directed_hausdorff_groups

    rng = random.Random(21)
    pts = [(rng.randrange(-50, 50), rng.randrange(-50, 50),
            rng.choice([0, 1, 3]))  # group 2 empty
           for _ in range(120)]
    tbl = pa.table({"x": pa.array([p[0] for p in pts], pa.int64()),
                    "y": pa.array([p[1] for p in pts], pa.int64()),
                    "code": pa.array([p[2] for p in pts], pa.int64())})
    xy = np.array([(p[0], p[1]) for p in pts], np.int64)
    codes = np.array([p[2] for p in pts], np.int64)
    out = directed_hausdorff_groups(
        ray.data.from_arrow(tbl).repartition(5), xy, codes, ncodes=4)
    got = {(a, b): d for a, b, d in zip(out["code_a"].to_pylist(),
                                        out["code_b"].to_pylist(),
                                        out["hausdorff_d2"].to_pylist())}
    # scalar replay
    from collections import defaultdict
    g = defaultdict(list)
    for x, y, c in pts:
        g[c].append((x, y))
    want = {}
    for a in g:
        for b in g:
            if a == b:
                continue
            want[(a, b)] = max(
                min((ax - bx) ** 2 + (ay - by) ** 2
                    for bx, by in g[b]) for ax, ay in g[a])
    assert got == want
    assert not any(2 in p for p in got)  # empty group never pairs


def _frechet_scalar(A, B):
    c = {}
    m, p = len(A), len(B)
    for i in range(m):
        for j in range(p):
            dx = A[i][0] - B[j][0]
            dy = A[i][1] - B[j][1]
            dd = dx * dx + dy * dy
            if i == 0 and j == 0:
                c[i, j] = dd
            elif i == 0:
                c[i, j] = max(c[i, j - 1], dd)
            elif j == 0:
                c[i, j] = max(c[i - 1, j], dd)
            else:
                c[i, j] = max(dd, min(c[i - 1, j], c[i - 1, j - 1],
                                      c[i, j - 1]))
    return c[m - 1, p - 1]


def test_frechet_pairs_match_scalar_dp():
    from geobuf_ray.spatial.measures import discrete_frechet_pairs

    rng = np.random.default_rng(4)
    n, m, p = 80, 7, 9
    ax = rng.integers(-500, 500, (n, m))
    ay = rng.integers(-500, 500, (n, m))
    bx = rng.integers(-500, 500, (n, p))
    by = rng.integers(-500, 500, (n, p))
    got = discrete_frechet_pairs(ax, ay, bx, by)
    for k in range(n):
        A = list(zip(ax[k], ay[k]))
        B = list(zip(bx[k], by[k]))
        assert got[k] == _frechet_scalar(A, B), k


def test_frechet_stutter_pad_invariance():
    from geobuf_ray.spatial.measures import discrete_frechet_pairs

    rng = np.random.default_rng(5)
    for _ in range(30):
        la, lb = rng.integers(1, 8), rng.integers(1, 8)
        A = rng.integers(-100, 100, (la, 2))
        B = rng.integers(-100, 100, (lb, 2))
        m = 10  # pad both to 10 by repeating the last point
        ax = np.concatenate([A[:, 0], np.full(m - la, A[-1, 0])])[None]
        ay = np.concatenate([A[:, 1], np.full(m - la, A[-1, 1])])[None]
        bx = np.concatenate([B[:, 0], np.full(m - lb, B[-1, 0])])[None]
        by = np.concatenate([B[:, 1], np.full(m - lb, B[-1, 1])])[None]
        got = discrete_frechet_pairs(ax, ay, bx, by)[0]
        assert got == _frechet_scalar(
            [tuple(r) for r in A], [tuple(r) for r in B])


def test_frechet_coordinate_guard():
    from geobuf_ray.spatial.measures import discrete_frechet_pairs

    big = np.full((1, 2), 1 << 31)
    with pytest.raises(OverflowError):
        discrete_frechet_pairs(big, big, big, big)


def test_viterbi_minplus_matches_naive_dp():
    from geobuf_ray.spatial.measures import viterbi_decode_costs

    rng = np.random.default_rng(9)
    U, T, S = 10, 6, 13
    emit = rng.integers(0, 5000, (U, T, S)).astype(np.int64)
    lam = 211
    cost, last = viterbi_decode_costs(emit, lam)
    for u in range(U):
        c = [int(x) for x in emit[u, 0]]
        for t in range(1, T):
            c = [min(c[p] + lam * abs(p - s) for p in range(S))
                 + int(emit[u, t, s]) for s in range(S)]
        assert int(cost[u]) == min(c)
        assert int(last[u]) == c.index(min(c))


def test_viterbi_transition_actually_smooths():
    from geobuf_ray.spatial.measures import viterbi_decode_costs

    # two states; emissions alternate which is cheaper by 1, but
    # switching costs 100 — the decode must stay put
    emit = np.array([[[0, 1], [1, 0], [0, 1], [1, 0]]], np.int64)
    cost, last = viterbi_decode_costs(emit, 100)
    assert int(cost[0]) == 2  # stay in state 0: 0+1+0+1
    assert int(last[0]) == 0
    # with a free transition it zigzags
    cost2, _ = viterbi_decode_costs(emit, 0)
    assert int(cost2[0]) == 0


def test_token_edit_pairs_vs_scalar():
    from geobuf_ray.spatial.measures import token_edit_distance_pairs

    def scalar(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            nd = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                            d[j - 1] + (a[i - 1] != b[j - 1]))
            d = nd
        return d[len(b)]

    rng = np.random.default_rng(15)
    N, M, P = 60, 12, 10
    la = rng.integers(0, M + 1, N)
    lb = rng.integers(0, P + 1, N)
    A = rng.integers(0, 4, (N, M))
    B = rng.integers(0, 4, (N, P))
    got = token_edit_distance_pairs(A, B, la, lb)
    for i in range(N):
        assert got[i] == scalar(list(A[i, :la[i]]),
                                list(B[i, :lb[i]])), i


def test_dtw_distance_pairs_brute_force():
    """dtw_distance_pairs vs a scalar DP replay on random integer
    trajectories of MIXED true lengths (padding must not
    contaminate), plus identity (dtw(a,a)=0) and single-point
    cases."""
    from geobuf_ray.spatial.measures import dtw_distance_pairs

    def scalar_dtw(A, B):
        m, p = len(A), len(B)
        D = np.full((m, p), 1 << 60, np.int64)
        for i in range(m):
            for j in range(p):
                d = (A[i][0]-B[j][0])**2 + (A[i][1]-B[j][1])**2
                if i == 0 and j == 0:
                    D[i, j] = d
                elif i == 0:
                    D[i, j] = D[i, j-1] + d
                elif j == 0:
                    D[i, j] = D[i-1, j] + d
                else:
                    D[i, j] = d + min(D[i-1, j], D[i, j-1], D[i-1, j-1])
        return int(D[m-1, p-1])

    rng = np.random.RandomState(17)
    npairs, M = 40, 7
    la = rng.randint(1, M + 1, npairs)
    lb = rng.randint(1, M + 1, npairs)
    ax = rng.randint(0, 50, (npairs, M)).astype(np.int64)
    ay = rng.randint(0, 50, (npairs, M)).astype(np.int64)
    bx = rng.randint(0, 50, (npairs, M)).astype(np.int64)
    by = rng.randint(0, 50, (npairs, M)).astype(np.int64)
    # poison the padding: it must never be read
    for k in range(npairs):
        ax[k, la[k]:] = 999999
        by[k, lb[k]:] = -999999
    got = dtw_distance_pairs(ax, ay, bx, by, la, lb)
    for k in range(npairs):
        A = list(zip(ax[k, :la[k]], ay[k, :la[k]]))
        B = list(zip(bx[k, :lb[k]], by[k, :lb[k]]))
        assert got[k] == scalar_dtw(A, B), k
    # identity and single-point
    same = dtw_distance_pairs(ax, ay, ax, ay, la, la)
    assert (same == 0).all()
    one = dtw_distance_pairs(
        np.array([[3]]), np.array([[4]]), np.array([[0]]),
        np.array([[0]]), np.array([1]), np.array([1]))
    assert one[0] == 25
