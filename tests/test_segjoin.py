"""Segment-intersection join: independent rational-arithmetic oracle.

The engine decides intersection with the int64 CLRS orientation
predicate; the reference here solves the parametric system
``A1 + t(A2-A1) = B1 + u(B2-B1)`` in exact ``Fraction`` arithmetic —
a genuinely different formulation, so a shared-bug false pass is
implausible."""

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.spatial.segjoin import (segment_intersect_join,
                                        segments_intersect)


def _ref_intersect(a, b) -> bool:
    """Exact rational parametric intersection of closed segments."""
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b
    rx, ry = ax2 - ax1, ay2 - ay1
    sx, sy = bx2 - bx1, by2 - by1
    qpx, qpy = bx1 - ax1, by1 - ay1
    denom = rx * sy - ry * sx
    if denom != 0:
        t = Fraction(qpx * sy - qpy * sx, denom)
        u = Fraction(qpx * ry - qpy * rx, denom)
        return 0 <= t <= 1 and 0 <= u <= 1
    # parallel: intersect only if collinear AND 1-D projections overlap.
    # Check B1-A1 against BOTH directions — a degenerate (zero-length)
    # side makes its own cross product vacuously zero.
    if qpx * ry - qpy * rx != 0 or qpx * sy - qpy * sx != 0:
        return False
    # collinear (or one/both degenerate): closed-bbox overlap decides
    return (min(ax1, ax2) <= max(bx1, bx2)
            and min(bx1, bx2) <= max(ax1, ax2)
            and min(ay1, ay2) <= max(by1, by2)
            and min(by1, by2) <= max(ay1, ay2))


def _ref_pairs(A, B):
    out = set()
    for i, a in enumerate(A):
        for j, b in enumerate(B):
            if _ref_intersect(a, b):
                out.add((i, j))
    return out


def _rand_segs(rng, n, domain, maxlen):
    x1 = rng.integers(0, domain, n)
    y1 = rng.integers(0, domain, n)
    return np.stack([x1, y1,
                     x1 + rng.integers(-maxlen, maxlen + 1, n),
                     y1 + rng.integers(-maxlen, maxlen + 1, n)], axis=1)


def test_predicate_vs_rational_reference():
    rng = np.random.default_rng(7)
    # tiny domain + long segments force dense intersections, ties,
    # collinear overlaps and shared endpoints
    A = _rand_segs(rng, 60, 12, 8)
    B = _rand_segs(rng, 60, 12, 8)
    ii, jj = np.meshgrid(np.arange(60), np.arange(60), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    got = segments_intersect(
        A[ii, 0], A[ii, 1], A[ii, 2], A[ii, 3],
        B[jj, 0], B[jj, 1], B[jj, 2], B[jj, 3])
    want = _ref_pairs(A.tolist(), B.tolist())
    got_pairs = {(int(i), int(j)) for i, j in zip(ii[got], jj[got])}
    assert got_pairs == want
    assert len(want) > 100  # the case is actually dense


def test_predicate_planted_special_cases():
    # (a, b, expected)
    cases = [
        # proper crossing
        ((0, 0, 10, 10), (0, 10, 10, 0), True),
        # T-touch: endpoint of b on interior of a
        ((0, 0, 10, 0), (5, 0, 5, 7), True),
        # shared endpoint only
        ((0, 0, 10, 0), (10, 0, 20, 5), True),
        # collinear overlapping
        ((0, 0, 10, 0), (5, 0, 15, 0), True),
        # collinear touching at one point
        ((0, 0, 10, 0), (10, 0, 20, 0), True),
        # collinear disjoint
        ((0, 0, 10, 0), (11, 0, 20, 0), False),
        # parallel non-collinear
        ((0, 0, 10, 0), (0, 1, 10, 1), False),
        # near miss (would hit if extended)
        ((0, 0, 10, 10), (0, 10, 4, 6), False),
        # degenerate point on segment
        ((5, 5, 5, 5), (0, 0, 10, 10), True),
        # degenerate point off segment
        ((5, 6, 5, 6), (0, 0, 10, 10), False),
        # two equal degenerate points
        ((3, 3, 3, 3), (3, 3, 3, 3), True),
        # two distinct degenerate points
        ((3, 3, 3, 3), (4, 3, 4, 3), False),
    ]
    for a, b, exp in cases:
        got = bool(segments_intersect(
            *[np.array([v]) for v in a], *[np.array([v]) for v in b])[0])
        assert got == exp, (a, b, exp)
        assert _ref_intersect(a, b) == exp, ("reference disagrees", a, b)


def _ds(tbl: pa.Table, nblocks: int):
    import ray

    return ray.data.from_arrow(tbl).repartition(nblocks)


def _seg_table(S: np.ndarray) -> pa.Table:
    return pa.table({"id": pa.array(np.arange(len(S), dtype=np.int64)),
                     "x1": pa.array(S[:, 0]), "y1": pa.array(S[:, 1]),
                     "x2": pa.array(S[:, 2]), "y2": pa.array(S[:, 3])})


@pytest.mark.parametrize("cell", [4, 16, 1024])
def test_join_exactly_once_any_cell_size(ray_session, cell):
    """Segments much longer than the cell share MANY cells; every
    intersecting pair must still appear exactly once."""
    rng = np.random.default_rng(11)
    A = _rand_segs(rng, 80, 200, 120)
    B = _rand_segs(rng, 70, 200, 120)
    out = segment_intersect_join(
        _ds(_seg_table(A), 5), _ds(_seg_table(B), 4),
        cell=cell, nbuckets=8).to_pandas()
    got = list(zip(out["a_id"], out["b_id"]))
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == _ref_pairs(A.tolist(), B.tolist())


def test_join_negative_coords(ray_session):
    rng = np.random.default_rng(13)
    A = _rand_segs(rng, 50, 100, 60) - 50
    B = _rand_segs(rng, 50, 100, 60) - 50
    out = segment_intersect_join(
        _ds(_seg_table(A), 3), _ds(_seg_table(B), 3),
        cell=16, nbuckets=8).to_pandas()
    got = set(zip(out["a_id"], out["b_id"]))
    assert got == _ref_pairs(A.tolist(), B.tolist())


def test_join_coord_bound_raises(ray_session):
    S = np.array([[0, 0, 1 << 30, 5]], dtype=np.int64)
    T = np.array([[0, 0, 5, 5]], dtype=np.int64)
    with pytest.raises(Exception, match="2\\*\\*30"):
        segment_intersect_join(
            _ds(_seg_table(S), 1), _ds(_seg_table(T), 1),
            cell=64, nbuckets=2).to_pandas()


def test_line_merge_components(ray_session):
    from geobuf_ray.spatial.segjoin import line_merge_components

    # chain 0-1-2, a branching junction at (50,50) joining 3,4,5, a
    # closed ring 6-7-8, and an isolated segment 9
    segs = [
        (0, 0, 0, 10, 0), (1, 10, 0, 20, 0), (2, 20, 0, 30, 5),
        (3, 50, 50, 60, 50), (4, 50, 50, 50, 60), (5, 40, 40, 50, 50),
        (6, 100, 100, 110, 100), (7, 110, 100, 105, 110),
        (8, 105, 110, 100, 100),
        (9, 999, 999, 998, 998),
    ]
    arr = np.array(segs, np.int64)
    tbl = pa.table({"id": pa.array(arr[:, 0]),
                    "x1": pa.array(arr[:, 1]), "y1": pa.array(arr[:, 2]),
                    "x2": pa.array(arr[:, 3]), "y2": pa.array(arr[:, 4])})
    comp = line_merge_components(_ds(tbl, 3), nbuckets=4)
    got = dict(zip(comp["node"].to_pylist(),
                   comp["component"].to_pylist()))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3,
                   6: 6, 7: 6, 8: 6, 9: 9}
