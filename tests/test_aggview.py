"""Incremental materialized aggregate view: delta maintenance ==
recompute, partition pruning byte-identity, over-retraction guard,
zero-count group drop, type refusal."""

import os

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.state.aggview import (build_agg_view, read_agg_view,
                                      refresh_agg_view)


def _rows(keys, vals):
    return pa.table({"k": pa.array(np.asarray(keys, np.int64)),
                     "v": pa.array(np.asarray(vals, np.int64))})


def _view_state(d):
    t = read_agg_view(d).take_all()
    return {r["k"]: (r["n_rows"], r["sum_v"]) for r in t}


def _fingerprints(d):
    out = {}
    for f in os.listdir(d):
        if f.startswith("part-"):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = fh.read()
    return out


def _build(ray, tmp_path, keys, vals, name="view", nparts=8):
    d = str(tmp_path / name)
    build_agg_view(ray.data.from_arrow(_rows(keys, vals)).repartition(3),
                   d, key="k", sums={"sum_v": "v"}, npartitions=nparts)
    return d


def test_refresh_equals_recompute(ray_session, tmp_path):
    import ray

    rng = np.random.default_rng(7)
    k0, v0 = rng.integers(0, 40, 300), rng.integers(0, 100, 300)
    d = _build(ray, tmp_path, k0, v0)

    # insert refresh
    k1, v1 = rng.integers(0, 50, 120), rng.integers(0, 100, 120)
    refresh_agg_view(d, ray.data.from_arrow(_rows(k1, v1)), weight=1)
    # retract a subset of what was inserted (first 40 insert rows)
    refresh_agg_view(d, ray.data.from_arrow(_rows(k1[:40], v1[:40])),
                     weight=-1)

    kk = np.concatenate([k0, k1[40:]])
    vv = np.concatenate([v0, v1[40:]])
    want = {}
    for k, v in zip(kk.tolist(), vv.tolist()):
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert _view_state(d) == want


def test_pruning_untouched_partitions_byte_identical(ray_session,
                                                     tmp_path):
    import ray

    d = _build(ray, tmp_path, np.arange(200) % 64,
               np.arange(200), nparts=16)
    before = _fingerprints(d)
    # a delta touching ONE key → at most one partition rewritten
    res = refresh_agg_view(d, ray.data.from_arrow(_rows([5, 5], [7, 9])))
    after = _fingerprints(d)
    assert len(res["touched"]) == 1 and res["untouched"] == 15
    changed = [f for f in before if before[f] != after[f]]
    assert len(changed) == 1
    st = _view_state(d)
    k = np.arange(200) % 64
    n5 = int((k == 5).sum())
    s5 = int(np.arange(200)[k == 5].sum())
    assert st[5] == (n5 + 2, s5 + 16)


def test_over_retraction_raises(ray_session, tmp_path):
    import ray

    d = _build(ray, tmp_path, [1, 1, 2], [10, 20, 30])
    with pytest.raises(ValueError, match="over-retraction"):
        refresh_agg_view(
            d, ray.data.from_arrow(_rows([1, 1, 1], [10, 20, 5])),
            weight=-1)


def test_full_retraction_drops_group(ray_session, tmp_path):
    import ray

    d = _build(ray, tmp_path, [1, 1, 2], [10, 20, 30])
    refresh_agg_view(d, ray.data.from_arrow(_rows([1, 1], [10, 20])),
                     weight=-1)
    assert _view_state(d) == {2: (1, 30)}


def test_guards(ray_session, tmp_path):
    import ray

    d = _build(ray, tmp_path, [1], [10])
    with pytest.raises(ValueError, match="weight"):
        refresh_agg_view(d, ray.data.from_arrow(_rows([1], [1])),
                         weight=2)
    bad = pa.table({"k": pa.array([1], pa.int64()),
                    "v": pa.array([1.5], pa.float64())})
    with pytest.raises(Exception, match="integer-typed"):
        build_agg_view(ray.data.from_arrow(bad), str(tmp_path / "bad"),
                       key="k", sums={"sum_v": "v"})


def test_null_values_rejected(ray_session, tmp_path):
    import ray

    d = _build(ray, tmp_path, [1, 2], [10, 20])
    bad = pa.table({"k": pa.array([1, None], pa.int64()),
                    "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        refresh_agg_view(d, ray.data.from_arrow(bad))
    bad2 = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        refresh_agg_view(d, ray.data.from_arrow(bad2))


def test_zero_count_nonzero_sum_retraction_rejected(ray_session,
                                                    tmp_path):
    """Retracting the right NUMBER of rows but the wrong VALUES must
    raise, not silently drop the group with a residual sum."""
    import ray

    d = _build(ray, tmp_path, [1], [10])
    with pytest.raises(Exception, match="residual"):
        refresh_agg_view(d, ray.data.from_arrow(_rows([1], [25])),
                         weight=-1)
