"""Bloom prefilter: no false negatives, designed FP rate, exact
semi-join equivalence."""

import numpy as np
import pyarrow as pa


def test_bloom_no_false_negatives_and_fp_rate():
    from geobuf_ray.functions.bloom import _positions, bloom_contains

    rng = np.random.default_rng(5)
    members = rng.integers(0, 1 << 60, 20000).astype(np.uint64)
    nbits, k = 1 << 20, 7
    nwords = nbits // 64
    bits = np.zeros(nwords, np.uint64)
    from geobuf_ray.functions.join import _key_hash

    h = _key_hash(pa.array(members.astype(np.int64)))
    pos = _positions(h, nbits, k).ravel()
    np.bitwise_or.at(bits, pos >> 6,
                     np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    tbl = pa.table({"x": pa.array(members.astype(np.int64))})
    assert bloom_contains(tbl, ["x"], bits, k=k).all()
    # non-members: FP rate should be near (1-e^{-kn/m})^k ~ 0.4% here;
    # allow generous slack
    others = pa.table({"x": pa.array(
        rng.integers(1 << 61, 1 << 62, 20000).astype(np.int64))})
    fp = bloom_contains(others, ["x"], bits, k=k).mean()
    assert fp < 0.05


def test_bloom_semi_join_equals_semi_join(ray_session):
    import ray

    from geobuf_ray.functions.bloom import bloom_semi_join
    from geobuf_ray.functions.join import semi_join

    rng = np.random.default_rng(9)
    n = 12000
    left = pa.table({
        "key": pa.array([f"k{int(v)}" for v in rng.integers(0, 5000, n)]),
        "val": pa.array(rng.normal(0, 1, n)),
    })
    right = pa.table({"key": pa.array(
        [f"k{int(v)}" for v in rng.integers(0, 800, 600)])})
    lds = ray.data.from_arrow(left).repartition(5)
    rds = ray.data.from_arrow(right).repartition(3)
    a = bloom_semi_join(lds, rds, "key", nbits=1 << 16).to_pandas()
    b = semi_join(lds, rds, "key").to_pandas()
    sa = a.sort_values(["key", "val"]).reset_index(drop=True)
    sb = b.sort_values(["key", "val"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(sa, sb)
    # ground truth membership
    keys = set(right["key"].to_pylist())
    expect = sum(1 for v in left["key"].to_pylist() if v in keys)
    assert len(a) == expect


def test_bloom_prefilter_is_superset(ray_session):
    import ray

    from geobuf_ray.functions.bloom import bloom_build, bloom_prefilter

    rng = np.random.default_rng(3)
    left = pa.table({"k": pa.array(rng.integers(0, 1000, 8000))})
    right = pa.table({"k": pa.array(np.arange(0, 1000, 7))})
    bits = bloom_build(ray.data.from_arrow(right), "k", nbits=1 << 16)
    out = bloom_prefilter(ray.data.from_arrow(left).repartition(4),
                          "k", ray.put(bits)).to_pandas()
    members = set(range(0, 1000, 7))
    surv = set(out.k.unique())
    true_members = {int(v) for v in left["k"].to_numpy() if v in members}
    assert true_members <= surv  # no false negatives
