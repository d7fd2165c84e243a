"""Oracles for functions/linalg: exact quantized covariance and PCA.

The covariance operator promises BIT-stable float64 output under any
partitioning (integer moments merged in Python ints, fixed-order
final division), so the tests assert bit equality, not allclose.
"""
import numpy as np
import pyarrow as pa

from geobuf_ray.functions.linalg import (covariance_matrix,
                                         pca_components, pca_project)


def _make(n=700, d=5, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    base[:, 1] = 0.7 * base[:, 0] + 0.1 * base[:, 1]  # correlation
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base), pa.list_(pa.float32())),
    }), base


def _expected_cov(base, bits=20):
    q = np.floor(base.astype(np.float64) * (1 << bits) + 0.5)
    n, d = q.shape
    qi = q.astype(object)  # exact integer arithmetic
    S = qi.sum(axis=0)
    P = qi.T @ qi
    out = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            num = n * P[i, j] - S[i] * S[j]
            out[i, j] = float(num) / (float(n) * float(n)) \
                / float(1 << (2 * bits))
    return out


def test_covariance_exact_and_partition_invariant(ray_session):
    import ray

    tbl, base = _make()
    expect = _expected_cov(base)
    a = covariance_matrix(
        ray.data.from_arrow(tbl).repartition(7), "embedding")
    b = covariance_matrix(
        ray.data.from_arrow(tbl).repartition(2), "embedding")
    for t in (a, b):
        i = t["i"].to_numpy(zero_copy_only=False)
        j = t["j"].to_numpy(zero_copy_only=False)
        c = t["cov"].to_numpy(zero_copy_only=False)
        assert len(c) == 5 * 6 // 2
        assert (c.view(np.int64) ==
                expect[i, j].view(np.int64)).all()


def test_pca_matches_dense_eigh(ray_session):
    import ray

    tbl, base = _make(n=900, d=6, seed=4)
    cov = _expected_cov(base)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    comps = v[:, order].T
    for t in range(2):
        m = np.argmax(np.abs(comps[t]))
        if comps[t, m] < 0:
            comps[t] = -comps[t]

    got_c, got_mu, ratios = pca_components(
        ray.data.from_arrow(tbl).repartition(4), "embedding", k=2)
    assert np.allclose(got_c, comps, atol=1e-10)
    assert ratios[0] >= ratios[1] > 0
    # projection equals direct numpy projection of centered data
    out = pca_project(ray.data.from_arrow(tbl).repartition(4),
                      "embedding", k=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    mu = base.astype(np.float64).mean(axis=0)
    assert np.allclose(got_mu, mu, atol=1e-6)  # quantized mean
    expect_proj = (base.astype(np.float64) - got_mu) @ got_c.T
    assert np.allclose(out[["pc1", "pc2"]].to_numpy(), expect_proj,
                       atol=1e-9)


def test_covariance_fixed_size_list_and_empty(ray_session):
    import ray

    base = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 9.0]],
                    dtype=np.float32)
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(base.ravel(), pa.float32()), 2),
    })
    t = covariance_matrix(ray.data.from_arrow(tbl), "embedding")
    expect = _expected_cov(base)
    c = t["cov"].to_numpy(zero_copy_only=False)
    i = t["i"].to_numpy(zero_copy_only=False)
    j = t["j"].to_numpy(zero_copy_only=False)
    assert (c.view(np.int64) == expect[i, j].view(np.int64)).all()
