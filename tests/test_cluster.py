"""Oracles for functions/cluster: exact numpy Lloyd reference and
partition invariance (centroids promised bit-identical)."""
import numpy as np
import pyarrow as pa

from geobuf_ray.functions.cluster import kmeans_assign, kmeans_fit
from geobuf_ray.functions.dedup import _mix


def _make(n=600, d=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 2.0, (3, d))
    x = (centers[rng.integers(0, 3, n)]
         + rng.normal(0, 0.3, (n, d))).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
    }), x


def _reference(x, ids, k, iters, seed=0, bits=20):
    h = _mix(ids.view(np.uint64), 0xC105 ^ seed)
    cent = x.astype(np.float64)[np.argsort(h, kind="stable")[:k]].copy()
    scale = float(1 << bits)
    for _ in range(iters):
        scores = 2.0 * (x.astype(np.float64) @ cent.T) \
            - (cent * cent).sum(axis=1)[None, :]
        assign = np.argmax(scores, axis=1)
        q = np.floor(x.astype(np.float64) * scale + 0.5).astype(object)
        new = cent.copy()
        counts = np.zeros(k, np.int64)
        for c in range(k):
            m = assign == c
            counts[c] = m.sum()
            if counts[c]:
                s = q[m].sum(axis=0)  # exact (object ints)
                new[c] = np.array([float(v) / float(counts[c])
                                   for v in s]) / scale
        cent = new
    return cent, counts


def test_kmeans_exact_vs_reference_and_partitions(ray_session):
    import ray

    tbl, x = _make()
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    expect_c, expect_n = _reference(x, ids, k=3, iters=5)
    for parts in (1, 6):
        cent, counts = kmeans_fit(
            ray.data.from_arrow(tbl).repartition(parts),
            "embedding", k=3, iters=5)
        assert (cent.view(np.int64) == expect_c.view(np.int64)).all()
        assert (counts == expect_n).all()


def test_kmeans_assign_recovers_clusters(ray_session):
    import ray

    tbl, x = _make(n=900, seed=8)
    ds = ray.data.from_arrow(tbl).repartition(4)
    cent, counts = kmeans_fit(ds, "embedding", k=3, iters=10)
    out = kmeans_assign(ds, cent, "embedding").to_pandas()
    assert set(out.cluster.unique()) <= {0, 1, 2}
    # well-separated synthetic blobs: every cluster non-trivial and
    # assignment matches the nearest centroid recomputed directly
    d2 = ((x.astype(np.float64)[:, None, :]
           - cent[None, :, :]) ** 2).sum(axis=2)
    expect = d2.argmin(axis=1)
    got = out.sort_values("vec_id").cluster.to_numpy()
    assert (got == expect).all()
    assert (np.bincount(got, minlength=3) > 50).all()
