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


def _blob_table(rng, n_blobs=6, per=30, d=16, dups=4):
    import pyarrow as pa

    centers = rng.normal(0, 10, (n_blobs, d))
    rows = []
    for i in range(n_blobs):
        pts = centers[i] + rng.normal(0, 0.5, (per, d))
        rows.append(pts)
    X = np.concatenate(rows)
    # planted exact duplicates of the first `dups` rows, appended last
    X = np.concatenate([X, X[:dups]])
    ids = np.arange(len(X), dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64()))}), X


def test_semantic_dedup_vs_scalar_reference(ray_session):
    import ray

    from geobuf_ray.functions.cluster import kmeans_assign, kmeans_fit
    from geobuf_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(17)
    tbl, X = _blob_table(rng)
    ds = ray.data.from_arrow(tbl).repartition(5)
    # exact-duplicate-only threshold: intra-blob cosines reach ~0.999
    # because the blob centers dominate the noise
    tau = 1.0 - 1e-9
    out = semantic_dedup(ds, col="embedding", id_col="vec_id",
                         k=6, iters=4, threshold=tau,
                         nbuckets=4, seed=0).to_pandas()
    assert len(out) == len(X)
    # scalar reference: identical kmeans (deterministic), then a
    # per-cluster O(n^2) loop applying the min-id survivor rule
    cent, _ = kmeans_fit(ray.data.from_arrow(tbl).repartition(5),
                         "embedding", k=6, iters=4, id_col="vec_id",
                         seed=0)
    assign = kmeans_assign(ray.data.from_arrow(tbl), cent,
                           "embedding").to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()
    norms = np.sqrt((X * X).sum(axis=1))
    xn = X / norms[:, None]
    want_keep = {}
    for i in range(len(X)):
        dup = False
        for j in range(len(X)):
            if j != i and assign[j] == assign[i] and j < i \
                    and float(xn[j] @ xn[i]) >= tau:
                dup = True
                break
        want_keep[i] = not dup
    got = dict(zip(out["vec_id"], out["keep"]))
    assert got == want_keep
    # every planted exact duplicate dropped, its original kept
    n = len(X) - 4
    for d_ in range(4):
        assert got[n + d_] is np.bool_(False) or got[n + d_] == False  # noqa: E712
        assert got[d_]


def test_semantic_dedup_partition_invariance(ray_session):
    import ray

    from geobuf_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(23)
    tbl, _ = _blob_table(rng, n_blobs=4, per=20, dups=2)
    outs = []
    for nb in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nb)
        outs.append(semantic_dedup(ds, col="embedding", id_col="vec_id",
                                   k=4, iters=3, threshold=0.999,
                                   nbuckets=3, seed=1).to_pandas()
                    .sort_values("vec_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_semantic_dedup_cluster_cap_truncates(ray_session):
    import ray
    import pyarrow as pa

    from geobuf_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(29)
    # one tight blob bigger than the cap
    X = rng.normal(0, 0.01, (50, 8)) + 5.0
    tbl = pa.table({"vec_id": pa.array(np.arange(50, dtype=np.int64)),
                    "embedding": pa.array([r.tolist() for r in X],
                                          pa.list_(pa.float64()))})
    out = semantic_dedup(ray.data.from_arrow(tbl).repartition(3),
                         col="embedding", id_col="vec_id", k=1, iters=2,
                         threshold=0.9999, nbuckets=2,
                         cluster_cap=10).to_pandas()
    assert out["truncated"].all()
    # rows beyond the cap still compare against the 10 lowest ids
    assert not out.loc[out["vec_id"] > 10, "keep"].any()
