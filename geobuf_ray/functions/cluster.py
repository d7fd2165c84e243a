"""Distributed k-means (Lloyd) over an embedding column.

Unlike ``ann.fit_centroids`` (mini k-means on a driver-side SAMPLE,
good enough for IVF cell layout), this is the full distributed
algorithm: every iteration is ONE streaming pass — centroids
broadcast via ``ray.put``, each block computes assignments with a
vectorized matmul and ships a ``(k x d)`` int64 partial (quantized
sums + counts), the driver merges partials and updates centroids.
Nothing but ``k x d`` scalars ever centralizes.

DETERMINISM: block partials quantize values to integers
(``floor(x * 2^b + 0.5)``), so the merged per-cluster sums are exact
and the updated centroids are bit-identical under any partitioning —
the same integer-moments discipline as ``linalg.covariance_matrix``.
Assignment ties break to the lowest cluster id.  Empty clusters keep
their previous centroid (standard Lloyd convention).

Init: the k rows with the smallest seeded 64-bit id-hash — a
deterministic pseudorandom draw computed with one per-block top-k +
bounded driver merge (no shuffle, no ordering assumption).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _mix
from .linalg import _list_to_matrix


def _hash_min_k(ds, col: str, id_col: str, k: int, seed: int):
    """(k, d) matrix of the k rows with smallest _mix(id, seed)."""
    from ..collect import collect_table

    schema = pa.schema([("h", pa.uint64()), ("v", pa.list_(pa.float64()))])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        h = _mix(ids, 0xC105 ^ seed)
        sel = np.argsort(h, kind="stable")[:k]
        x = _list_to_matrix(batch[col])[sel]
        return pa.table({
            "h": pa.array(h[sel], pa.uint64()),
            "v": pa.array(list(x), pa.list_(pa.float64())),
        })

    cand = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    h = cand["h"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")[:k]
    rows = cand["v"].take(pa.array(order, pa.int64())).to_pylist()
    return np.asarray(rows, np.float64)


def kmeans_fit(ds, col: str = "embedding", *, k: int = 8,
               iters: int = 10, id_col: str = "vec_id",
               seed: int = 0, scale_bits: int = 20):
    """Returns (centroids (k, d) float64, counts (k,) int64) after
    ``iters`` Lloyd iterations (each one streaming pass)."""
    import ray

    # consumed iters+1 times (init + every Lloyd pass): pin the blocks
    # once instead of re-executing the upstream read per iteration
    ds = ds.materialize()
    cent = _hash_min_k(ds, col, id_col, k, seed)
    scale = float(1 << scale_bits)
    part_schema = pa.schema([
        ("c", pa.int64()),
        ("n", pa.int64()),
        ("s", pa.list_(pa.int64())),
    ])

    counts = None
    for _ in range(iters):
        cref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return part_schema.empty_table()
            c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
            x = _list_to_matrix(batch[col])
            # squared distance argmin == argmax(2 x.c - |c|^2);
            # ties to the LOWEST cluster id (argmax returns first max)
            scores = 2.0 * (x @ c.T) - (c * c).sum(axis=1)[None, :]
            assign = np.argmax(scores, axis=1)
            q = np.floor(x * scale + 0.5).astype(np.int64)
            kk = c.shape[0]
            sums = np.zeros((kk, q.shape[1]), np.int64)
            np.add.at(sums, assign, q)
            n = np.bincount(assign, minlength=kk).astype(np.int64)
            live = np.flatnonzero(n)
            return pa.table({
                "c": live,
                "n": n[live],
                "s": pa.array([sums[i].tolist() for i in live],
                              pa.list_(pa.int64())),
            })

        from ..collect import collect_table
        parts = collect_table(ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True))
        d = cent.shape[1]
        S = [[0] * d for _ in range(k)]
        N = [0] * k
        cs = parts["c"].to_numpy(zero_copy_only=False)
        ns = parts["n"].to_numpy(zero_copy_only=False)
        ss = parts["s"].to_pylist()
        for c_i, n_i, s_i in zip(cs, ns, ss):
            N[c_i] += int(n_i)
            row = S[c_i]
            for j, v in enumerate(s_i):
                row[j] += v
        new = cent.copy()
        for c_i in range(k):
            if N[c_i]:
                new[c_i] = np.array(
                    [float(v) / float(N[c_i]) for v in S[c_i]]) / scale
        cent = new
        counts = np.array(N, np.int64)
    return cent, counts


def kmeans_assign(ds, centroids: np.ndarray, col: str = "embedding",
                  *, out_col: str = "cluster"):
    """Stamp the nearest-centroid id per row (broadcast matmul)."""
    import ray

    cref = ray.put(np.asarray(centroids, np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        x = _list_to_matrix(batch[col])
        scores = 2.0 * (x @ c.T) - (c * c).sum(axis=1)[None, :]
        return batch.append_column(
            out_col, pa.array(np.argmax(scores, axis=1).astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
