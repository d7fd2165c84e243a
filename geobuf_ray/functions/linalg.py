"""Distributed linear algebra over an embedding column
(``list<float>``): exact covariance matrix and PCA projection.

The covariance is EXACT and bit-stable under any partitioning: block
partials quantize values to integers (``q = floor(x * 2^b + 0.5)``,
float64 math), accumulate int64 moment matrices ``(n, S, Q^T Q)``
per block, and the driver merges them in arbitrary-precision Python
ints before one float64 finalization per cell — the same
integer-moments trick as ``agg.corr_agg``.  The final double formula
mirrors a DuckDB HUGEINT twin digit-for-digit, so the covariance
query hash-checks.

Scale shape: one pass, no shuffle; each block ships a single
``O(d^2)`` int64 partial row (32 KB at d=64); the driver holds
``blocks x d^2`` — bounded by block count, not data size.  PCA adds a
driver-side ``d x d`` eigendecomposition and a broadcast matmul
projection pass.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _list_to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy on
    the flat values buffer when offsets are uniform."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(-1, d).astype(np.float64)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0))
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding lists")
    flat = arr.values.to_numpy(zero_copy_only=False)
    # a sliced ListArray's values buffer covers the parent: window it
    flat = flat[offsets[0]:offsets[-1]]
    return flat.reshape(-1, d).astype(np.float64)


def _moment_partials(ds, col: str, scale_bits: int):
    """Dataset of one (n, s:list<int64>[d], p:list<int64>[d*d]) row
    per input block."""
    scale = float(1 << scale_bits)
    part_schema = pa.schema([
        ("n", pa.int64()),
        ("s", pa.list_(pa.int64())),
        ("p", pa.list_(pa.int64())),
    ])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        x = _list_to_matrix(batch[col])
        q = np.floor(x * scale + 0.5).astype(np.int64)
        s = q.sum(axis=0)
        p = q.T @ q  # int64 matmul, exact
        return pa.table({
            "n": pa.array([q.shape[0]], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.int64())),
            "p": pa.array([p.ravel().tolist()], pa.list_(pa.int64())),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True), part_schema


def _merged_moments(ds, col: str, scale_bits: int):
    """(n, S, P) with S, P as Python-int arrays (exact merge)."""
    from ..collect import collect_table

    parts_ds, _ = _moment_partials(ds, col, scale_bits)
    parts = collect_table(parts_ds)
    if parts.num_rows == 0:
        return 0, None, None
    n = int(parts["n"].to_numpy(zero_copy_only=False).sum())
    s_rows = parts["s"].to_pylist()
    p_rows = parts["p"].to_pylist()
    d = len(s_rows[0])
    S = [0] * d
    P = [0] * (d * d)
    for row in s_rows:
        for i, v in enumerate(row):
            S[i] += v
    for row in p_rows:
        for i, v in enumerate(row):
            P[i] += v
    return n, S, P


def covariance_matrix(ds, col: str = "embedding", *,
                      scale_bits: int = 20) -> pa.Table:
    """Population covariance of the quantized embedding column, upper
    triangle as rows ``(i, j, cov)`` with 0-based ``i <= j``.

    ``cov = (n*P_ij - S_i*S_j) / (n*n) / 2^(2*scale_bits)`` evaluated
    with exact integer numerators and the division order fixed, so
    the float64 result is identical regardless of partitioning and
    matches the HUGEINT SQL twin bitwise.
    """
    n, S, P = _merged_moments(ds, col, scale_bits)
    out_schema = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                            ("cov", pa.float64())])
    if n == 0:
        return out_schema.empty_table()
    d = len(S)
    nn = float(n) * float(n)
    denom = float(1 << (2 * scale_bits))
    ii, jj, cv = [], [], []
    for i in range(d):
        for j in range(i, d):
            num = n * P[i * d + j] - S[i] * S[j]
            ii.append(i)
            jj.append(j)
            cv.append(float(num) / nn / denom)
    return pa.table({"i": pa.array(ii, pa.int64()),
                     "j": pa.array(jj, pa.int64()),
                     "cov": pa.array(cv, pa.float64())})


def pca_project(ds, col: str = "embedding", *, k: int = 2,
                id_col: str = "vec_id", scale_bits: int = 20):
    """Project embeddings onto their top-``k`` principal components.

    The d x d covariance (exact, see :func:`covariance_matrix`) is
    eigendecomposed ON THE DRIVER (d is small); components are
    sign-fixed (largest-|loading| coordinate made positive) so the
    output is deterministic; the projection itself is a broadcast
    matmul ``map_batches`` pass that streams.

    Returns a Dataset with (id_col, pc1..pck, plus ``explained``
    carried in the table metadata is NOT used — variance ratios are
    returned separately by :func:`pca_components`).
    """
    comps, _mean, _ratios = pca_components(ds, col, k=k,
                                           scale_bits=scale_bits)
    import ray

    comps_ref = ray.put((comps, _mean))
    names = [f"pc{t + 1}" for t in range(k)]

    def project(batch: pa.Table) -> pa.Table:
        c, mu = ray.get(comps_ref)
        x = _list_to_matrix(batch[col])
        y = (x - mu) @ c.T
        cols = {id_col: batch[id_col]}
        for t, nm in enumerate(names):
            cols[nm] = pa.array(y[:, t], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def pca_components(ds, col: str = "embedding", *, k: int = 2,
                   scale_bits: int = 20):
    """(components (k, d) float64, mean (d,), explained-variance
    ratios (k,)) from the exact quantized covariance."""
    n, S, P = _merged_moments(ds, col, scale_bits)
    if n == 0:
        raise ValueError("empty dataset")
    d = len(S)
    nn = float(n) * float(n)
    denom = float(1 << (2 * scale_bits))
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(i, d):
            v = float(n * P[i * d + j] - S[i] * S[j]) / nn / denom
            cov[i, j] = cov[j, i] = v
    mean = np.array([float(si) / float(n) for si in S]) \
        / float(1 << scale_bits)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    # deterministic sign: the largest-|loading| coordinate positive
    for t in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[t]))
        if comps[t, m] < 0:
            comps[t] = -comps[t]
    total = float(np.clip(w.sum(), 1e-300, None))
    ratios = w[order] / total
    return comps, mean, ratios
