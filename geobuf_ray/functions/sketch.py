"""Approximate aggregates: HyperLogLog distinct-count sketch.

The reference has no sketches (SURVEY.md §2.6); at 100 TB an exact
distinct over a high-cardinality key is an all-to-all shuffle, while an
HLL is a fixed 2^p-byte register array per block with elementwise-max
merge — the canonical partial+combine aggregate.  Standard HLL
(Flajolet et al. 2007) with linear-counting small-range correction;
64-bit hashes need no large-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _mix
from .text import fingerprint64

_U64 = np.uint64


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (64 for x == 0)."""
    n = np.full(len(x), 64, np.int64)
    x = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (_U64(1) << _U64(shift))
        n[m] -= shift
        x[m] >>= _U64(shift)
    n[x > 0] -= 1
    return n


def _hash_column(col) -> np.ndarray:
    """64-bit hashes of the column's NON-NULL values (SQL's
    COUNT(DISTINCT) ignores nulls, so sketches must too)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        # FNV-1a avalanches poorly in the high bits for short strings,
        # and HLL buckets on the TOP p bits — finalize with a mix
        return _mix(fingerprint64(col), 0x5EED)
    if pa.types.is_floating(col.type):
        # hash the bit pattern: truncation to int64 would collapse
        # 1.2/1.5/1.9 into one "distinct" value
        bits = np.ascontiguousarray(
            col.to_numpy(zero_copy_only=False), np.float64).view(_U64)
        return _mix(bits, 0x5EED)
    vals = col.to_numpy(zero_copy_only=False)
    return _mix(np.ascontiguousarray(vals, np.int64).view(_U64), 0x5EED)


def hll_registers(values_hash: np.ndarray, p: int = 12) -> np.ndarray:
    """uint8[2^p] register array for a batch of 64-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(values_hash) == 0:
        return regs
    idx = (values_hash >> _U64(64 - p)).astype(np.int64)
    w = (values_hash << _U64(p)).astype(_U64)
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def approx_distinct(ds, col: str, p: int = 12, **map_kwargs) -> float:
    """Distributed HLL distinct estimate of one column.

    Per-block partial registers (one 2^p-byte row each) -> driver
    elementwise-max merge; communication is O(blocks * 2^p) regardless
    of cardinality."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(_hash_column(batch[col]), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    from ..collect import collect_table

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True, batch_size=None,
                                         **map_kwargs))
    merged = np.zeros(1 << p, np.uint8)
    for r in parts["regs"].to_pylist():
        merged = hll_merge(merged, np.frombuffer(r, np.uint8))
    return hll_estimate(merged)


def exact_distinct(ds, col: str, **map_kwargs) -> int:
    """Exact distinct (nulls ignored) via per-block distinct VALUE
    partials + driver union — truly exact: values, not hashes, are
    unioned (the small-result path; HLL is the unbounded-cardinality
    path)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        u = pc.unique(c.drop_null())
        return pa.table({"v": u})

    from ..collect import collect_table

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True, batch_size=None,
                                         **map_kwargs))
    return len(set(parts["v"].to_pylist()))
