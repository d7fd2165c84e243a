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


# ---------------------------------------------------------------------------
# log-histogram quantile sketch
# ---------------------------------------------------------------------------

LOG_BINS_PER_OCTAVE = 64  # relative error <= 2^(1/64)-1 ~ 1.09%


def _log_bin(v: np.ndarray, k: int) -> np.ndarray:
    """Bin index floor(log2(v) * k) for positive int64 values.

    exponent via vectorized bit length; mantissa refinement from the
    float log2 of the value scaled into its octave — exact enough for
    binning (the bound is set by k, not by float error)."""
    v = np.asarray(v, np.int64)
    return np.floor(np.log2(np.maximum(v, 1).astype(np.float64))
                    * k).astype(np.int64)


def quantile_sketch(values: np.ndarray, k: int = LOG_BINS_PER_OCTAVE,
                    nbins: int | None = None) -> np.ndarray:
    """Mergeable quantile sketch of POSITIVE int64 values: a fixed
    ``nbins``-bucket histogram over log-spaced bins (k per octave).

    Bucket b holds values in [2^(b/k), 2^((b+1)/k)), so any quantile
    read back from bucket edges has relative error <= 2^(1/k)-1
    (~1.1% at k=64).  Merge = elementwise add — the same
    partial+combine shape as HLL; 32 KB per partial regardless of
    input size.  Values above the bin range clamp into the top bucket
    (2^64 needs 64*k bins, so the default range is exact for all
    int64)."""
    if nbins is None:
        nbins = 64 * k  # 64 octaves covers all of int64 at any k
    b = np.clip(_log_bin(values, k), 0, nbins - 1)
    return np.bincount(b, minlength=nbins).astype(np.int64)


def quantile_from_sketch(hist: np.ndarray, qs,
                         k: int = LOG_BINS_PER_OCTAVE) -> np.ndarray:
    """percentile_disc-style read: smallest bin UPPER edge whose
    cumulative count reaches ceil(q*n); the true value lies within one
    bin of it (relative error <= 2^(1/k)-1)."""
    cum = np.cumsum(hist)
    total = int(cum[-1])
    if total == 0:
        return np.full(len(np.atleast_1d(qs)), np.nan)
    out = []
    for q in np.atleast_1d(qs):
        rank = max(int(np.ceil(q * total)), 1)
        b = int(np.searchsorted(cum, rank))
        # geometric mid of the bucket: halves the worst-case error
        out.append(2.0 ** ((b + 0.5) / k))
    return np.asarray(out)


def approx_quantiles(ds, col: str, qs, *, scale: float = 1.0,
                     k: int = LOG_BINS_PER_OCTAVE,
                     **map_kwargs) -> np.ndarray:
    """Distributed approximate quantiles of a positive numeric column.

    Per-block log-histogram partials (fixed 32 KB rows) -> driver
    elementwise-add merge -> bucket-edge readout.  Communication is
    O(blocks * nbins) at ANY cardinality — the unbounded path behind
    the exact distinct-value quantiles of
    ``lineitem_price_quantiles`` (same partial+combine shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = np.round(batch[col].to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        return pa.table({"h": pa.array([quantile_sketch(v, k).tobytes()],
                                       pa.binary())})

    from ..collect import collect_table

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True,
                                         batch_size=None, **map_kwargs))
    merged = np.zeros(64 * k, np.int64)
    for r in parts["h"].to_pylist():
        merged += np.frombuffer(r, np.int64)
    return quantile_from_sketch(merged, qs, k)


# ---------------------------------------------------------------------------
# heavy hitters (Misra-Gries family, mergeable with explicit error bound)
# ---------------------------------------------------------------------------


def mg_partial(col, capacity: int):
    """One block's heavy-hitter summary: exact value counts truncated
    to the ``capacity`` largest, plus ``drop_bound`` = the largest
    TRUNCATED count (0 when nothing was dropped).  For any value v,
    summary_count(v) <= true_block_count(v) <= summary_count(v) +
    drop_bound — so summed drop_bounds give a global deterministic
    error envelope (Misra-Gries / mergeable-summaries bound, Agarwal
    et al. 2012).  Returns (values Array, counts int64 ndarray,
    drop_bound int)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    vc = pa.table({"v": col, "c": pa.array(np.ones(len(col), np.int64))}) \
        .group_by(["v"]).aggregate([("c", "sum")])
    counts = vc["c_sum"].to_numpy(zero_copy_only=False)
    if len(counts) <= capacity:
        return vc["v"].combine_chunks(), counts.astype(np.int64), 0
    # keep the `capacity` largest counts (ties broken arbitrarily —
    # the bound covers any tie-break)
    kth = np.partition(counts, len(counts) - capacity)[len(counts)
                                                       - capacity]
    keep = counts > kth
    room = capacity - int(keep.sum())
    if room > 0:
        # fill remaining slots from the counts tied at kth,
        # deterministically by value order
        tied = np.flatnonzero(counts == kth)
        order = pc.sort_indices(vc["v"].combine_chunks().take(
            pa.array(tied))).to_numpy(zero_copy_only=False)
        keep[tied[order[:room]]] = True
    dropped_max = int(counts[~keep].max())
    kept = vc.filter(pa.array(keep))
    return (kept["v"].combine_chunks(),
            kept["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64),
            dropped_max)


def heavy_hitters(ds, col: str, *, k: int = 10, capacity: int = 256,
                  **map_kwargs) -> pa.Table:
    """Distributed top-k frequent values with a DETERMINISTIC error
    envelope: per-block Misra-Gries summaries (<= capacity+1 rows each
    — communication is O(blocks x capacity) at any cardinality),
    merged by group-sum on the driver.  Each block also emits one
    sentinel row (NULL value) carrying its drop bound; the summed
    bounds give ``err`` with the guarantee est <= true <= est + err
    for every value, and any value whose true count exceeds ``err``
    is PRESENT among the merged candidates.

    Output: value ``v``, lower-bound count ``est``, upper bound
    ``est_hi`` = est + err, and ``certified`` — True when the k-th
    kept est beats every excluded candidate's est_hi, i.e. top-k
    membership is provably exact.  Rows ordered by (est desc, v asc).
    """

    def partial(batch: pa.Table) -> pa.Table:
        v, c, drop = mg_partial(batch[col], capacity)
        vt = v.type if len(v) else batch[col].type
        vals = pa.concat_arrays([v.cast(vt), pa.nulls(1, vt)])
        cnts = np.concatenate([c, [np.int64(drop)]])
        return pa.table({"v": vals, "c": pa.array(cnts)})

    from ..collect import collect_table

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True,
                                         batch_size=None, **map_kwargs))
    vcol = parts["v"].combine_chunks()
    ccol = parts["c"].to_numpy(zero_copy_only=False)
    is_err = ~vcol.is_valid().to_numpy(zero_copy_only=False)
    err = int(ccol[is_err].sum())
    body = parts.filter(pa.array(~is_err))
    merged = body.group_by(["v"]).aggregate([("c", "sum")])
    est = merged["c_sum"].to_numpy(zero_copy_only=False)
    # deterministic order: est desc, value asc
    order = pa.table({"e": pa.array(-est),
                      "v": merged["v"]}).sort_by(
        [("e", "ascending"), ("v", "ascending")])
    top = order.slice(0, k)
    top_est = (-top["e"].to_numpy(zero_copy_only=False)).astype(np.int64)
    rest_hi = (-order["e"].to_numpy(zero_copy_only=False)[k:] + err) \
        if order.num_rows > k else np.array([], np.int64)
    certified = bool(len(top_est) and
                     (len(rest_hi) == 0 or
                      top_est[-1] > rest_hi.max(initial=0)))
    return pa.table({
        "v": top["v"],
        "est": pa.array(top_est),
        "est_hi": pa.array(top_est + err),
        "certified": pa.array(np.full(len(top_est), certified))})


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimation)
# ---------------------------------------------------------------------------

def cms_counts(values_hash: np.ndarray, width: int,
               depth: int) -> np.ndarray:
    """(depth, width) Count-Min matrix of one block's hashed values.
    Row i buckets by an independent remix of the 64-bit value hash;
    ``width`` must be a power of two."""
    if width & (width - 1):
        raise ValueError("width must be a power of two")
    counts = np.zeros((depth, width), np.int64)
    for i in range(depth):
        pos = (_mix(values_hash, 0xC3A5 + 0x9E37 * i)
               & _U64(width - 1)).astype(np.int64)
        counts[i] += np.bincount(pos, minlength=width)
    return counts


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """CMS partials merge by elementwise sum (exactly associative)."""
    return a + b


def cms_estimate(counts: np.ndarray, query_hash: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over rows of the queried cells.
    Never under-counts; over-counts by at most ``e/width * N_total``
    with probability ``1 - e^-depth`` (Cormode & Muthukrishnan 2005)."""
    depth, width = counts.shape
    ests = np.empty((depth, len(query_hash)), np.int64)
    for i in range(depth):
        pos = (_mix(query_hash, 0xC3A5 + 0x9E37 * i)
               & _U64(width - 1)).astype(np.int64)
        ests[i] = counts[i][pos]
    return ests.min(axis=0)


def cms_build(ds, col: str, *, width: int = 4096, depth: int = 4,
              **map_kwargs) -> np.ndarray:
    """Distributed Count-Min over one column: per-block (depth, width)
    partials (one fixed-size row each, independent of cardinality or
    row count) -> driver elementwise-sum merge.  NULLs don't count."""

    def partial(batch: pa.Table) -> pa.Table:
        counts = cms_counts(_hash_column(batch[col]), width, depth)
        return pa.table({"counts": pa.array([counts.tobytes()],
                                            pa.large_binary())})

    from ..collect import collect_table

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True,
                                         batch_size=None, **map_kwargs))
    merged = np.zeros((depth, width), np.int64)
    for r in parts["counts"].to_pylist():
        merged = cms_merge(merged,
                           np.frombuffer(r, np.int64).reshape(depth, width))
    return merged


# ---------------------------------------------------------------------------
# grouped HLL (approximate COUNT(DISTINCT value) per group)
# ---------------------------------------------------------------------------

def hll_registers_grouped(values_hash: np.ndarray, gcodes: np.ndarray,
                          ngroups: int, p: int = 12) -> np.ndarray:
    """(ngroups, 2^p) register matrix: row g is the HLL of group g's
    hashes.  One vectorized scatter-max, no per-group loop."""
    m = 1 << p
    regs = np.zeros((ngroups, m), np.uint8)
    if len(values_hash) == 0:
        return regs
    idx = (values_hash >> _U64(64 - p)).astype(np.int64)
    w = (values_hash << _U64(p)).astype(_U64)
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, (gcodes, idx), rho)
    return regs


def approx_distinct_by(ds, keys: list[str], value: str, *,
                       p: int = 12, nbuckets: int = 16,
                       out_col: str = "n_approx",
                       schema: pa.Schema | None = None):
    """Approximate ``COUNT(DISTINCT value)`` per group — the
    unbounded-cardinality sibling of ``agg.distinct_agg``: where exact
    dedup must ship every distinct (group, value) pair, this ships one
    fixed 2^p-byte register row per (block, group), so the exchange
    cost is independent of the value domain.  Estimates carry HLL's
    ~1.04/sqrt(2^p) relative error; NULL values don't count.

    Memory note: a block touching G groups builds a G x 2^p uint8
    matrix — lower ``p`` (or pre-partition on the group key) when the
    per-block group cardinality is huge.
    """
    from .exchange import hash_exchange

    key_list = list(keys)
    if schema is None:
        in_schema = ds.schema()
        types = dict(zip(in_schema.names, in_schema.types))
    else:
        types = {f.name: f.type for f in schema}
    part_schema = pa.schema([(k, types[k]) for k in key_list]
                            + [("__regs", pa.large_binary())])
    out_schema = pa.schema([(k, types[k]) for k in key_list]
                           + [(out_col, pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return part_schema.empty_table()
        col = batch[value].combine_chunks()
        t = batch
        if col.null_count:
            t = batch.filter(col.is_valid())
            col = t[value].combine_chunks()
        if t.num_rows == 0:
            return part_schema.empty_table()
        # group codes from the combined key hash (the same 64-bit
        # mix the joins use; a cross-key collision merges two sketches
        # with probability ~G^2/2^64 — negligible next to HLL error)
        from .join import _combined_hash
        keyst = pa.table({k: t[k] for k in key_list})
        gh = _combined_hash(keyst, key_list)
        uniq, gcodes = np.unique(gh, return_inverse=True)
        # representative row per group (first occurrence)
        first = np.zeros(len(uniq), np.int64)
        first[gcodes[::-1]] = np.arange(t.num_rows)[::-1]
        regs = hll_registers_grouped(_hash_column(col), gcodes,
                                     len(uniq), p)
        head = t.take(pa.array(first, pa.int64()))
        return pa.table({**{k: head[k] for k in key_list},
                         "__regs": pa.array(
                             [regs[i].tobytes()
                              for i in range(len(uniq))],
                             pa.large_binary())}).cast(part_schema)

    def finish(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return out_schema.empty_table()
        from .join import _combined_hash
        keyst = pa.table({k: tbl[k] for k in key_list})
        gh = _combined_hash(keyst, key_list)
        order = np.argsort(gh, kind="stable")
        ghs = gh[order]
        firstm = np.concatenate(([True], ghs[1:] != ghs[:-1]))
        gidx = np.cumsum(firstm) - 1
        m = 1 << p
        mat = np.zeros((int(gidx[-1]) + 1, m), np.uint8)
        bufs = tbl["__regs"].to_pylist()
        for pos, row in zip(order, gidx):
            np.maximum(mat[row], np.frombuffer(bufs[pos], np.uint8),
                       out=mat[row])
        ests = np.array([round(hll_estimate(mat[i]))
                         for i in range(mat.shape[0])], np.int64)
        head = tbl.take(pa.array(order[firstm], pa.int64()))
        return pa.table({**{k: head[k] for k in key_list},
                         out_col: pa.array(ests)}).cast(out_schema)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_exchange(partials, nbuckets=nbuckets, on=key_list,
                         reduce_fn=finish, schema=out_schema)


# ---------------------------------------------------------------------------
# KMV (k minimum values) — mergeable distinct sketch with SET ALGEBRA
# (Beyer et al., "On Synopses for Distinct-Value Estimation Under
# Multiset Operations", SIGMOD 2007) — the one thing HLL can't do:
# estimate |A ∩ B| from two independently built sketches.
# ---------------------------------------------------------------------------


def kmv_sketch(ds, col: str, *, k: int = 1024, **map_kwargs) -> np.ndarray:
    """Build the KMV sketch of a column: the ``k`` smallest distinct
    64-bit hashes.  Per-block partials (k values each) merge by
    unique + partition — one skinny pass, no shuffle."""
    from ..collect import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        h = np.unique(_hash_column(batch[col]))
        if len(h) > k:
            h = np.partition(h, k - 1)[:k]
        return pa.table({"h": pa.array(h)})

    parts = collect_table(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        **map_kwargs))
    return kmv_merge(parts["h"].to_numpy(zero_copy_only=False)
                     .astype(np.uint64), k)


def kmv_merge(hashes: np.ndarray, k: int) -> np.ndarray:
    """k smallest distinct hashes of the union (sorted ascending)."""
    u = np.unique(hashes.astype(np.uint64))
    return u[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    """Distinct-count estimate: (k - 1) / U_(k) with U the kth order
    statistic normalized to [0, 1); exact count when the set is
    smaller than k (the sketch IS the distinct set then)."""
    if len(sketch) < k:
        return float(len(sketch))
    kth = float(sketch[k - 1]) / float(1 << 64)
    return (k - 1) / max(kth, 1e-300)


def kmv_intersect_estimate(sa: np.ndarray, sb: np.ndarray,
                           k: int) -> float:
    """|A ∩ B| estimate from two independently built KMV sketches:
    merge to the union sketch X (k smallest of S_A ∪ S_B), count the
    members of X present in BOTH sketches (Jaccard numerator), scale
    by the union estimate."""
    x = kmv_merge(np.concatenate([sa, sb]), k)
    in_a = np.isin(x, sa, assume_unique=True)
    in_b = np.isin(x, sb, assume_unique=True)
    rho = float((in_a & in_b).sum()) / max(len(x), 1)
    return rho * kmv_estimate(x, k)


def cms_inner_product(a: np.ndarray, b: np.ndarray) -> int:
    """Join-cardinality estimate from two Count-Min sketches built
    with the SAME (depth, width, hash family): the equi-join size
    |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k) is over-estimated by each row's
    dot product (colliding keys only ADD mass), so the min over rows
    never under-estimates — the classic AGMS/CM planner statistic
    (Cormode & Muthukrishnan 2005, §4.2).  Python-int arithmetic: the
    dot product of two row-count vectors can exceed int64."""
    if a.shape != b.shape:
        raise ValueError("sketch shapes differ")
    best = None
    for i in range(a.shape[0]):
        dot = int(np.multiply(a[i].astype(object),
                              b[i].astype(object)).sum())
        best = dot if best is None else min(best, dot)
    return int(best)
