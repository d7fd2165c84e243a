"""Partitioned window operators (LAG / LEAD / running totals).

The relational-window family the query layer previously only had in
fused forms (sessionization gaps, sliding sums).  Shape: one
hash-bucket exchange on the partition key, then a vectorized
lexsort + shift kernel per bucket — rows never centralize and a bucket
holds many keys (the per-distinct-key ``map_groups`` overhead the
dedup engine already measured and avoids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def lag_lead(ds, *, key: str, order: str, value: str,
             nbuckets: int = 64, lead: bool = False,
             out_col: str | None = None):
    """Per-row previous (or next) ``value`` within ``key`` groups in
    ``order`` order — SQL's ``LAG(value) OVER (PARTITION BY key ORDER
    BY order)``.  NULL where no predecessor exists.  ``order`` values
    must be unique per key for a deterministic result (SQL imposes the
    same caveat).
    """
    from .exchange import hash_exchange

    name = out_col or (("lead_" if lead else "lag_") + value)

    def kernel(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if tbl.num_columns == 0:
            # every upstream block fully filtered -> schemaless empty
            return pa.table({})
        if n == 0:
            return tbl.append_column(name, pa.array([], tbl[value].type))
        k = tbl[key].combine_chunks()
        kenc = k.dictionary_encode()
        # NULL keys form one partition (SQL window semantics); an
        # unfilled null index would round-trip through float NaN
        codes = kenc.indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = tbl[order].combine_chunks()
        ov = o.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(o.type) or pa.types.is_date(o.type) \
            else o.to_numpy(zero_copy_only=False)
        sel = np.lexsort((ov, codes))
        cs = codes[sel]
        same_prev = np.concatenate(([False], cs[1:] == cs[:-1]))
        src = np.empty(n, np.int64)
        if lead:
            # successor within key: reverse the predecessor relation
            same_next = np.concatenate((cs[:-1] == cs[1:], [False]))
            src[sel] = np.where(same_next, np.roll(sel, -1), -1)
        else:
            src[sel] = np.where(same_prev, np.roll(sel, 1), -1)
        vals = tbl[value].combine_chunks()
        take = pa.array(np.where(src < 0, None, src), pa.int64())
        return tbl.append_column(name, vals.take(take))

    return hash_exchange(ds, nbuckets=nbuckets, on=key,
                         reduce_fn=kernel, schema=None)


def running_agg(ds, *, key: str, order: str, value: str,
                nbuckets: int = 64, out_col: str | None = None):
    """Per-row running sum of ``value`` within ``key`` groups in
    ``order`` order (SQL ``SUM(value) OVER (PARTITION BY key ORDER BY
    order ROWS UNBOUNDED PRECEDING)``) plus the 1-based row number.
    Same exchange + lexsort shape as :func:`lag_lead`; the cumulative
    itself is one segmented cumsum."""
    from .exchange import hash_exchange

    name = out_col or ("running_" + value)

    def kernel(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if tbl.num_columns == 0:
            return pa.table({})
        if n == 0:
            # keep the running column's dtype consistent with the
            # non-empty buckets (int64 for integer values) so a sparse
            # key domain cannot promote the whole column to float64
            vt = tbl[value].type
            rt = pa.int64() if pa.types.is_integer(vt) else pa.float64()
            return (tbl.append_column(name, pa.array([], rt))
                    .append_column("row_num", pa.array([], pa.int64())))
        kenc = tbl[key].combine_chunks().dictionary_encode()
        codes = kenc.indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = tbl[order].combine_chunks()
        ov = o.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(o.type) or pa.types.is_date(o.type) \
            else o.to_numpy(zero_copy_only=False)
        vcol = tbl[value].combine_chunks()
        is_int = pa.types.is_integer(vcol.type)
        # SQL SUM OVER skips NULLs: fill 0 BEFORE the numpy cast (an
        # unfilled null round-trips through float NaN, which astype
        # turns into INT64_MIN and poisons every later prefix sum)
        if vcol.null_count:
            vcol = vcol.fill_null(0)
        # int64 stays int64: the whole-array-cumsum-minus-segment-base
        # trick is EXACT in integers (and hash-matches SQL); in float
        # it reorders roundings, so float results are ~1e-9-close, not
        # bit-equal — use integer units (cents) when exactness matters
        v = vcol.to_numpy(zero_copy_only=False).astype(
            np.int64 if is_int else np.float64)
        sel = np.lexsort((ov, codes))
        cs = codes[sel]
        new = np.concatenate(([True], cs[1:] != cs[:-1]))
        c = np.cumsum(v[sel])
        base = np.repeat(c[new] - v[sel][new],
                         np.diff(np.append(np.flatnonzero(new), n)))
        run = np.empty(n, v.dtype)
        run[sel] = c - base
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.repeat(pos[new], np.diff(np.append(
            np.flatnonzero(new), n)))
        rn = np.empty(n, np.int64)
        rn[sel] = pos - seg_start + 1
        return (tbl.append_column(name, pa.array(run))
                .append_column("row_num", pa.array(rn)))

    return hash_exchange(ds, nbuckets=nbuckets, on=key,
                         reduce_fn=kernel, schema=None)
