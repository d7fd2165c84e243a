"""Table profiling: per-column statistics in two streaming passes.

The data-warehouse ``ANALYZE`` / data-quality profile as an engine
operator: row count, null count, min/max, and EXACT distinct count
per column.  Min/max/distinct compare in the value domain rendered to
strings (int and string columns render identically in Arrow and SQL;
float columns are rejected — their text renderings differ between
engines, use the numeric aggregates directly instead).

Shape at scale:

- pass A is a pure map producing ONE partial row per column per
  block (n, nulls, min, max) — the driver combine is |cols| x
  |blocks| bounded;
- pass B ships each block's DISTINCT (column, value) pairs through a
  value-hash exchange (block-level dedup first, so a hot value
  crosses the wire once per block, not once per row); per-bucket
  dedup + per-column counts sum exactly because the exchange
  partitions by value.  For web-scale cardinalities swap pass B for
  ``sketch.approx_distinct_by`` (HLL) — same output column, 1.6%
  error, no value shipping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_table"]


def _check_types(sch: pa.Schema, columns: list[str]) -> None:
    for c in columns:
        t = sch.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t)):
            raise TypeError(
                f"profile_table supports integer/string columns; {c!r} "
                f"is {t} (float renderings differ between engines)")


def profile_table(ds, columns: list[str], *, nbuckets: int = 32,
                  **map_kwargs) -> pa.Table:
    """Profile ``columns`` of ``ds``; returns one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_v, max_v)`` with
    min/max rendered as strings (NULL-only columns render empty)."""
    from ..collect import collect_table
    from .exchange import hash_exchange

    _check_types(ds.schema().base_schema
                 if hasattr(ds.schema(), "base_schema") else ds.schema(),
                 columns)

    def partial_a(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in columns:
            col = batch[c]
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            s = col.cast(pa.string())
            mn = pc.min(s).as_py()
            mx = pc.max(s).as_py()
            mins.append("" if mn is None else mn)
            maxs.append("" if mx is None else mx)
        return pa.table({"column": pa.array(names, pa.string()),
                         "n_rows": pa.array(ns, pa.int64()),
                         "n_nulls": pa.array(nulls, pa.int64()),
                         "min_v": pa.array(mins, pa.string()),
                         "max_v": pa.array(maxs, pa.string())})

    a = collect_table(ds.map_batches(partial_a, batch_format="pyarrow",
                                     zero_copy_batch=True, **map_kwargs))

    def partial_b(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for ci, c in enumerate(columns):
            u = pc.unique(batch[c].cast(pa.string()).combine_chunks())
            u = u.drop_null()
            cols.append(np.full(len(u), ci, np.int64))
            vals.append(u)
        return pa.table({
            "ci": pa.array(np.concatenate(cols) if cols
                           else np.array([], np.int64)),
            "v": pa.concat_arrays([x.cast(pa.string()) for x in vals])
            if vals else pa.array([], pa.string())})

    def count_distinct(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"ci": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        g = tbl.group_by(["ci", "v"]).aggregate([])
        ci = g["ci"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ci, return_counts=True)
        return pa.table({"ci": pa.array(u),
                         "nd": pa.array(cnt.astype(np.int64))})

    b = collect_table(hash_exchange(
        ds.map_batches(partial_b, batch_format="pyarrow",
                       zero_copy_batch=True, **map_kwargs),
        nbuckets=nbuckets, on="v", reduce_fn=count_distinct))

    # driver combines (|cols| x |blocks| rows)
    name = a["column"].to_numpy(zero_copy_only=False)
    out_rows = []
    bd = {}
    bci = b["ci"].to_numpy(zero_copy_only=False)
    bnd = b["nd"].to_numpy(zero_copy_only=False)
    for ci, nd in zip(bci, bnd):
        bd[int(ci)] = bd.get(int(ci), 0) + int(nd)
    for ci, c in enumerate(columns):
        m = name == c
        mins = [x for x in a["min_v"].to_numpy(zero_copy_only=False)[m]
                if x != ""]
        maxs = [x for x in a["max_v"].to_numpy(zero_copy_only=False)[m]
                if x != ""]
        out_rows.append({
            "column": c,
            "n_rows": int(a["n_rows"].to_numpy(
                zero_copy_only=False)[m].sum()),
            "n_nulls": int(a["n_nulls"].to_numpy(
                zero_copy_only=False)[m].sum()),
            "n_distinct": bd.get(ci, 0),
            "min_v": min(mins) if mins else "",
            "max_v": max(maxs) if maxs else ""})
    return pa.table({k: [r[k] for r in out_rows]
                     for k in ("column", "n_rows", "n_nulls",
                               "n_distinct", "min_v", "max_v")})
