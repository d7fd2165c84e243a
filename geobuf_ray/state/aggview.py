"""Incremental materialized aggregate view — the lakehouse companion
to MERGE INTO (state/mergeinto.py): a grouped COUNT/SUM table kept on
disk and maintained by DELTAS, never recomputed from the base table.

The maintainable class is deliberately the self-maintainable one
(COUNT and SUM — anything linear in the rows; means divide at read
time).  MIN/MAX are NOT delta-maintainable under retractions (losing
the current max forces a rescan) and are refused by construction.

Refresh algebra is the Z-set / delta-relation rule: a delta row
carries weight +1 (insert) or -1 (retract); a refresh adds
``weight``-scaled partials into the stored groups and drops groups
whose count reaches zero.  Over-retraction (a count going negative)
raises — it means the delta retracted rows the view never saw.

Layout: one parquet file per ``hash(key) % npartitions`` (the join
family's 64-bit mix, pinned in ``meta.json`` like the keyed layout),
so a refresh touches ONLY partitions whose groups received delta rows
— every other file stays byte-identical.  Delta rows pre-aggregate to
group partials inside ``map_batches`` BEFORE the exchange, so the
shuffle carries at most (distinct groups per block) rows regardless of
delta size.  Per-partition merge is a raw Ray task (the documented
Dataset-API exception: the unit of work is a file swap).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .mergeinto import _part_ids


def _partials(tbl: pa.Table, key: str, sums: dict[str, str],
              count_col: str, weight: int) -> pa.Table:
    """Per-block group partials: one row per distinct key with
    weight-scaled count + sums (exact int64).  NULLs in the key or a
    sum column raise — to_numpy would smuggle them through as NaN and
    astype(int64) turns NaN into INT64_MIN garbage silently."""
    for c in (key, *sums.values()):
        if tbl[c].null_count:
            raise ValueError(
                f"agg view column {c!r} contains NULLs; drop or fill "
                "them before the refresh (NaN->int64 would corrupt "
                "the sums silently)")
    k = tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
    uu, inv = np.unique(k, return_inverse=True)
    cols: dict[str, pa.Array] = {key: pa.array(uu)}
    n = np.bincount(inv, minlength=len(uu)).astype(np.int64) * weight
    cols[count_col] = pa.array(n)
    for out, src in sums.items():
        if not pa.types.is_integer(tbl[src].type):
            raise TypeError(f"agg view sum column {src!r} must be "
                            f"integer-typed, got {tbl[src].type}")
        v = tbl[src].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uu), np.int64)
        np.add.at(s, inv, v)
        cols[out] = pa.array(s * weight)
    return pa.table(cols)


def _merge_groups(tbls: list[pa.Table], key: str,
                  val_cols: list[str], count_col: str) -> pa.Table:
    t = tbls[0] if len(tbls) == 1 else pa.concat_tables(
        tbls, promote_options="default")
    if t.num_rows == 0:
        return t
    k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    uu, inv = np.unique(k, return_inverse=True)
    cols: dict[str, pa.Array] = {key: pa.array(uu)}
    keep = None
    for c in val_cols:
        v = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uu), np.int64)
        np.add.at(s, inv, v)
        if c == count_col:
            if (s < 0).any():
                bad = uu[s < 0][:5].tolist()
                raise ValueError(
                    f"over-retraction: group count went negative for "
                    f"keys {bad} — the delta retracted rows the view "
                    "never contained")
            keep = s > 0
        cols[c] = pa.array(s)
    tbl = pa.table(cols)
    if keep is not None and not keep.all():
        # a group retracted down to count 0 must have sums 0 too —
        # a residual sum means the delta retracted VALUES the view
        # never contained even though the row count balanced
        for c in val_cols:
            if c == count_col:
                continue
            resid = tbl[c].to_numpy()[~keep]
            if (resid != 0).any():
                bad = tbl[key].to_numpy()[~keep][resid != 0][:5]
                raise ValueError(
                    f"over-retraction: group(s) {bad.tolist()} reached "
                    f"count 0 with nonzero residual {c!r} — the delta "
                    "retracted values the view never contained")
        tbl = tbl.filter(pa.array(keep))
    return tbl


def build_agg_view(ds, view_dir: str, *, key: str,
                   sums: dict[str, str], count_col: str = "n_rows",
                   npartitions: int = 32) -> dict:
    """Materialize ``SELECT key, COUNT(*), SUM(...) GROUP BY key``
    over ``ds`` as a hash-partitioned view directory."""
    from ..functions.exchange import hash_exchange

    os.makedirs(view_dir, exist_ok=True)
    meta = {"key": key, "sums": sums, "count_col": count_col,
            "npartitions": npartitions}
    with open(os.path.join(view_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    val_cols = [count_col] + list(sums)

    part = ds.map_batches(
        lambda b: _partials(b, key, sums, count_col, 1),
        batch_format="pyarrow", zero_copy_batch=True)

    def bucket_fn(tbl: pa.Table):
        return _part_ids(tbl, key, npartitions), tbl

    parts = hash_exchange(part, nbuckets=npartitions,
                          bucket_fn=bucket_fn, reduce_fn=None)
    refs = [r for b in parts.iter_internal_ref_bundles()
            for r in b.block_refs]

    @ray.remote
    def write_one(i: int, blk) -> int:
        t = blk if isinstance(blk, pa.Table) else pa.table(blk)
        t = _merge_groups([t], key, val_cols, count_col)
        tmp = os.path.join(view_dir, f".part-{i}.parquet.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(view_dir, f"part-{i}.parquet"))
        return t.num_rows

    counts = ray.get([write_one.remote(i, r)
                      for i, r in enumerate(refs)])
    meta["groups"] = int(sum(counts))
    return meta


def read_agg_view(view_dir: str):
    return ray.data.read_parquet(
        [os.path.join(view_dir, f) for f in sorted(os.listdir(view_dir))
         if f.startswith("part-") and f.endswith(".parquet")])


def refresh_agg_view(view_dir: str, delta, *, weight: int = 1) -> dict:
    """Apply ``delta`` (a Dataset of BASE-TABLE rows, not partials)
    with the given weight: +1 folds inserts in, -1 retracts previously
    counted rows.  Only partitions receiving delta groups are opened
    and atomically rewritten."""
    from ..functions.exchange import hash_exchange

    if weight not in (1, -1):
        raise ValueError("weight must be +1 (insert) or -1 (retract)")
    with open(os.path.join(view_dir, "meta.json")) as f:
        meta = json.load(f)
    key, sums = meta["key"], meta["sums"]
    count_col, nparts = meta["count_col"], meta["npartitions"]
    val_cols = [count_col] + list(sums)

    part = delta.map_batches(
        lambda b: _partials(b, key, sums, count_col, weight),
        batch_format="pyarrow", zero_copy_batch=True)

    def bucket_fn(tbl: pa.Table):
        return _part_ids(tbl, key, nparts), tbl

    parts = hash_exchange(part, nbuckets=nparts, bucket_fn=bucket_fn,
                          reduce_fn=None)
    refs = [r for b in parts.iter_internal_ref_bundles()
            for r in b.block_refs]

    @ray.remote
    def apply_one(i: int, blk) -> int:
        d = blk if isinstance(blk, pa.Table) else pa.table(blk)
        if d.num_rows == 0:
            return 0  # pruned: the partition file is never opened
        path = os.path.join(view_dir, f"part-{i}.parquet")
        base = pq.read_table(path) if os.path.exists(path) \
            else d.slice(0, 0)
        merged = _merge_groups([base, d.select(base.column_names)
                                if base.num_columns else d],
                               key, val_cols, count_col)
        tmp = os.path.join(view_dir, f".part-{i}.parquet.tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, path)
        return 1

    touched_flags = ray.get([apply_one.remote(i, r)
                             for i, r in enumerate(refs)])
    touched = [i for i, t in enumerate(touched_flags) if t]
    return {"touched": touched, "untouched": nparts - len(touched)}
