"""Distributed global sort / ranking via range partitioning — the
full-sort primitive the engine's top-k paths deliberately avoid, for
when the OUTPUT must be totally ordered (global ranks, sorted export).

Classic sample-sort shape (TeraSort family):

  1. SAMPLE: each block contributes a deterministic hash-chosen
     sample of its key values; the driver picks ``nbuckets - 1``
     split points from the merged sample (balance only — correctness
     never depends on the sample).
  2. ROUTE + SORT: one exchange routes rows to their key range;
     each range sorts locally (lexsort by (key, tiebreak)).
  3. OFFSETS: per-range row counts are known at reduce time; ranks
     need the PREFIX offsets, so the reduce emits rows WITH a range
     id and local rank, and a final cheap map adds the broadcast
     per-range offset — two small driver scalars per range, never
     the data.

Output rows carry ``rank`` (1-based, ORDER BY key [DESC], tiebreak
ASC) — exactly SQL ROW_NUMBER.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _mix


def global_rank(ds, value: str, tiebreak: str, *,
                descending: bool = True, nbuckets: int = 32,
                sample_per_block: int = 256,
                schema: pa.Schema | None = None):
    """Totally ordered ranking of a Dataset by ``(value, tiebreak)``
    (both int64).  Returns a Dataset of the input columns plus
    ``rank`` — 1-based ROW_NUMBER over
    ``ORDER BY value {DESC|ASC}, tiebreak ASC``.
    """
    import ray

    from ..collect import collect_table
    from .exchange import hash_exchange

    in_schema = schema if schema is not None else pa.schema(
        list(zip(ds.schema().names, ds.schema().types)))
    ds = ds.materialize()  # sampled once, routed once

    # -- pass 1: deterministic sample -> split points
    samp_schema = pa.schema([("v", pa.int64())])

    def sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return samp_schema.empty_table()
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch[tiebreak].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _mix(t.view(np.uint64), 0x5A3B)
        sel = np.argsort(h, kind="stable")[:sample_per_block]
        # sample in KEY space (~v reverses order overflow-free)
        key = ~v[sel] if descending else v[sel]
        return pa.table({"v": key})

    samp = collect_table(ds.map_batches(sample, batch_format="pyarrow",
                                        zero_copy_batch=True))
    sv = np.sort(samp["v"].to_numpy(zero_copy_only=False))
    if len(sv) == 0:
        splits = np.empty(0, np.int64)
    else:
        qpos = (np.arange(1, nbuckets) * len(sv)) // nbuckets
        splits = np.unique(sv[np.minimum(qpos, len(sv) - 1)])
    splits_ref = ray.put(splits)

    # -- pass 2: range route + local sort
    mid_schema = pa.schema(list(in_schema)
                           + [("__rng", pa.int64()),
                              ("__lrank", pa.int64())])

    def bucket_fn(tbl: pa.Table):
        sp = ray.get(splits_ref) if isinstance(
            splits_ref, ray.ObjectRef) else splits_ref
        v = tbl[value].to_numpy(zero_copy_only=False).astype(np.int64)
        key = ~v if descending else v
        return np.searchsorted(sp, key, "right").astype(np.int64), tbl

    def sort_range(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return mid_schema.empty_table()
        v = tbl[value].to_numpy(zero_copy_only=False).astype(np.int64)
        t = tbl[tiebreak].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = ~v if descending else v
        order = np.lexsort((t, key))
        out = tbl.take(pa.array(order, pa.int64()))
        rng = int(np.searchsorted(
            ray.get(splits_ref) if isinstance(splits_ref, ray.ObjectRef)
            else splits_ref, key[order[0]], "right")) \
            if len(order) else 0
        return out.append_column(
            "__rng", pa.array(np.full(len(order), rng, np.int64))) \
            .append_column("__lrank", pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64)))

    ranged = hash_exchange(ds, nbuckets=max(len(splits) + 1, 1),
                           bucket_fn=bucket_fn, reduce_fn=sort_range,
                           schema=in_schema).materialize()

    # -- pass 3: prefix offsets (one count per range) + final stamp
    cnt_schema = pa.schema([("rng", pa.int64()), ("n", pa.int64())])

    def counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return cnt_schema.empty_table()
        r = batch["__rng"].to_numpy(zero_copy_only=False)
        u, c = np.unique(r, return_counts=True)
        return pa.table({"rng": u, "n": c.astype(np.int64)})

    ct = collect_table(ranged.map_batches(counts, batch_format="pyarrow",
                                          zero_copy_batch=True))
    nrng = len(splits) + 1
    per = np.zeros(nrng, np.int64)
    for r, n in zip(ct["rng"].to_numpy(zero_copy_only=False),
                    ct["n"].to_numpy(zero_copy_only=False)):
        per[r] += n
    offsets = np.concatenate(([0], np.cumsum(per[:-1])))
    off_ref = ray.put(offsets)

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(list(in_schema)
                             + [("rank", pa.int64())]).empty_table()
        off = ray.get(off_ref) if isinstance(
            off_ref, ray.ObjectRef) else off_ref
        r = batch["__rng"].to_numpy(zero_copy_only=False)
        lr = batch["__lrank"].to_numpy(zero_copy_only=False)
        return batch.drop_columns(["__rng", "__lrank"]) \
            .append_column("rank", pa.array(off[r] + lr))

    return ranged.map_batches(stamp, batch_format="pyarrow",
                              zero_copy_batch=True)
