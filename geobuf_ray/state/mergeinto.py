"""MERGE INTO for a hash-keyed parquet layout — incremental upsert
maintenance with partition pruning (the lakehouse CDC-apply shape).

A *keyed layout* is a directory of ``part-<i>.parquet`` files where a
row lives in partition ``hash(key) % npartitions`` (the join family's
64-bit mix, pinned in ``meta.json`` so every later merge routes
identically).  Applying a delta then touches ONLY the partitions that
received delta rows: each is read, upserted (latest ``version`` wins,
delta beats base on ties), and atomically replaced via tmp + rename —
every other partition file is left byte-identical, which is what makes
a 100 TB table maintainable by small CDC batches.  The per-partition
rewrite is a raw Ray task (a deliberate Dataset-API exception: the
unit of work is a FILE swap keyed by partition id, not a record
transform — the same justification as the split-combine subfile
writers, SURVEY §2.4 T1).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.join import _key_hash


def _part_ids(tbl: pa.Table, key: str, nparts: int) -> np.ndarray:
    return (_key_hash(tbl[key]) % np.uint64(nparts)).astype(np.int64)


def _upsert_last_wins(tbl: pa.Table, key: str, version: str,
                      delta_flag: np.ndarray) -> pa.Table:
    """Keep one row per key: highest (version, is_delta) — the delta
    copy survives a version tie."""
    k = tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
    v = tbl[version].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((delta_flag, v, k))
    ks = k[order]
    last = np.concatenate((ks[1:] != ks[:-1], [True]))
    return tbl.take(pa.array(order[last], pa.int64()))


def build_keyed_layout(ds, out_dir: str, *, key: str, version: str,
                       npartitions: int = 32) -> dict:
    """Materialize ``ds`` as a hash-keyed layout (one parquet file per
    partition, every file present even when empty so later merges can
    rely on the directory shape).  ``ds`` must already be one row per
    key (build-time duplicates are upserted by ``version``)."""
    from ..functions.exchange import hash_exchange

    os.makedirs(out_dir, exist_ok=True)
    meta = {"key": key, "version": version, "npartitions": npartitions}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)

    def bucket_fn(tbl: pa.Table):
        return _part_ids(tbl, key, npartitions), tbl

    parts = hash_exchange(ds, nbuckets=npartitions, bucket_fn=bucket_fn,
                          reduce_fn=None)
    refs = [r for b in parts.iter_internal_ref_bundles()
            for r in b.block_refs]

    @ray.remote
    def write_one(i: int, blk) -> int:
        t = blk if isinstance(blk, pa.Table) else pa.table(blk)
        if t.num_rows:
            flag = np.zeros(t.num_rows, np.int64)
            t = _upsert_last_wins(t, key, version, flag)
        tmp = os.path.join(out_dir, f".part-{i}.parquet.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{i}.parquet"))
        return t.num_rows

    counts = ray.get([write_one.remote(i, r)
                      for i, r in enumerate(refs)])
    meta["rows"] = int(sum(counts))
    return meta


def read_keyed_layout(out_dir: str):
    return ray.data.read_parquet(
        [os.path.join(out_dir, f) for f in sorted(os.listdir(out_dir))
         if f.startswith("part-") and f.endswith(".parquet")])


def merge_into(out_dir: str, delta, *, npartitions: int | None = None
               ) -> dict:
    """Apply ``delta`` (a Ray Dataset with the layout's key + version
    columns and the same schema) to the layout at ``out_dir``.

    Returns ``{"touched": [...], "untouched": n}``; untouched
    partition files are never opened, never rewritten."""
    from ..functions.exchange import hash_exchange

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    key, version = meta["key"], meta["version"]
    nparts = meta["npartitions"]

    def bucket_fn(tbl: pa.Table):
        return _part_ids(tbl, key, nparts), tbl

    parts = hash_exchange(delta, nbuckets=nparts, bucket_fn=bucket_fn,
                          reduce_fn=None)
    refs = [r for b in parts.iter_internal_ref_bundles()
            for r in b.block_refs]

    @ray.remote
    def apply_one(i: int, blk) -> int:
        d = blk if isinstance(blk, pa.Table) else pa.table(blk)
        if d.num_rows == 0:
            return 0  # pruned: the base file is not even opened
        path = os.path.join(out_dir, f"part-{i}.parquet")
        base = pq.read_table(path) if os.path.exists(path) \
            else d.slice(0, 0)
        d = d.select(base.column_names) if base.num_columns else d
        merged = pa.concat_tables([base, d],
                                  promote_options="default")
        flag = np.concatenate(
            (np.zeros(base.num_rows, np.int64),
             np.ones(d.num_rows, np.int64)))
        merged = _upsert_last_wins(merged, key, version, flag)
        tmp = os.path.join(out_dir, f".part-{i}.parquet.tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, path)
        return 1

    touched_flags = ray.get([apply_one.remote(i, r)
                             for i, r in enumerate(refs)])
    touched = [i for i, t in enumerate(touched_flags) if t]
    return {"touched": touched,
            "untouched": nparts - len(touched)}


def delete_from(out_dir: str, keys) -> dict:
    """Partition-pruned DELETE: drop every row whose key appears in
    ``keys`` (a Ray Dataset carrying the layout's key column, or a
    numpy int64 array).  Like :func:`merge_into`, only partitions that
    hash-route a requested key are opened and atomically rewritten;
    keys absent from the table delete nothing (idempotent replay —
    the CDC tombstone contract)."""
    from ..collect import collect_table

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    key = meta["key"]
    nparts = meta["npartitions"]

    if not isinstance(keys, np.ndarray):
        keys = collect_table(keys.select_columns([key]))[key] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    keys = np.unique(keys)
    ktbl = pa.table({key: pa.array(keys, pa.int64())})
    pid = _part_ids(ktbl, key, nparts)

    @ray.remote
    def delete_one(i: int, kk: np.ndarray) -> int:
        path = os.path.join(out_dir, f"part-{i}.parquet")
        if not os.path.exists(path):
            return 0
        base = pq.read_table(path)
        k = base[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(kk, k), 0, len(kk) - 1)
        drop = kk[pos] == k
        if not drop.any():
            return 0  # nothing matched: leave the file untouched
        out = base.filter(pa.array(~drop))
        tmp = os.path.join(out_dir, f".part-{i}.parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        return int(drop.sum())

    jobs = {}
    for i in np.unique(pid):
        jobs[int(i)] = delete_one.remote(int(i), np.sort(keys[pid == i]))
    dropped = ray.get(list(jobs.values()))
    return {"touched": [i for i, d in zip(jobs, dropped) if d],
            "deleted": int(sum(dropped)),
            "untouched": nparts - len(jobs)}
