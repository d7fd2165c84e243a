"""Resumable per-partition checkpointing with lineage + metrics.

The reference has NO crash recovery: its tiling engine deletes
intermediate subfiles on combine and a crash mid-pass loses everything
(``splitcombine/split_combine.go:227-231``, SURVEY.md §4).  This module
supplies the north_rule's missing property: every partition (tile key /
shard) commits ATOMICALLY as

    <out_dir>/<data file>            (written to .tmp, then renamed)
    <out_dir>/_manifest/<key>.json   (written to .tmp, then renamed,
                                      AFTER the data file exists)

so a killed run leaves only whole partitions behind.  On resume,
``completed_keys`` lists durable partitions and ``filter_completed``
drops their rows from the input Dataset BEFORE the shuffle — finished
partitions cost one manifest read, not a rewrite.

Manifest rows carry lineage + metrics per the north_rule: partition
key, output path, feature count, byte size, bounds, codec version,
wall seconds and features/sec.

Scale note: the manifest is one tiny JSON per partition — reads/writes
are embarrassingly parallel, no coordination, safe for concurrent
writers on shared storage (rename is atomic per key; double-writing a
partition is idempotent because the row is keyed by partition).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

CODEC_VERSION = "geobuf-ray-1"

_MANIFEST_DIR = "_manifest"


def _safe_key(key: str) -> str:
    return "".join(c if (c.isalnum() or c in "-_.") else "_" for c in key)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, _MANIFEST_DIR)


def write_manifest_row(out_dir: str, key: str, row: dict) -> None:
    """Atomically commit one partition's lineage/metrics record."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, _safe_key(key) + ".json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": key, "codec_version": CODEC_VERSION, **row}, f)
    os.replace(tmp, path)


def load_manifest(out_dir: str) -> pa.Table:
    """All committed partition records as one table (empty if none)."""
    d = manifest_dir(out_dir)
    rows = []
    if os.path.isdir(d):
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    rows.append(json.load(f))
    if not rows:
        return pa.table({"key": pa.array([], pa.string())})
    return pa.Table.from_pylist(rows)


def completed_keys(out_dir: str) -> set[str]:
    """Partitions whose manifest row AND data file are both durable."""
    done = set()
    tbl = load_manifest(out_dir)
    if "path" not in tbl.column_names:
        return done
    for key, path in zip(tbl["key"].to_pylist(), tbl["path"].to_pylist()):
        if path and os.path.exists(path):
            done.add(key)
    return done


def filter_completed(ds, key_col: str, done: set[str], **map_kwargs):
    """Drop rows whose partition already committed (resume fast-path).

    ``done`` is shipped once via ``ray.put`` and read per actor/task —
    a broadcast small-side lookup, not re-serialized per batch.
    """
    if not done:
        return ds
    import ray

    done_ref = ray.put(frozenset(done))

    class _Filter:
        def __init__(self):
            self.done = ray.get(done_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hit = pc.is_in(batch[key_col],
                           value_set=pa.array(sorted(self.done), pa.string()))
            return batch.filter(pc.invert(pc.fill_null(hit, False)))

    return ds.map_batches(_Filter, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=map_kwargs.pop("concurrency", (1, 4)),
                          **map_kwargs)


def checkpointed_split_combine(
    ds,
    out_dir: str,
    zoom: int,
    *,
    bounds=None,
    salt_bits: int = 0,
    write_bbox: bool = True,
    clip: bool = False,
    map_kwargs: dict | None = None,
) -> pa.Table:
    """Resumable tiling: like ``pipelines.tiling.split_combine`` but each
    tile commits independently and a re-run skips committed tiles.
    ``clip=True`` commits CLIPPED per-tile geometry (ClipFeature
    flagship semantics) with the same resume guarantees.

    Returns the full manifest (committed-before + written-now).
    """
    import time

    import numpy as _np

    from ..codec import feature as fc
    from ..io.geobuf_file import _bounds_of_batch
    from ..pipelines.tiling import assign_tiles, tile_clip

    os.makedirs(out_dir, exist_ok=True)
    done = completed_keys(out_dir)

    if clip:
        if salt_bits:
            raise ValueError("salt_bits applies to bbox fan-out only")
        tiled = tile_clip(ds, zoom, bounds, **(map_kwargs or {}))
        tiled = tiled.map_batches(
            lambda b: b.append_column(
                "tile_salt",
                pa.array(_np.zeros(b.num_rows, _np.uint8))),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        tiled = assign_tiles(ds, zoom, bounds, salt_bits, **(map_kwargs or {}))
    if salt_bits:
        # a salted hot tile commits as 2^salt_bits independent
        # partitions; the checkpoint key carries the salt so manifest
        # rows (and resume filtering) stay one-to-one with shuffle
        # groups while filenames remain tile-prefix addressable
        def add_ckpt_key(batch: pa.Table) -> pa.Table:
            salts = batch["tile_salt"].to_numpy(zero_copy_only=False)
            keys = [f"{t}~s{int(s)}" for t, s in
                    zip(batch["tile_str"].to_pylist(), salts)]
            return batch.append_column("ckpt_key", pa.array(keys, pa.string()))

        tiled = tiled.map_batches(add_ckpt_key, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        def add_ckpt_key(batch: pa.Table) -> pa.Table:
            return batch.append_column("ckpt_key", batch["tile_str"])

        tiled = tiled.map_batches(add_ckpt_key, batch_format="pyarrow",
                                  zero_copy_batch=True)
    todo = filter_completed(tiled, "ckpt_key", done)

    def write_tile(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"key": pa.array([], pa.string())})
        t0 = time.perf_counter()
        key = str(group["ckpt_key"][0].as_py())
        feat_cols = group.drop_columns(
            [c for c in ("tile_key", "tile_str", "tile_salt", "ckpt_key")
             if c in group.column_names])
        records = fc.encode_batch(feat_cols, write_bbox=write_bbox)
        stream = fc.frame_records(records)
        bb = _bounds_of_batch(feat_cols)
        path = os.path.join(out_dir, _safe_key(key) + ".geobuf")
        tmp = path + ".tmp"
        os.makedirs(out_dir, exist_ok=True)
        with open(tmp, "wb") as f:
            f.write(stream)
        os.replace(tmp, path)
        dt = time.perf_counter() - t0
        row = {
            "path": path,
            "num_features": len(records),
            "size_bytes": len(stream),
            "west": None if np.isnan(bb[0]) else bb[0],
            "south": None if np.isnan(bb[1]) else bb[1],
            "east": None if np.isnan(bb[2]) else bb[2],
            "north": None if np.isnan(bb[3]) else bb[3],
            "write_seconds": dt,
            "features_per_sec": len(records) / dt if dt > 0 else None,
        }
        write_manifest_row(out_dir, key, row)
        return pa.table({"key": pa.array([key], pa.string())})

    # the shuffle: one group per (salted) tile key, committed
    # independently — routed through the raw-task hash exchange
    # (grouped_exchange), not Ray's sort-based groupby
    from ..functions.exchange import grouped_exchange

    grouped_exchange(
        todo, ["tile_key", "tile_salt"], write_tile, nbuckets=64,
        schema=pa.schema([("key", pa.string())])).materialize()
    return load_manifest(out_dir)
