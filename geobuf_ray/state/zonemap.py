"""Zone maps (per-file min/max statistics) for data-skipping scans.

The lakehouse file-pruning primitive (Iceberg/Delta data skipping,
Parquet row-group stats lifted to the FILE level where the planner can
use them before any I/O): `zonemap_build` records per-file min/max for
chosen columns next to the data, `read_with_zonemap` opens ONLY the
files whose [min, max] interval intersects the predicate — on a table
laid out sorted or clustered by the predicate column, a narrow scan
touches O(matching files), independent of table size.

The same idea the geobuf gob index serves for key-addressed byte
ranges (reference reader.go:277-304) and GeoParquet's per-file bbox
serves spatially (io/geoparquet.read_geoparquet) — this is the plain
relational-column instance.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_ZONES = "_zonemap.json"


def zonemap_build(ds, out_dir: str, *, columns: list[str],
                  sort_by: str | None = None,
                  rows_per_file: int = 65536) -> dict:
    """Write ``ds`` as a directory of parquet files plus a zone-map
    sidecar holding per-file min/max of ``columns``.  With ``sort_by``
    the dataset is range-partitioned first (the sample-sort exchange),
    so zones are disjoint and pruning is sharp; without it zones may
    overlap and pruning degrades gracefully (never wrongly skips).
    Stats are computed per block BEFORE writing — one pass."""
    os.makedirs(out_dir, exist_ok=True)
    if sort_by is not None:
        ds = ds.sort(sort_by)
    refs = ds.to_arrow_refs()
    zones = []
    i = 0
    for r in refs:
        t = ray.get(r)
        for s in range(0, max(t.num_rows, 1), rows_per_file):
            part = t.slice(s, rows_per_file)
            if part.num_rows == 0:
                continue
            name = f"part-{i:05d}.parquet"
            stats = {}
            for c in columns:
                col = part[c]
                v = col.to_numpy(zero_copy_only=False)
                stats[c] = [int(v.min()), int(v.max())]
            tmp = os.path.join(out_dir, name + ".tmp")
            pq.write_table(part, tmp)
            os.rename(tmp, os.path.join(out_dir, name))
            zones.append({"file": name, "rows": part.num_rows,
                          "stats": stats})
            i += 1
    meta = {"columns": list(columns), "zones": zones,
            "sorted_by": sort_by}
    tmp = os.path.join(out_dir, _ZONES + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, os.path.join(out_dir, _ZONES))
    return meta


def zonemap_files(out_dir: str, col: str, lo: int, hi: int) -> tuple:
    """(matching file paths, total files) for predicate
    ``lo <= col <= hi`` — interval-intersection on the sidecar, no
    data file opened."""
    with open(os.path.join(out_dir, _ZONES)) as f:
        meta = json.load(f)
    if col not in meta["columns"]:
        raise KeyError(f"no zone stats for column {col!r}")
    keep = []
    for z in meta["zones"]:
        mn, mx = z["stats"][col]
        if mn <= hi and lo <= mx:
            keep.append(os.path.join(out_dir, z["file"]))
    return keep, len(meta["zones"])


def read_with_zonemap(out_dir: str, col: str, lo: int, hi: int,
                      **read_kwargs):
    """Dataset over ONLY the zone-matching files, with the exact
    predicate re-applied per batch (pruning is a performance contract,
    correctness never depends on it — the same idempotent-refine rule
    the TPC-H Q6 pushdown uses)."""
    files, _total = zonemap_files(out_dir, col, lo, hi)
    if not files:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(files, **read_kwargs)

    def refine(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((v >= lo) & (v <= hi)))

    return ds.map_batches(refine, batch_format="pyarrow",
                          zero_copy_batch=True)
