"""Export / profiling / paging operators.

Covers the reference's remaining sinks and scans (SURVEY.md §2):

- K6  ``ReadGeobufCSV``/``WriteRow`` (read_geobuf_stdout.go:188-221):
  fixed column projection + computed Bounds/Type/Geometry columns to
  CSV.  The reference hard-codes a 50-tag OSM list (``toptags``,
  read_geobuf_stdout.go:15); ours takes the projection as an argument
  with a small documented default.
- K7/A4  ``metadata.MakeMeta``/``CreateMetaCSV`` (metadata/meta.go:
  31-120): per-feature profiling — type, vertex count, property count,
  JSON vs geobuf sizes and codec timings.
- A2  ``GetKeys`` (read_geobuf_stdout.go:168-186): distinct property
  keys across a stream — a distinct aggregation.
- M9  ``Increment`` (increment.go:9-32): take the next N features and
  stamp a COLORKEY property.
- S9  ``SubFileSeek``/``SubFileBytes`` (reader.go:278-304): key-
  addressed read of one partition — here manifest-pruned file reads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec.schema import GEOM_TYPE_NAMES, list_column_parts, property_columns
from ..spatial.geometry import feature_bbox

# a small documented default projection (the reference's toptags idea,
# not its verbatim list): common OSM-ish keys
DEFAULT_CSV_COLUMNS = ("name", "highway", "building", "amenity", "natural",
                       "landuse", "waterway", "surface", "oneway", "ref")


def csv_projection_batch(batch: pa.Table,
                         columns=DEFAULT_CSV_COLUMNS) -> pa.Table:
    """Feature rows -> fixed string projection + computed Bounds /
    Type / Geometry columns (K6's WriteRow shape)."""
    n = batch.num_rows
    coords, offs = list_column_parts(batch["coords"], np.float64)
    dim = (batch["dim"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
           if "dim" in batch.column_names else np.full(n, 2, np.int64))
    bb = feature_bbox(coords, offs, dim)
    gtypes = batch["geom_type"].combine_chunks().to_numpy(zero_copy_only=False)
    bounds = [
        "" if np.isnan(b[0]) else f"{b[0]:.7f},{b[1]:.7f},{b[2]:.7f},{b[3]:.7f}"
        for b in bb
    ]
    type_names = [GEOM_TYPE_NAMES.get(int(g), "") for g in gtypes]
    nverts = (np.diff(offs) // np.maximum(dim, 1)).astype(np.int64)
    cols: dict[str, pa.Array] = {
        "Bounds": pa.array(bounds, pa.string()),
        "Type": pa.array(type_names, pa.string()),
        "Vertices": pa.array(nverts),
    }
    for name in columns:
        if name in batch.column_names:
            cols[name] = batch[name].cast(pa.string())
        else:
            cols[name] = pa.array([""] * n, pa.string())
    return pa.table(cols)


def write_csv_projection(ds, out_dir: str, columns=DEFAULT_CSV_COLUMNS,
                         **map_kwargs):
    """Feature Dataset -> CSV files of the fixed projection."""
    proj = ds.map_batches(
        lambda b: csv_projection_batch(b, columns),
        batch_format="pyarrow", zero_copy_batch=True, **map_kwargs)
    proj.write_csv(out_dir)
    return out_dir


def profile_batch(batch: pa.Table) -> pa.Table:
    """Per-feature codec profile — K7's metrics schema, per batch:
    type, verticies, number_properties, size_json, size_buf, and
    per-batch amortized encode/decode timings (ns/feature)."""
    import json
    import time

    from ..codec import decode as dc
    from ..codec import feature as fc
    from ..io import geojson as gj

    n = batch.num_rows
    t0 = time.perf_counter_ns()
    enc = fc.encode_batch(batch)
    t1 = time.perf_counter_ns()
    dc.decode_batch(enc)
    t2 = time.perf_counter_ns()
    enc_offs = np.frombuffer(enc.buffers()[1], np.int32, n + 1)
    size_buf = np.diff(enc_offs).astype(np.int64)
    feats = gj.table_to_features(batch)
    t3 = time.perf_counter_ns()
    js = [json.dumps(f, separators=(",", ":")) for f in feats]
    t4 = time.perf_counter_ns()
    for s in js:
        json.loads(s)
    t5 = time.perf_counter_ns()
    size_json = np.asarray([len(s) for s in js], np.int64)
    coords, offs = list_column_parts(batch["coords"], np.float64)
    dim = (batch["dim"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
           if "dim" in batch.column_names else np.full(n, 2, np.int64))
    nverts = (np.diff(offs) // np.maximum(dim, 1)).astype(np.int64)
    pc = property_columns(batch)
    nprops = np.zeros(n, np.int64)
    for name in pc:
        col = batch[name].combine_chunks()
        nprops += (~np.asarray(col.is_null())).astype(np.int64)
    gtypes = batch["geom_type"].combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table({
        "type": pa.array([GEOM_TYPE_NAMES.get(int(g), "") for g in gtypes]),
        "verticies": pa.array(nverts),
        "number_properties": pa.array(nprops),
        "size_json": pa.array(size_json),
        "size_buf": pa.array(size_buf),
        "time_write_buf_ns": pa.array(np.full(n, (t1 - t0) // max(n, 1), np.int64)),
        "time_read_buf_ns": pa.array(np.full(n, (t2 - t1) // max(n, 1), np.int64)),
        "time_write_json_ns": pa.array(np.full(n, (t4 - t3) // max(n, 1), np.int64)),
        "time_read_json_ns": pa.array(np.full(n, (t5 - t4) // max(n, 1), np.int64)),
    })


def profile_features(ds, **map_kwargs):
    """Dataset stage: feature rows -> per-feature codec metrics rows."""
    return ds.map_batches(profile_batch, batch_format="pyarrow",
                          zero_copy_batch=True, **map_kwargs)


def distinct_property_keys(ds) -> list[str]:
    """A2 GetKeys: distinct property key set across a geobuf stream.

    Works on rows with a ``geobuf`` binary column (partial read — keys
    only, geometry untouched) via per-block distinct + driver union."""
    from ..codec import decode as dc

    def partial(batch: pa.Table) -> pa.Table:
        keys = dc.read_keys(batch["geobuf"])
        flat = sorted({k for row in keys for k in row})
        return pa.table({"key": pa.array(flat, pa.string())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return sorted({r["key"] for r in rows})


def paginate(ds, n: int, colorkey: str | None = None):
    """M9 Increment: the next ``n`` features, optionally stamped with a
    COLORKEY property (increment.go:24-29 stamps for map display)."""
    page = ds.limit(n)
    if colorkey is None:
        return page

    def stamp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "COLORKEY", pa.array([colorkey] * batch.num_rows, pa.string()))

    return page.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)


def read_tile_keys(out_dir: str, keys) -> "object":
    """S9 SubFileSeek: read ONLY the named tile partitions of a tiled
    output directory — partition pruning via the manifest, no scan of
    other tiles."""
    from ..io.geobuf_file import read_geobuf
    from ..state.checkpoint import load_manifest

    manifest = load_manifest(out_dir)
    if "path" not in manifest.column_names:
        raise KeyError(
            f"{out_dir} has no per-partition manifest rows "
            "(write with checkpointed_split_combine, or read the "
            "_manifest.parquet of split_combine outputs directly)")
    want = set(keys)
    # a salted hot tile commits as '<tile>~sN' partitions — a bare tile
    # key addresses all of its salt buckets (prefix match)
    paths = [p for k, p in zip(manifest["key"].to_pylist(),
                               manifest["path"].to_pylist())
             if k in want or k.split("~s")[0] in want]
    if not paths:
        raise KeyError(f"no manifest entries for {sorted(want)}")
    return read_geobuf(paths)
