"""GeoParquet interop: partitioned parquet with WKB geometry columns
and the spec's ``geo`` file metadata (version / primary_column /
per-column encoding + geometry_types + bbox), per the PUBLIC
GeoParquet 1.0.0 spec (github.com/opengeospatial/geoparquet) — the
interchange format GeoPandas / DuckDB-spatial / GDAL readers expect.

Shape: one file per input block (resumable partitioned output, never
one giant file); each file carries its OWN bbox in the metadata so a
reader can prune files spatially without opening them.  Geometry
travels as the engine's vectorized WKB (codec/wkb) — raw float64, so
round-trips are bit-exact.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_GEO_TYPES = {1: "Point", 2: "LineString", 3: "Polygon",
              4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon"}


def _geo_meta(geometry_col: str, geom_types: list[str],
              bbox: list[float]) -> bytes:
    return json.dumps({
        "version": "1.0.0",
        "primary_column": geometry_col,
        "columns": {geometry_col: {
            "encoding": "WKB",
            "geometry_types": sorted(geom_types),
            "bbox": bbox,
        }},
    }).encode()


def write_geoparquet(ds, out_dir: str, *,
                     geometry_col: str = "geometry") -> dict:
    """Write a Dataset whose ``geometry_col`` holds WKB binary to a
    GeoParquet directory: one ``part-<i>.parquet`` per block, each
    with the spec's ``geo`` metadata carrying that FILE's geometry
    types and bbox (computed by the vectorized WKB decoder — no
    Python loop over geometries)."""
    from ..codec.wkb import decode_wkb

    os.makedirs(out_dir, exist_ok=True)
    # a write REPLACES the directory's dataset: stale part files from
    # a previous (larger) write would otherwise silently merge into
    # every later read
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))
    refs = [r for b in ds.iter_internal_ref_bundles()
            for r in b.block_refs]

    @ray.remote
    def write_one(i: int, blk) -> list:
        t = blk if isinstance(blk, pa.Table) else pa.table(blk)
        if geometry_col not in t.column_names:
            raise ValueError(f"missing geometry column "
                             f"{geometry_col!r}")
        if t.num_rows == 0:
            return None  # empty block: no file, no fabricated bbox
        dec = decode_wkb(t[geometry_col])
        coords = dec["coords"].combine_chunks().values.to_numpy(
            zero_copy_only=False)
        bbox = [float(coords[0::2].min()), float(coords[1::2].min()),
                float(coords[0::2].max()), float(coords[1::2].max())]
        gts = sorted({_GEO_TYPES[int(g)] for g in
                      np.unique(dec["geom_type"].to_numpy(
                          zero_copy_only=False))})
        meta = dict(t.schema.metadata or {})
        meta[b"geo"] = _geo_meta(geometry_col, gts, bbox)
        t = t.replace_schema_metadata(meta)
        tmp = os.path.join(out_dir, f".part-{i}.parquet.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{i}.parquet"))
        return [t.num_rows, bbox]

    out = [o for o in ray.get([write_one.remote(i, r)
                               for i, r in enumerate(refs)])
           if o is not None]
    boxes = [b for _, b in out]
    return {"files": len(out), "rows": int(sum(n for n, _ in out)),
            "bbox": [min(b[0] for b in boxes), min(b[1] for b in boxes),
                     max(b[2] for b in boxes), max(b[3] for b in boxes)]
            if boxes else None}


def read_geoparquet_meta(path: str) -> dict:
    """Parse and validate each file's ``geo`` metadata; returns
    {file: parsed geo dict}.  Raises on a file without the key — a
    plain parquet directory is NOT GeoParquet."""
    out = {}
    for f in sorted(os.listdir(path)):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        md = pq.read_schema(os.path.join(path, f)).metadata or {}
        if b"geo" not in md:
            raise ValueError(f"{f} has no 'geo' metadata — not a "
                             "GeoParquet file")
        out[f] = json.loads(md[b"geo"])
    if not out:
        raise ValueError(f"no GeoParquet files under {path}")
    return out


def read_geoparquet(path: str, *, bbox: list[float] | None = None):
    """Read a GeoParquet directory as a Ray Dataset (geometry stays a
    WKB binary column; decode with codec/wkb inside map_batches).
    ``bbox=[w, s, e, n]`` prunes FILES whose metadata bbox doesn't
    intersect — the spec's file-skipping path; no pruned file is ever
    opened."""
    meta = read_geoparquet_meta(path)
    files = []
    for f, m in meta.items():
        if bbox is not None:
            col = m["columns"][m["primary_column"]]
            b = col["bbox"]
            if b[0] > bbox[2] or b[2] < bbox[0] or \
                    b[1] > bbox[3] or b[3] < bbox[1]:
                continue
        files.append(os.path.join(path, f))
    if not files:
        raise ValueError("bbox pruned every file")
    return ray.data.read_parquet(files)
