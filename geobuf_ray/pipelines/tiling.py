"""Tiling (split-combine) engine — the reference's flagship pipeline
re-expressed as ONE Ray Data shuffle.

The reference (``splitcombine/split_combine.go:425-559``) routes
features to per-tile subfiles through a fd-bounded (≈750 open files)
hierarchical multi-pass split, then byte-concatenates subfiles with a
gob index.  Ray Data replaces all of that with:

    assign tiles (vectorized flat-map)  →  groupby(tile_key)  →
    per-tile output file + manifest row

One all-to-all shuffle, no fd bound, no multi-round refinement
(SURVEY.md §3.2).  The TILEID property stamp (split_combine.go:385-389)
becomes a plain ``tile_key`` column.

Scale notes (100 TB): the shuffle key is the packed uint64 tile at the
TARGET zoom (pick one key, reuse it downstream); features covering many
tiles fan out in the map stage (bbox cover × exact bbox-intersect
refinement), so block sizes stay bounded by `batch_size`; hot tiles can
be salted via ``salt_bits`` which splits a tile's output into 2^bits
files that remain key-prefix addressable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec.schema import list_column_parts
from ..spatial import tiles
from ..spatial.geometry import feature_bbox


def assign_tiles_batch(
    batch: pa.Table,
    zoom: int,
    bounds: tuple[float, float, float, float] | None = None,
    salt_bits: int = 0,
) -> pa.Table:
    """Fan each feature out to its covering tiles at ``zoom``.

    Output: input columns replicated per covering tile + ``tile_key``
    (uint64 packed) and ``tile_str`` ("x-y-z") columns.  Features whose
    bbox misses ``bounds`` are dropped (the reference's job-bounds
    ``Intersect`` filter, split_combine.go:377-383).
    """
    n = batch.num_rows
    if n == 0:
        return _with_tile_cols(batch, np.empty(0, np.int64),
                               np.empty(0, np.uint64), np.empty(0, np.uint8))
    coords, offs = list_column_parts(batch["coords"], np.float64)
    dim = (
        batch["dim"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if "dim" in batch.column_names
        else np.full(n, 2, np.int64)
    )
    bb = feature_bbox(coords, offs, dim)
    if bounds is not None:
        w, s, e, nn = bounds
        with np.errstate(invalid="ignore"):
            out_of_bounds = ~((bb[:, 0] <= e) & (bb[:, 2] >= w)
                              & (bb[:, 1] <= nn) & (bb[:, 3] >= s))
        bb = bb.copy()
        bb[out_of_bounds] = np.nan
    row_idx, keys = tiles.bbox_cover_rows(bb, zoom)
    if salt_bits > 0 and len(keys):
        # salt from feature CONTENT (id when present, else the
        # quantized first coordinate pair) — batch-local row indices
        # would change with block boundaries across runs and break
        # checkpoint resume (a feature could re-salt into an
        # already-committed partition and be dropped).  The salt rides
        # in its OWN column (shuffles group on [tile_key, tile_salt]):
        # bit-packing it into the key would shift the zoom bits
        # (pack() uses bits 58-63) off the top for zoom >= 16.
        if "id" in batch.column_names:
            ident = (batch["id"].combine_chunks().fill_null(0)
                     .to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            ident = np.zeros(n, np.int64)
        first = offs[:-1].copy()
        has = np.diff(offs) >= 2
        fx = np.zeros(n, np.int64)
        fy = np.zeros(n, np.int64)
        fx[has] = (coords[first[has]] * 1e7).astype(np.int64)
        fy[has] = (coords[first[has] + 1] * 1e7).astype(np.int64)
        h = (ident.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ^ fx.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
             ^ fy.view(np.uint64) * np.uint64(0x165667B19E3779F9))
        salt = (h[row_idx] >> np.uint64(64 - salt_bits)).astype(np.uint8)
    else:
        salt = np.zeros(len(keys), np.uint8)
    return _with_tile_cols(batch, row_idx, keys, salt)


def _with_tile_cols(batch, row_idx, keys, salt):
    taken = batch.take(pa.array(row_idx, pa.int64()))
    tile_strs = tiles.tile_key_str(keys)
    taken = taken.append_column("tile_key", pa.array(keys, pa.uint64()))
    taken = taken.append_column("tile_str", pa.array(tile_strs, pa.string()))
    taken = taken.append_column("tile_salt", pa.array(salt, pa.uint8()))
    return taken


def assign_tiles(ds, zoom: int, bounds=None, salt_bits: int = 0, **map_kwargs):
    """Dataset stage: feature rows -> (feature x covering-tile) rows."""
    return ds.map_batches(
        lambda b: assign_tiles_batch(b, zoom, bounds, salt_bits),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **map_kwargs,
    )


def split_combine(
    ds,
    out_dir: str,
    zoom: int,
    *,
    bounds=None,
    salt_bits: int = 0,
    write_bbox: bool = True,
    map_kwargs: dict | None = None,
):
    """Full tiling pipeline: assign -> shuffle by tile -> per-tile
    geobuf file + manifest (replaces MapGeobuf, split_combine.go:425-559).

    Returns the manifest table (one row per tile file: key, count,
    bounds, size, timing).
    """
    import os

    import pyarrow.parquet as pq

    from ..io.geobuf_file import _WriteGeobufFn

    tiled = assign_tiles(ds, zoom, bounds, salt_bits, **(map_kwargs or {}))
    # one map_groups call per tile -> one stream file + one manifest row
    write_fn = _WriteGeobufFn(out_dir, write_bbox, key_column="tile_str")

    def write_tile_group(group: pa.Table) -> pa.Table:
        return write_fn(group)

    # shuffle on the (salted) packed key; tile_str names the output file,
    # so a salted hot tile yields several prefix-addressable files
    manifest_ds = tiled.groupby(["tile_key", "tile_salt"]).map_groups(
        write_tile_group, batch_format="pyarrow"
    )
    manifest = pa.Table.from_pylist(manifest_ds.take_all())  # one row per tile
    pq.write_table(manifest, os.path.join(out_dir, "_manifest.parquet"))
    return manifest


def tile_counts(ds, zoom: int, bounds=None, **map_kwargs):
    """Per-tile feature counts — the manifest aggregate
    (groupby(tile).count(), SURVEY.md §2.6 A3)."""
    tiled = assign_tiles(ds, zoom, bounds, **map_kwargs)
    return tiled.groupby("tile_str").count()
