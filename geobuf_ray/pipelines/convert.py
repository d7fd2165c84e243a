"""Conversion pipelines — the reference's two CLIs as Ray pipelines.

``geojson2geobuf`` (cmd/geojson2geobuf/geojson2geobuf.go:14-22 →
ConvertGeojson, convert_geojson.go:153-166) and ``geobuf2geojson``
(cmd/geobuf2geojson.go:14-24 → ConvertGeobuf, convert_geojson.go:
169-193), re-expressed as streaming Dataset pipelines: distributed
chunked parse / decode, sharded output, optional single-file assembly.
"""

from __future__ import annotations

import pyarrow as pa

from ..io import geobuf_file as gbf
from ..io import geojson_io as gio


def geojson_to_geobuf(in_paths, out_dir: str, *, write_bbox: bool = True,
                      **map_kwargs) -> pa.Table:
    """GeoJSON file(s) -> directory of framed geobuf streams + manifest."""
    ds = gio.read_geojson(in_paths)
    return gbf.write_geobuf(ds, out_dir, write_bbox=write_bbox, **map_kwargs)


def geobuf_to_geojson(in_paths, out_dir: str, *, single_file: str | None = None,
                      **map_kwargs) -> pa.Table:
    """Geobuf stream file(s) -> ndjson shards (+ optional single
    FeatureCollection file, assembled driver-side)."""
    from ..stages import codec_stages as cs

    ds = cs.decode(gbf.read_geobuf(in_paths))
    manifest = gio.write_geojson(ds, out_dir, **map_kwargs)
    if single_file:
        gio.concat_feature_collection(manifest["path"].to_pylist(), single_file)
    return manifest


def geobuf_to_geoparquet(in_paths, out_dir: str,
                         **map_kwargs) -> dict:
    """Geobuf stream file(s) -> a GeoParquet directory: decode
    (vectorized structure scan), re-encode geometry as OGC WKB — the
    decoder's geometry-table columns ARE the WKB encoder's input
    contract — and write one spec-compliant file per block with
    per-file bbox metadata (io/geoparquet).  Properties travel as
    plain columns; the geobuf ``id`` is preserved.  Closes the interop
    triangle geobuf <-> geojson <-> geoparquet.  WKB here is 2-D
    (codec/wkb contract), so dim-3/4 geobuf records are refused by
    ``encode_wkb`` rather than silently truncated."""
    from ..codec.wkb import encode_wkb
    from ..io.geoparquet import write_geoparquet
    from ..stages import codec_stages as cs

    ds = gbf.read_geobuf(in_paths)

    def to_wkb(batch: pa.Table) -> pa.Table:
        dec = cs.decode_geobuf_batch(batch)
        geom_cols = ["geom_type", "dim", "coords", "ring_sizes",
                     "poly_sizes"]
        props = dec.drop_columns(geom_cols)
        return props.append_column("geometry",
                                   encode_wkb(dec.select(geom_cols)))

    out = ds.map_batches(to_wkb, batch_format="pyarrow",
                         zero_copy_batch=True, **map_kwargs)
    return write_geoparquet(out, out_dir)
