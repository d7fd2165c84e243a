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
