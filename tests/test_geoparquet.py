"""GeoParquet interop: spec metadata, bbox file pruning, round-trip."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geobuf_ray.codec.wkb import decode_wkb, encode_wkb
from geobuf_ray.io.geoparquet import (read_geoparquet,
                                      read_geoparquet_meta,
                                      write_geoparquet)


def _points_wkb(lons, lats):
    from geobuf_ray.codec.wkb import points_geo_table

    return encode_wkb(points_geo_table(lons, lats))


def test_geoparquet_roundtrip_meta_and_pruning(ray_session, tmp_path):
    import ray

    d = str(tmp_path / "gpq")
    # two spatially-disjoint blocks -> two files with disjoint bboxes
    west = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "geometry": _points_wkb([-100.0, -90.0],
                                             [10.0, 20.0])})
    east = pa.table({"id": pa.array([3, 4], pa.int64()),
                     "geometry": _points_wkb([100.0, 110.0],
                                             [30.0, 40.0])})
    ds = ray.data.from_arrow([west, east])
    res = write_geoparquet(ds, d)
    assert res["files"] == 2 and res["rows"] == 4
    assert res["bbox"] == [-100.0, 10.0, 110.0, 40.0]

    meta = read_geoparquet_meta(d)
    assert len(meta) == 2
    for m in meta.values():
        col = m["columns"]["geometry"]
        assert m["version"] == "1.0.0"
        assert col["encoding"] == "WKB"
        assert col["geometry_types"] == ["Point"]

    # full read round-trips exactly
    got = {}
    for b in read_geoparquet(d).iter_batches(batch_format="pyarrow"):
        dec = decode_wkb(b["geometry"])
        vals = dec["coords"].combine_chunks().values.to_numpy(
            zero_copy_only=False)
        for i, lon, lat in zip(b["id"].to_pylist(), vals[0::2],
                               vals[1::2]):
            got[i] = (lon, lat)
    assert got == {1: (-100.0, 10.0), 2: (-90.0, 20.0),
                   3: (100.0, 30.0), 4: (110.0, 40.0)}

    # bbox pruning skips the east file entirely
    west_only = read_geoparquet(d, bbox=[-120, 0, -80, 50])
    assert sorted(r["id"] for b in west_only.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()) == [1, 2]
    with pytest.raises(ValueError, match="pruned every file"):
        read_geoparquet(d, bbox=[0, -10, 10, -5])

    # a plain parquet directory is NOT GeoParquet
    d2 = str(tmp_path / "plain")
    os.makedirs(d2)
    pq.write_table(pa.table({"x": pa.array([1])}),
                   os.path.join(d2, "part-0.parquet"))
    with pytest.raises(ValueError, match="no 'geo' metadata"):
        read_geoparquet_meta(d2)

COUNTY = "/root/reference/test_data/county.geobuf"


@pytest.mark.skipif(not os.path.exists(COUNTY),
                    reason="reference corpus absent")
def test_geobuf_to_geoparquet_county(ray_session, tmp_path):
    """geobuf -> GeoParquet converter: every county feature survives
    with geometry (via WKB, raw float64 = bit-exact) and properties
    value-equal to a direct decode of the same stream."""
    from geobuf_ray.io import geobuf_file as gbf
    from geobuf_ray.pipelines.convert import geobuf_to_geoparquet
    from geobuf_ray.stages import codec_stages as cs

    d = str(tmp_path / "county_gp")
    man = geobuf_to_geoparquet(COUNTY, d)
    assert man["files"] >= 1

    # reference: direct decode of the stream
    ref = (cs.decode(gbf.read_geobuf(COUNTY))
           .to_pandas().sort_values(["id", "index"])
           .reset_index(drop=True))
    assert man["rows"] == len(ref)
    assert not ref.duplicated(["id", "index"]).any()

    got_tabs = []
    for b in read_geoparquet(d).iter_batches(batch_format="pyarrow"):
        geo = decode_wkb(b["geometry"])
        t = b.drop_columns(["geometry"])
        for name in geo.column_names:
            t = t.append_column(name, geo[name])
        got_tabs.append(t)
    got = (pa.concat_tables(got_tabs).to_pandas()
           .sort_values(["id", "index"]).reset_index(drop=True))

    assert len(got) == len(ref)
    for col in ("id", "AREA", "COLORKEY", "area", "index",
                "geom_type"):
        same = (got[col] == ref[col]) | (got[col].isna()
                                         & ref[col].isna())
        assert same.all(), col
    for i in range(0, len(ref), 97):  # coords bit-exact (WKB is raw f64)
        assert np.array_equal(np.asarray(got["coords"][i]),
                              np.asarray(ref["coords"][i]))
        assert np.array_equal(np.asarray(got["ring_sizes"][i]),
                              np.asarray(ref["ring_sizes"][i]))
