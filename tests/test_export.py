"""Export/profiling/paging operators (SURVEY.md K6/K7/A2/M9/S9)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.io import geojson as gj
from geobuf_ray.pipelines import export as ex

REF = "/root/reference/test_data"
needs_ref = pytest.mark.skipif(
    not os.path.exists(f"{REF}/county.geojson"), reason="reference corpus absent"
)


def _feats(n=50):
    return [
        {"type": "Feature", "id": i,
         "properties": {"name": f"f{i}", "highway": "primary"},
         "geometry": {"type": "LineString",
                      "coordinates": [[i * 0.1, i * 0.2], [i * 0.1 + 1, i * 0.2 + 1]]}}
        for i in range(n)
    ]


def test_csv_projection_batch():
    tbl = gj.features_to_table(_feats(10))
    out = ex.csv_projection_batch(tbl)
    assert out.num_rows == 10
    assert out["Type"].to_pylist() == ["LineString"] * 10
    assert out["name"].to_pylist()[3] == "f3"
    assert out["building"].to_pylist() == [""] * 10  # absent key -> empty
    w, s, e, n = (float(x) for x in out["Bounds"].to_pylist()[2].split(","))
    assert (w, s) == (0.2, 0.4) and (e, n) == (1.2, 1.4)


def test_write_csv_projection(ray_session, tmp_path):
    import ray

    ds = ray.data.from_arrow(gj.features_to_table(_feats(40))).repartition(2)
    out = str(tmp_path / "csv")
    ex.write_csv_projection(ds, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    import csv

    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows.extend(list(csv.DictReader(fh)))
    assert len(rows) == 40
    assert {r["Type"] for r in rows} == {"LineString"}


def test_profile_features(ray_session):
    import ray

    ds = ray.data.from_arrow(gj.features_to_table(_feats(30)))
    prof = pa.Table.from_pylist(ex.profile_features(ds).take_all())
    assert prof.num_rows == 30
    assert prof["verticies"].to_pylist() == [2] * 30
    assert prof["number_properties"].to_pylist() == [2] * 30
    assert all(b > 0 for b in prof["size_buf"].to_pylist())
    assert all(j > b for j, b in zip(prof["size_json"].to_pylist(),
                                     prof["size_buf"].to_pylist()))


def test_distinct_keys_and_paginate(ray_session):
    import ray

    from geobuf_ray.stages import codec_stages as cs

    feats = _feats(25)
    feats[7]["properties"]["amenity"] = "cafe"
    ds = ray.data.from_arrow(gj.features_to_table(feats)).repartition(3)
    enc = cs.encode(ds, keep_columns=("id",))
    keys = ex.distinct_property_keys(enc)
    assert keys == ["amenity", "highway", "name"]

    page = ex.paginate(ds, 10, colorkey="#ff0000")
    rows = page.take_all()
    assert len(rows) == 10
    assert all(r["COLORKEY"] == "#ff0000" for r in rows)


def test_read_tile_keys_pruning(ray_session, tmp_path):
    import ray

    from geobuf_ray.state import checkpoint as ck

    rng = np.random.default_rng(11)
    feats = [
        {"type": "Feature", "id": i, "properties": {},
         "geometry": {"type": "Point",
                      "coordinates": [float(rng.uniform(-170, 170)),
                                      float(rng.uniform(-80, 80))]}}
        for i in range(200)
    ]
    ds = ray.data.from_arrow(gj.features_to_table(feats)).repartition(2)
    out = str(tmp_path / "tiles")
    manifest = ck.checkpointed_split_combine(ds, out, zoom=1)
    keys = manifest["key"].to_pylist()
    one = keys[0]
    got = ex.read_tile_keys(out, [one])
    n_expected = [r["num_features"] for r in manifest.to_pylist()
                  if r["key"] == one][0]
    assert got.count() == n_expected
    with pytest.raises(KeyError):
        ex.read_tile_keys(out, ["nope"])
