"""Ray Data pipeline stages for the geobuf codec.

The reference's encoder/decoder run per feature in goroutines
(``geobuf_concurrent.go:9-63``, ``convert_geojson.go:110-139``); here
they are zero-copy Arrow ``map_batches`` stages — one vectorized kernel
call per block, parallelism and backpressure owned by Ray's streaming
executor (SURVEY.md §2.3 M1/M2).
"""

from __future__ import annotations

import pyarrow as pa

from ..codec import decode as dc
from ..codec import feature as fc
def encode_geobuf_batch(
    batch: pa.Table,
    keep_columns: tuple[str, ...] = ("id",),
    write_bbox: bool = True,
) -> pa.Table:
    """Batch kernel: feature columns -> ``geobuf: binary`` column.

    Keeps ``keep_columns`` (ids / partition keys) alongside the encoded
    record so downstream shuffles can key on them without decoding.
    """
    enc = fc.encode_batch(batch, write_bbox=write_bbox)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name in keep_columns:
        if name in batch.column_names:
            cols[name] = batch[name]
    cols["geobuf"] = enc
    return pa.table(cols)


def decode_geobuf_batch(batch: pa.Table, include_bbox: bool = False) -> pa.Table:
    """Batch kernel: ``geobuf: binary`` column -> feature columns.

    Extra columns riding along (path, tile_key, ...) are preserved.
    """
    out = dc.decode_batch(batch["geobuf"], include_bbox=include_bbox)
    for name in batch.column_names:
        if name != "geobuf" and name not in out.column_names:
            out = out.append_column(name, batch[name])
    return out


def encode(ds, *, keep_columns=("id",), write_bbox=True, **map_kwargs):
    """Dataset of feature rows -> Dataset with a ``geobuf`` binary column."""
    return ds.map_batches(
        lambda b: encode_geobuf_batch(b, tuple(keep_columns), write_bbox),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **map_kwargs,
    )


def decode(ds, *, include_bbox=False, **map_kwargs):
    """Dataset with a ``geobuf`` binary column -> Dataset of feature rows."""
    return ds.map_batches(
        lambda b: decode_geobuf_batch(b, include_bbox),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **map_kwargs,
    )


def read_keys_batch(batch: pa.Table) -> pa.Table:
    """Partial-read stage: per-record property key lists (S4).

    Ride-along columns (id / path / tile_key) are preserved like the
    sibling read_bbox_batch, so key lists stay joinable to records."""
    keys = dc.read_keys(batch["geobuf"])
    out = pa.table({"keys": pa.array(keys, pa.list_(pa.string()))})
    for name in batch.column_names:
        if name != "geobuf":
            out = out.append_column(name, batch[name])
    return out


def read_bbox_batch(batch: pa.Table) -> pa.Table:
    """Partial-read stage: per-record bbox only (S5/S6)."""
    bb = dc.read_bounding_boxes(batch["geobuf"])
    out = pa.table({"bbox": bb})
    for name in batch.column_names:
        if name != "geobuf":
            out = out.append_column(name, batch[name])
    return out
