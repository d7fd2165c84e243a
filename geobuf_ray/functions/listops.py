"""List-column operators: UNNEST (explode) and per-group COLLECT_LIST.

The reference has no list columns; this is new-engine surface for the
embedding / multimodal tables (``embeddings.embedding`` is
``list<float>``).  ``unnest`` is a pure per-batch map (no shuffle, the
long table streams); ``collect_list`` is the usual skinny-row exchange
+ one lexsort per bucket, with a caller-chosen order column so the
lists are DETERMINISTIC (SQL's ``list(v ORDER BY s)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def unnest(ds, col: str, *, value_name: str | None = None,
           ordinal: str | None = None,
           schema: pa.Schema | None = None):
    """Explode a ``list<T>`` column: one output row per list element,
    the other columns repeated (SQL ``UNNEST``; NULL and empty lists
    produce no rows).  ``ordinal`` names an optional 1-based
    position column (``WITH ORDINALITY``)."""
    out_name = value_name or col
    in_schema = schema if schema is not None else pa.schema(
        list(zip(ds.schema().names, ds.schema().types)))
    others = [f.name for f in in_schema if f.name != col]
    elem_t = in_schema.field(col).type.value_type
    out_fields = [(n, in_schema.field(n).type) for n in others] \
        + [(out_name, elem_t)]
    if ordinal:
        out_fields.append((ordinal, pa.int64()))
    out_schema = pa.schema(out_fields)

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        lcol = batch[col].combine_chunks()
        parents = pc.list_parent_indices(lcol)
        flat = pc.list_flatten(lcol)
        cols = {n: batch[n].combine_chunks().take(parents)
                for n in others}
        cols[out_name] = flat
        if ordinal:
            # position within each list: global arange minus the
            # repeat of each row's start offset
            lens = pc.list_value_length(lcol).fill_null(0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            cols[ordinal] = pa.array(
                np.arange(len(flat), dtype=np.int64) - starts + 1)
        return pa.table(cols).cast(out_schema)

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def collect_list(ds, keys: list[str], value: str, *, order: str,
                 out_col: str = "vals", nbuckets: int = 16,
                 schema: pa.Schema | None = None):
    """Per-group list of ``value`` in ``order`` order — SQL
    ``list(value ORDER BY order)`` / ``ARRAY_AGG``.  Emits
    ``(keys..., out_col: list<T>)``, one row per group, elements in a
    deterministic order (ties broken by value).  NULL values are kept
    (SQL keeps them); NULL keys form a group.

    Shape: only (keys, order, value) rows move; one exchange on the
    group key, one lexsort + offset build per bucket.  A huge group
    widens its bucket's output row, never the driver.
    """
    from .exchange import hash_exchange

    key_list = list(keys)
    if schema is None:
        in_schema = ds.schema()
        types = dict(zip(in_schema.names, in_schema.types))
    else:
        types = {f.name: f.type for f in schema}
    out_schema = pa.schema([(k, types[k]) for k in key_list]
                           + [(out_col, pa.list_(types[value]))])

    proj = ds.select_columns(list(dict.fromkeys(
        key_list + [order, value])))

    def build(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or tbl.num_columns == 0:
            return out_schema.empty_table()
        srt = tbl.sort_by([(k, "ascending") for k in key_list]
                          + [(order, "ascending"),
                             (value, "ascending")])
        n = srt.num_rows
        first = np.ones(n, bool)
        diff = np.zeros(max(n - 1, 0), bool)
        for k in key_list:
            colk = srt[k].combine_chunks()
            a, b = colk.slice(1), colk.slice(0, n - 1)
            neq = pc.not_equal(a, b).fill_null(False) \
                .to_numpy(zero_copy_only=False)
            vdiff = pc.xor(pc.is_valid(a), pc.is_valid(b)) \
                .to_numpy(zero_copy_only=False)
            diff |= neq | vdiff
        first[1:] = diff
        starts = np.flatnonzero(first)
        offsets = pa.array(np.append(starts, n).astype(np.int32))
        vals = srt[value].combine_chunks()
        lists = pa.ListArray.from_arrays(offsets, vals)
        head = srt.take(pa.array(starts, pa.int64()))
        return pa.table({**{k: head[k] for k in key_list},
                         out_col: lists}).cast(out_schema)

    return hash_exchange(proj, nbuckets=nbuckets, on=key_list,
                         reduce_fn=build, schema=out_schema)
