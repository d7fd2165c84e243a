"""Driver-side collection helpers.

``collect_table`` materializes a (small) Dataset as ONE pyarrow Table
via Arrow block refs — no per-row Python dict conversion, and native
types (uint64, nested lists) survive without re-coercion.  Use it
wherever a bounded result (partial aggregates, candidate sets,
manifests) must reach the driver; large datasets should keep streaming.
"""

from __future__ import annotations

import pyarrow as pa


def collect_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    import ray

    # NOT ds.to_arrow_refs(): that calls schema(fetch_if_missing=True)
    # AFTER execution, and when block schemas fail to unify (empty
    # partials, nested metadata) the schema is still missing — so it
    # RE-EXECUTES the whole plan behind a limit-1 (measured: doubled
    # every collect-based query).  Pull the block refs directly.
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    blocks = ray.get(refs)
    tables = []
    for b in blocks:
        if not isinstance(b, pa.Table):  # pandas block (shouldn't happen
            b = pa.Table.from_pandas(b)  # in our pyarrow pipelines)
        if b.num_rows:
            tables.append(b)
    if not tables:
        if schema is not None:
            return schema.empty_table()
        # prefer a zero-row block's own schema: ds.schema() can be None
        # when every block is empty (nothing to unify)
        for b in blocks:
            if isinstance(b, pa.Table) and b.num_columns:
                return b.slice(0, 0)
        s = ds.schema()
        s = getattr(s, "base_schema", s)
        if s is None:
            return pa.table({})
        return s.empty_table()
    out = pa.concat_tables(tables, promote_options="default")
    if schema is not None and out.schema != schema:
        out = out.cast(schema)
    return out
