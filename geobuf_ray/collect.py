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

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        if schema is not None:
            return schema.empty_table()
        s = ds.schema()
        s = getattr(s, "base_schema", s)
        return s.empty_table()
    out = pa.concat_tables(tables, promote_options="default")
    if schema is not None and out.schema != schema:
        out = out.cast(schema)
    return out
