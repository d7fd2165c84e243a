"""Behavioral-analytics operators: cohort retention and ordered
funnels over an event stream.

Both follow the engine's standard skinny-exchange shape: blocks
project + locally dedupe to the minimal (user, ...) rows, ONE
user-hash exchange co-locates each user's history, a vectorized
numpy kernel reduces every bucket independently (user sets are
disjoint across buckets, so per-bucket counts are exact partials),
and the driver merges a provably tiny (groups x buckets) table.
No reference analogue — new-engine surface for the training-data /
analytics tier (SURVEY.md addendum).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import hash_exchange

_US_PER_DAY = 86_400_000_000


def cohort_retention(ds, *, user_col: str = "user_id",
                     ts_col: str = "ts", nbuckets: int = 32):
    """Classic retention matrix: each user's cohort is the day of
    their FIRST event; for every (cohort_day, day_offset) count the
    distinct users active that day.

    Days are integer days since the epoch (``cohort_day``), offsets
    integer days since the cohort day — both exactly DuckDB's
    ``CAST(ts AS DATE)`` arithmetic, so the query hash-checks.

    Scale shape: blocks dedupe (user, day) pairs BEFORE the exchange
    (a user active 1000x one day ships one row), the exchange carries
    two int64 columns only, and the final merge is <= days^2 rows per
    bucket.
    """
    pair_schema = pa.schema([("u", pa.int64()), ("d", pa.int64())])

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table()
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch[ts_col].combine_chunks().cast(pa.timestamp("us")) \
            .to_numpy().astype("datetime64[us]").astype(np.int64)
        d = ts // _US_PER_DAY
        key = np.stack([u, d], axis=1)
        key = np.unique(key, axis=0)
        return pa.table({"u": key[:, 0], "d": key[:, 1]})

    pairs = ds.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)

    out_schema = pa.schema([("cohort_day", pa.int64()),
                            ("day_offset", pa.int64()),
                            ("n_users", pa.int64())])

    def reduce_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        u = tbl["u"].to_numpy(zero_copy_only=False)
        d = tbl["d"].to_numpy(zero_copy_only=False)
        # distinct across the bucket's blocks, then per-user min day
        key = np.unique(np.stack([u, d], axis=1), axis=0)
        u, d = key[:, 0], key[:, 1]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        cohort = d[first][np.cumsum(first) - 1]  # broadcast min-day
        off = d - cohort
        cells, n = np.unique(np.stack([cohort, off], axis=1), axis=0,
                             return_counts=True)
        return pa.table({"cohort_day": cells[:, 0],
                         "day_offset": cells[:, 1],
                         "n_users": n.astype(np.int64)})

    parts = hash_exchange(pairs, nbuckets=nbuckets, on="u",
                          reduce_fn=reduce_bucket, schema=out_schema)

    from ..collect import collect_table
    t = collect_table(parts)
    if t.num_rows == 0:
        return out_schema.empty_table()
    c = t["cohort_day"].to_numpy(zero_copy_only=False)
    o = t["day_offset"].to_numpy(zero_copy_only=False)
    n = t["n_users"].to_numpy(zero_copy_only=False)
    cells, inv = np.unique(np.stack([c, o], axis=1), axis=0,
                           return_inverse=True)
    total = np.bincount(inv, weights=n).astype(np.int64)
    return pa.table({"cohort_day": cells[:, 0],
                     "day_offset": cells[:, 1],
                     "n_users": total})


def funnel_counts(ds, steps: list[str], *, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  nbuckets: int = 32):
    """Ordered funnel: a user reaches step k when they have a step-k
    event STRICTLY after the earliest qualifying time of step k-1
    (greedy earliest-completion — the standard funnel semantics, and
    exactly the chained ``MIN(ts) ... WHERE ts > prev`` SQL).

    Returns one row per step: (step 1-based, event_type, n_users).
    Counts are cumulative by construction (an unreached step k blocks
    all later steps).

    Scale shape: blocks filter to funnel event types and project 3
    skinny columns; one user-hash exchange; the per-bucket kernel is
    vectorized ACROSS users (np.minimum.at per step, len(steps)
    iterations); driver merges len(steps) x nbuckets rows.
    """
    steps = list(steps)
    k_steps = len(steps)
    if k_steps == 0:
        raise ValueError("need at least one funnel step")

    proj_schema = pa.schema([("u", pa.int64()), ("t", pa.int64()),
                             ("s", pa.int8())])

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return proj_schema.empty_table()
        et = batch[type_col]
        import pyarrow.compute as pc
        sidx = pc.index_in(et, pa.array(steps))
        keep = pc.is_valid(sidx)
        idx = np.flatnonzero(keep.combine_chunks().to_numpy(
            zero_copy_only=False))
        if idx.size == 0:
            return proj_schema.empty_table()
        take = pa.array(idx, pa.int64())
        u = batch[user_col].take(take).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = batch[ts_col].take(take).combine_chunks() \
            .cast(pa.timestamp("us")).to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        s = sidx.take(take).to_numpy(zero_copy_only=False).astype(np.int8)
        return pa.table({"u": u, "t": ts, "s": s})

    rows = ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)

    out_schema = pa.schema([("step", pa.int64()), ("n_users", pa.int64())])

    def reduce_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        u = tbl["u"].to_numpy(zero_copy_only=False)
        t = tbl["t"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        _, codes = np.unique(u, return_inverse=True)
        nu = int(codes.max()) + 1
        counts = np.zeros(k_steps, dtype=np.int64)
        # int64 time axis end-to-end (no float64 quantization):
        # INT64_MIN = "before everything", INT64_MAX = "unreached"
        # (an unreached step blocks all later ones since no event time
        # can exceed INT64_MAX)
        lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        tprev = np.full(nu, lo, dtype=np.int64)
        for k in range(k_steps):
            mask = s == k
            ck, tk_ev = codes[mask], t[mask]
            ok = tk_ev > tprev[ck]
            tk = np.full(nu, hi, dtype=np.int64)
            np.minimum.at(tk, ck[ok], tk_ev[ok])
            counts[k] = int((tk < hi).sum())
            tprev = tk
        return pa.table({"step": np.arange(1, k_steps + 1,
                                           dtype=np.int64),
                         "n_users": counts})

    parts = hash_exchange(rows, nbuckets=nbuckets, on="u",
                          reduce_fn=reduce_bucket, schema=out_schema)

    from ..collect import collect_table
    t = collect_table(parts)
    total = np.zeros(k_steps, dtype=np.int64)
    if t.num_rows:
        st = t["step"].to_numpy(zero_copy_only=False) - 1
        total = np.bincount(st, weights=t["n_users"].to_numpy(
            zero_copy_only=False), minlength=k_steps).astype(np.int64)
    return pa.table({"step": np.arange(1, k_steps + 1, dtype=np.int64),
                     "event_type": pa.array(steps, pa.string()),
                     "n_users": total})
