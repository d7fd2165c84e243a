"""Trajectory statistics: per-entity ordered path metrics.

GPS-track style aggregation over an (entity, time, x, y) point
stream: path length, net displacement, and point count per entity,
with Manhattan (L1) metrics so every number is EXACT int64 — the
Euclidean variants need a sqrt per segment and are left to the
consumer (emit the squared sums yourself if you need them).

One hash exchange on the entity key; the per-bucket kernel is one
lexsort + shifted differences vectorized across every entity of the
bucket (the ``transition_counts`` shape with coordinate deltas
instead of state pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["trajectory_stats"]


def trajectory_stats(ds, *, key: str, order: str, x: str, y: str,
                     nbuckets: int = 32, **map_kwargs):
    """Per-key path metrics under the total order ``order`` (pass a
    composite (time, id) axis for deterministic duplicate-time
    ordering — ties would otherwise make path length
    partition-dependent):

    - ``n_points``: points on the track,
    - ``path_l1``: sum of per-segment Manhattan lengths,
    - ``net_l1``: Manhattan distance first -> last point.

    Integer coordinates required (exact; SQL-twin parity)."""
    from ..functions.exchange import hash_exchange

    def kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "n_points": pa.array([], pa.int64()),
                          "path_l1": pa.array([], pa.int64()),
                          "net_l1": pa.array([], pa.int64())})
        if tbl.num_rows == 0:
            return empty
        k = tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
        o = tbl[order].to_numpy(zero_copy_only=False)
        xv = tbl[x].to_numpy(zero_copy_only=False)
        yv = tbl[y].to_numpy(zero_copy_only=False)
        if not (np.issubdtype(xv.dtype, np.integer)
                and np.issubdtype(yv.dtype, np.integer)):
            raise TypeError("trajectory_stats needs integer coords")
        xv = xv.astype(np.int64)
        yv = yv.astype(np.int64)
        sel = np.lexsort((o, k))
        ks, xs, ys = k[sel], xv[sel], yv[sel]
        same = ks[1:] == ks[:-1]            # segment i-1 -> i intra-key
        seg = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
        ug, inv = np.unique(ks, return_inverse=True)
        path = np.zeros(len(ug), np.int64)
        np.add.at(path, inv[1:][same], seg[same])
        first = np.concatenate(([True], ~same))
        last = np.concatenate((~same, [True]))
        net = (np.abs(xs[last] - xs[first])
               + np.abs(ys[last] - ys[first]))
        npts = np.bincount(inv, minlength=len(ug)).astype(np.int64)
        return pa.table({key: pa.array(ug), "n_points": npts,
                         "path_l1": pa.array(path),
                         "net_l1": pa.array(net)})

    return hash_exchange(ds, nbuckets=nbuckets, on=key,
                         reduce_fn=kernel, schema=None, **map_kwargs)
