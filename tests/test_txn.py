"""Multi-table transaction log: atomic visibility, rollback recovery,
vector monotonicity."""
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest


def _mk(ray_session):
    import ray

    from geobuf_ray.state.mergeinto import build_keyed_layout

    da = tempfile.mkdtemp(prefix="txn_ta_", dir="/tmp")
    db = tempfile.mkdtemp(prefix="txn_tb_", dir="/tmp")
    dt = tempfile.mkdtemp(prefix="txn_tl_", dir="/tmp")
    ids = np.arange(100, dtype=np.int64)
    t = pa.table({"id": pa.array(ids), "ver": pa.array(np.zeros(100, np.int64)),
                  "cents": pa.array(ids * 10)})
    build_keyed_layout(ray.data.from_arrow(t), da, key="id",
                       version="ver", npartitions=4)
    build_keyed_layout(ray.data.from_arrow(t), db, key="id",
                       version="ver", npartitions=4)
    return da, db, dt


def _delta(ids, ver, cents):
    return pa.table({"id": pa.array(np.asarray(ids, np.int64)),
                     "ver": pa.array(np.full(len(ids), ver, np.int64)),
                     "cents": pa.array(np.asarray(cents, np.int64))})


def _cents_of(tbl, key):
    ids = tbl["id"].to_numpy(zero_copy_only=False)
    return int(tbl["cents"].to_numpy(zero_copy_only=False)[
        np.flatnonzero(ids == key)[0]])


def test_txn_atomic_visibility_and_rollback(ray_session):
    from geobuf_ray.collect import collect_table
    from geobuf_ray.state.mergeinto import append_delta
    from geobuf_ray.state.txn import txn_commit, txn_read

    da, db, dt = _mk(ray_session)
    try:
        txn_commit(dt, {}, pin_only={"a": da, "b": db})
        r1 = txn_commit(dt, {"a": (da, _delta([1, 2], 1, [111, 222])),
                             "b": (db, _delta([1, 2], 1, [111, 222]))})
        assert r1["commit"] == 2
        ta = collect_table(txn_read(dt, "a", da))
        assert _cents_of(ta, 1) == 111

        # crashed half-transaction: A only, never published
        import ray
        append_delta(da, ray.data.from_arrow(_delta([3], 2, [999999])))
        ta = collect_table(txn_read(dt, "a", da))
        assert _cents_of(ta, 3) == 30  # poison invisible to the vector

        # next commit rolls the half-transaction back
        ndeltas_before = sum(f.startswith("delta-")
                             for f in os.listdir(da))
        r2 = txn_commit(dt, {"a": (da, _delta([4], 3, [444])),
                             "b": (db, _delta([4], 3, [444]))})
        assert r2["rolled_back"]["a"] >= 1
        ta = collect_table(txn_read(dt, "a", da))
        assert _cents_of(ta, 3) == 30  # still the committed value
        assert _cents_of(ta, 4) == 444
        tb = collect_table(txn_read(dt, "b", db))
        assert _cents_of(tb, 4) == 444
    finally:
        for d in (da, db, dt):
            shutil.rmtree(d, ignore_errors=True)


def test_txn_recover_idempotent_and_unmanaged(ray_session):
    import ray

    from geobuf_ray.state.mergeinto import append_delta
    from geobuf_ray.state.txn import (txn_commit, txn_read,
                                      txn_recover)

    da, db, dt = _mk(ray_session)
    try:
        # before any commit: recover touches nothing (no pins)
        append_delta(da, ray.data.from_arrow(_delta([5], 1, [555])))
        assert txn_recover(dt, {"a": da}) == {}
        txn_commit(dt, {}, pin_only={"a": da, "b": db})
        # the pre-log delta was pinned as baseline: recover keeps it
        assert txn_recover(dt, {"a": da, "b": db}) == {"a": 0, "b": 0}
        assert txn_recover(dt, {"a": da, "b": db}) == {"a": 0, "b": 0}
        from geobuf_ray.collect import collect_table

        assert _cents_of(collect_table(txn_read(dt, "a", da)), 5) == 555
        with pytest.raises(KeyError):
            txn_read(dt, "missing", da)
    finally:
        for d in (da, db, dt):
            shutil.rmtree(d, ignore_errors=True)


def test_join_view_maintenance_self_certifies(ray_session):
    """The query carries an in-query assert that the incrementally
    maintained join view equals a direct recompute over the final
    states — running it IS the oracle; additionally the segment
    migration paths must both fire (MOVED present, totals conserved
    modulo the cents-update rule)."""
    from geobuf_ray.pipelines import queries as q

    t = q.orders_join_view_maintenance("/root/testdata/sf0.001")
    segs = t["segment"].to_pylist()
    assert "MOVED" in segs and len(segs) >= 5
    assert all(n > 0 for n in t["n_orders"].to_pylist())
