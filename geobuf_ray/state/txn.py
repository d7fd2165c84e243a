"""Multi-table atomic transactions over keyed layouts — the
cross-table commit the single-table machinery (mergeinto.py) leaves
out, built the way catalog-backed lakehouses do it: a transaction LOG
of snapshot VECTORS.

A commit appends each table's delta through the existing
:func:`~geobuf_ray.state.mergeinto.append_delta` (merge-on-read,
O(delta) per table), collects the per-table snapshot ids those appends
return, and publishes them together as ONE atomically-renamed
``commit-<k>.json``.  Readers resolve every table AS OF the latest
published vector (the existing time-travel path), so they see either
all of a transaction or none of it — the vector IS the transaction
boundary.

Crash atomicity: a crash after some appends but before the vector
rename leaves per-table deltas whose snapshot ids sit ABOVE the last
published pin.  No vector reader ever saw them, so the next
:func:`txn_commit` (or an explicit :func:`txn_recover`) deletes those
unpinned delta files before appending — rollback, not roll-forward,
which is what makes the half-transaction vanish instead of leaking
into the next commit's pins.  Corollary: tables under transaction
management must be written ONLY through ``txn_commit`` (the
single-writer rule extended to the log); an out-of-band
``append_delta`` is indistinguishable from a crashed half-transaction
and will be rolled back.

Compaction interacts through the existing expire-snapshots contract:
folding deltas into the base advances the ``compacted_at`` watermark,
so vectors older than the last compaction raise 'expired' exactly like
any other as_of read below the watermark.
"""
from __future__ import annotations

import json
import os

from .mergeinto import _load_meta, append_delta, read_keyed_layout


def _commit_ids(txn_dir: str) -> list[int]:
    if not os.path.isdir(txn_dir):
        return []
    out = []
    for f in os.listdir(txn_dir):
        if f.startswith("commit-") and f.endswith(".json"):
            out.append(int(f[len("commit-"):-len(".json")]))
    return sorted(out)


def txn_latest(txn_dir: str) -> tuple[int, dict[str, int]]:
    """(k, vector) of the newest published commit; (0, {}) before the
    first."""
    ids = _commit_ids(txn_dir)
    if not ids:
        return 0, {}
    with open(os.path.join(txn_dir, f"commit-{ids[-1]:05d}.json")) as f:
        return ids[-1], {k: int(v) for k, v in json.load(f).items()}


def txn_recover(txn_dir: str, tables: dict[str, str]) -> dict[str, int]:
    """Roll BACK unpinned deltas: for every table in the latest
    vector, delete delta files whose snapshot id exceeds its pin (a
    crashed half-transaction no reader ever saw).  Tables not yet in
    any vector are untouched — their pre-log state is the baseline the
    first commit will pin.  Returns per-table deleted-file counts;
    idempotent."""
    _, vec = txn_latest(txn_dir)
    removed: dict[str, int] = {}
    for name, d in tables.items():
        if name not in vec:
            continue
        pin = vec[name]
        n = 0
        for f in list(os.listdir(d)):
            if f.startswith("delta-") and f.endswith(".parquet") and \
                    int(f.split("-")[2].split(".")[0]) > pin:
                os.remove(os.path.join(d, f))
                n += 1
        removed[name] = n
    return removed


def txn_commit(txn_dir: str, appends: dict[str, tuple[str, object]],
               pin_only: dict[str, str] | None = None) -> dict:
    """Atomically commit correlated deltas across tables.

    ``appends`` maps table name -> (layout dir, delta rows — a Ray
    Dataset or pyarrow Table); ``pin_only`` names tables that take no
    delta this commit but should be pinned at their current snapshot
    (so one vector covers the whole schema).  Steps: recover (roll
    back unpinned deltas), append every delta, publish the vector by
    one atomic rename.  Returns {"commit": k, "vector": {...},
    "rolled_back": {...}}."""
    import ray

    os.makedirs(txn_dir, exist_ok=True)
    pin_only = pin_only or {}
    dirs = {n: d for n, (d, _) in appends.items()}
    dirs.update(pin_only)
    rolled = txn_recover(txn_dir, dirs)
    k, vec = txn_latest(txn_dir)
    new_vec = dict(vec)
    for name, (d, delta) in appends.items():
        if not isinstance(delta, ray.data.Dataset):
            delta = ray.data.from_arrow(delta)
        res = append_delta(d, delta)
        new_vec[name] = int(res["snapshot"])
    for name, d in pin_only.items():
        if name not in appends:
            new_vec[name] = int(_load_meta(d).get("snapshot", 0))
    tmp = os.path.join(txn_dir, f".commit-{k + 1:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_vec, f)
    os.replace(tmp, os.path.join(txn_dir, f"commit-{k + 1:05d}.json"))
    return {"commit": k + 1, "vector": new_vec, "rolled_back": rolled}


def txn_read(txn_dir: str, name: str, table_dir: str, **kwargs):
    """Read one table AS OF the latest published vector — the
    transactionally-consistent view.  Raises if the table has never
    been pinned (it is not under transaction management)."""
    _, vec = txn_latest(txn_dir)
    if name not in vec:
        raise KeyError(f"table {name!r} is not pinned by any commit "
                       f"in {txn_dir!r}")
    return read_keyed_layout(table_dir, as_of=vec[name], **kwargs)
