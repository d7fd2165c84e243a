"""Distributed connected components over an edge Dataset.

The clustering step a dedup pipeline needs downstream of candidate
pairs (MinHash / SimHash / phash emit PAIRS; keep-one-per-component
needs the transitive closure).  The reference has no graph ops; this
is new-engine surface.

Algorithm: hash-min label propagation with POINTER DOUBLING —
``L(v) <- min(L(v), min_{(u,v) in E} L(u))`` each round, then
``L(v) <- min(L(v), L(L(v)))`` — which converges in O(log n) rounds
even on path graphs (plain propagation needs O(diameter) rounds).

Every step is a hash-bucket exchange (``hash_cogroup``), so neither
the edge set nor the label table ever centralizes; the label table is
exactly one row per node after every round, and the driver only reads
a per-round (count, sum) checksum for convergence (labels decrease
monotonically, so an unchanged sum IS the fixed point).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_I64 = pa.int64()
_EDGE_SCHEMA = pa.schema([("a", _I64), ("b", _I64)])
_LAB_SCHEMA = pa.schema([("node", _I64), ("label", _I64)])


def _first_per_node(node: np.ndarray, lab: np.ndarray) -> pa.Table:
    order = np.lexsort((lab, node))
    node, lab = node[order], lab[order]
    first = np.concatenate(([True], node[1:] != node[:-1])) \
        if len(node) else np.empty(0, bool)
    return pa.table({"node": pa.array(node[first]),
                     "label": pa.array(lab[first])})


def _np(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def connected_components(edges, *, src: str = "src", dst: str = "dst",
                         nbuckets: int = 32, max_rounds: int = 64):
    """Components of the undirected graph given by an edge Dataset.

    Returns a pyarrow Table ``(node, component)`` where ``component``
    is the minimum node id reachable from ``node``.  Nodes appear iff
    they occur in an edge (self-loops fine).  Node ids must be int64.
    """
    import ray

    from ..collect import collect_table
    from .exchange import hash_cogroup

    def sym(batch: pa.Table) -> pa.Table:
        u = batch[src].combine_chunks().cast(_I64)
        v = batch[dst].combine_chunks().cast(_I64)
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    sedges = edges.map_batches(sym, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    # initial labels: L(v) = min(v, min neighbor) — one exchange-free
    # partial per block + a bucket combine folded into round 1's merge
    def init_labels(batch: pa.Table) -> pa.Table:
        a, b = _np(batch["a"]), _np(batch["b"])
        return _first_per_node(a, np.minimum(a, b))

    labels = sedges.map_batches(init_labels, batch_format="pyarrow",
                                zero_copy_batch=True)

    def merge_min(new: pa.Table, cur: pa.Table) -> pa.Table:
        node = np.concatenate([_np(new["node"]), _np(cur["node"])])
        lab = np.concatenate([_np(new["label"]), _np(cur["label"])])
        return _first_per_node(node, lab)

    # fold duplicate per-block init rows into one row per node
    empty = ray.data.from_arrow(pa.table({"node": pa.array([], _I64),
                                          "label": pa.array([], _I64)}))
    labels = hash_cogroup(labels, empty, nbuckets=nbuckets,
                          left_on="node", right_on="node",
                          reduce_fn=merge_min,
                          left_schema=_LAB_SCHEMA,
                          right_schema=_LAB_SCHEMA).materialize()

    def propagate(e: pa.Table, l: pa.Table) -> pa.Table:
        """edges bucketed on ``a`` meet labels bucketed on ``node``:
        emit (b, label(a)) candidate rows (bucketed arbitrarily —
        merged per node next step)."""
        a, b = _np(e["a"]), _np(e["b"])
        node, lab = _np(l["node"]), _np(l["label"])
        order = np.argsort(node)
        node, lab = node[order], lab[order]
        if not len(node):
            return pa.table({"node": pa.array([], _I64),
                             "label": pa.array([], _I64)})
        pos = np.clip(np.searchsorted(node, a), 0, len(node) - 1)
        hit = node[pos] == a
        return pa.table({"node": pa.array(b[hit]),
                         "label": pa.array(lab[pos[hit]])})

    def double(l_by_label: pa.Table, l_by_node: pa.Table) -> pa.Table:
        """rows bucketed on their LABEL meet the label table bucketed
        on node: rewrite label -> min(label, L(label)).  One row per
        node in, one out."""
        node1, lab1 = _np(l_by_label["node"]), _np(l_by_label["label"])
        node2, lab2 = _np(l_by_node["node"]), _np(l_by_node["label"])
        order = np.argsort(node2)
        node2, lab2 = node2[order], lab2[order]
        if len(node2):
            pos = np.clip(np.searchsorted(node2, lab1), 0, len(node2) - 1)
            hit = node2[pos] == lab1
            lab1 = np.where(hit, np.minimum(lab1, lab2[pos]), lab1)
        return pa.table({"node": pa.array(node1),
                         "label": pa.array(lab1.astype(np.int64))})

    def checksum(ds) -> tuple[int, int]:
        """(row count, label sum) via per-block partials — only a
        handful of tiny rows reach the driver, never the label table."""
        def part(b: pa.Table) -> pa.Table:
            return pa.table({"c": pa.array([b.num_rows], _I64),
                             "s": pa.array([int(_np(b["label"]).sum())
                                            if b.num_rows else 0], _I64)})

        t = collect_table(ds.map_batches(part, batch_format="pyarrow",
                                         zero_copy_batch=True,
                                         batch_size=None))
        return (int(_np(t["c"]).sum()), int(_np(t["s"]).sum()))

    # the edge set never changes: hash + ship it ONCE and reuse the
    # bucket refs every round (re-exchanging |E| per round was the
    # dominant redundant cost of the loop)
    from .exchange import cogroup_presplit, presplit

    edge_maps = presplit(sedges, nbuckets=nbuckets, on="a")

    prev = None
    for _ in range(max_rounds):
        cand = cogroup_presplit(edge_maps, labels, nbuckets=nbuckets,
                                right_on="node", reduce_fn=propagate,
                                left_schema=_EDGE_SCHEMA,
                                right_schema=_LAB_SCHEMA)
        labels = hash_cogroup(cand, labels, nbuckets=nbuckets,
                              left_on="node", right_on="node",
                              reduce_fn=merge_min,
                              left_schema=_LAB_SCHEMA,
                              right_schema=_LAB_SCHEMA).materialize()
        labels = hash_cogroup(labels, labels, nbuckets=nbuckets,
                              left_on="label", right_on="node",
                              reduce_fn=double,
                              left_schema=_LAB_SCHEMA,
                              right_schema=_LAB_SCHEMA).materialize()
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur

    out = collect_table(labels) if hasattr(labels, "iter_batches") else labels
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(out)
    node, lab = _np(out["node"]), _np(out["label"])
    t = _first_per_node(node, lab)
    return t.rename_columns(["node", "component"])


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 20,
             nbuckets: int = 32) -> pa.Table:
    """PageRank of the directed graph given by an edge Dataset.

    Returns ``(node, rank)`` over every node appearing in an edge;
    ranks sum to 1.  Standard damped formulation with dangling-node
    mass redistributed uniformly:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling/N)

    Shape per iteration: the edge set is hashed and shipped ONCE
    (presplit on ``src``) and reused every round; one cogroup joins
    edge buckets with the rank table to emit per-destination
    contribution sums (pre-aggregated inside the bucket, so the second
    exchange carries at most one row per (bucket, dst)); a second
    cogroup folds contributions into the rank table.  The driver only
    ever sees a per-round scalar (the dangling mass), never the rank
    table.  Fixed ``iters`` rounds keep the result deterministic.
    """
    import ray

    from ..collect import collect_table
    from .exchange import cogroup_presplit, hash_cogroup, presplit

    _RANK_SCHEMA = pa.schema([("node", _I64), ("rank", pa.float64()),
                              ("deg", _I64)])
    _CONTRIB_SCHEMA = pa.schema([("node", _I64), ("c", pa.float64())])

    def edge_cast(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch[src].combine_chunks().cast(_I64),
                         "b": batch[dst].combine_chunks().cast(_I64)})

    E = edges.map_batches(edge_cast, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    # node table with out-degree: per-block (node, deg-partial) rows
    # for sources plus (node, 0) rows for destinations, sum-merged
    def deg_partial(batch: pa.Table) -> pa.Table:
        a, b = _np(batch["a"]), _np(batch["b"])
        ua, cnt = np.unique(a, return_counts=True)
        ub = np.unique(b)
        return pa.table({
            "node": pa.array(np.concatenate([ua, ub])),
            "deg": pa.array(np.concatenate(
                [cnt.astype(np.int64), np.zeros(len(ub), np.int64)]))})

    def deg_merge(new: pa.Table, _: pa.Table) -> pa.Table:
        node, deg = _np(new["node"]), _np(new["deg"])
        order = np.argsort(node)
        node, deg = node[order], deg[order]
        first = np.concatenate(([True], node[1:] != node[:-1])) \
            if len(node) else np.empty(0, bool)
        seg = np.cumsum(first) - 1
        return pa.table({"node": pa.array(node[first]),
                         "deg": pa.array(np.bincount(
                             seg, weights=deg).astype(np.int64))})

    parts = E.map_batches(deg_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    empty = ray.data.from_arrow(pa.table({"node": pa.array([], _I64),
                                          "deg": pa.array([], _I64)}))
    deg_schema = pa.schema([("node", _I64), ("deg", _I64)])
    nodes = hash_cogroup(parts, empty, nbuckets=nbuckets,
                         left_on="node", right_on="node",
                         reduce_fn=deg_merge, left_schema=deg_schema,
                         right_schema=deg_schema).materialize()
    n_total = nodes.count()
    if not n_total:
        return pa.table({"node": pa.array([], _I64),
                         "rank": pa.array([], pa.float64())})

    def init_rank(batch: pa.Table) -> pa.Table:
        r = np.full(batch.num_rows, 1.0 / n_total)
        return pa.table({"node": batch["node"], "rank": pa.array(r),
                         "deg": batch["deg"]})

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    edge_maps = presplit(E, nbuckets=nbuckets, on="a")

    def contribs(e: pa.Table, r: pa.Table) -> pa.Table:
        a, b = _np(e["a"]), _np(e["b"])
        node = _np(r["node"])
        rank = r["rank"].to_numpy(zero_copy_only=False)
        deg = _np(r["deg"])
        order = np.argsort(node)
        node, rank, deg = node[order], rank[order], deg[order]
        if not len(node) or not len(a):
            return _CONTRIB_SCHEMA.empty_table()
        pos = np.clip(np.searchsorted(node, a), 0, len(node) - 1)
        hit = node[pos] == a
        share = rank[pos[hit]] / np.maximum(deg[pos[hit]], 1)
        # pre-aggregate per destination before the exchange
        ub, inv = np.unique(b[hit], return_inverse=True)
        sums = np.bincount(inv, weights=share)
        return pa.table({"node": pa.array(ub), "c": pa.array(sums)})

    def dangling_mass(rds) -> float:
        def part(bt: pa.Table) -> pa.Table:
            deg = _np(bt["deg"])
            rank = bt["rank"].to_numpy(zero_copy_only=False)
            return pa.table({"m": pa.array(
                [float(rank[deg == 0].sum())], pa.float64())})

        t = collect_table(rds.map_batches(part, batch_format="pyarrow",
                                          zero_copy_batch=True,
                                          batch_size=None))
        return float(t["m"].to_numpy(zero_copy_only=False).sum())

    for _ in range(iters):
        dang = dangling_mass(ranks)
        base = (1.0 - damping) / n_total + damping * dang / n_total

        def apply(cand: pa.Table, r: pa.Table) -> pa.Table:
            node = _np(r["node"])
            rank = np.full(len(node), base)
            cn, cc = _np(cand["node"]), \
                cand["c"].to_numpy(zero_copy_only=False)
            if len(cn) and len(node):
                # cand may hold one row per upstream map per node
                ucn, inv = np.unique(cn, return_inverse=True)
                csum = np.bincount(inv, weights=cc)
                order = np.argsort(node)
                pos = np.clip(np.searchsorted(node[order], ucn),
                              0, len(node) - 1)
                hit = node[order[pos]] == ucn
                rank[order[pos[hit]]] += damping * csum[hit]
            return pa.table({"node": pa.array(node),
                             "rank": pa.array(rank), "deg": r["deg"]})

        cand = cogroup_presplit(edge_maps, ranks, nbuckets=nbuckets,
                                right_on="node", reduce_fn=contribs,
                                left_schema=_EDGE_SCHEMA,
                                right_schema=_RANK_SCHEMA)
        ranks = hash_cogroup(cand, ranks, nbuckets=nbuckets,
                             left_on="node", right_on="node",
                             reduce_fn=apply,
                             left_schema=_CONTRIB_SCHEMA,
                             right_schema=_RANK_SCHEMA).materialize()

    out = collect_table(ranks)
    node = _np(out["node"])
    order = np.argsort(node)
    return pa.table({
        "node": pa.array(node[order]),
        "rank": out["rank"].take(pa.array(order, pa.int64()))})
