"""Connected components vs a scalar union-find oracle."""

import numpy as np
import pyarrow as pa

from geobuf_ray.functions.graph import connected_components


def uf_oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for mem in comp.values():
        m = min(mem)
        for n in mem:
            out[n] = m
    return out


def _run(E, ray, nbuckets=8):
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })).repartition(4)
    got = connected_components(ds, nbuckets=nbuckets)
    return dict(zip(got["node"].to_pylist(), got["component"].to_pylist()))


def test_cc_long_chain(ray_session):
    """200-link path: plain hash-min needs 200 rounds; pointer
    doubling must converge in O(log n)."""
    import ray

    E = [(i, i + 1) for i in range(200)]
    nodes = sorted({x for e in E for x in e})
    assert _run(E, ray) == uf_oracle(E, nodes)


def test_cc_random_graphs(ray_session):
    import ray

    rng = np.random.default_rng(0)
    for _ in range(3):
        E = [(int(rng.integers(0, 400)), int(rng.integers(0, 400)))
             for _ in range(250)]
        nodes = sorted({x for e in E for x in e})
        assert _run(E, ray) == uf_oracle(E, nodes)


def test_cc_self_loops_and_isolates(ray_session):
    import ray

    E = [(0, 1), (1, 2), (99, 99), (7, 7)]
    nodes = sorted({x for e in E for x in e})
    got = _run(E, ray)
    assert got == uf_oracle(E, nodes)
    assert got[99] == 99 and got[7] == 7


def test_minhash_dedup_distributed_cc_path(ray_session, monkeypatch):
    """Force the large-pair-set branch: the distributed components
    closure must drop the same ids as the driver union-find."""
    import ray

    from geobuf_ray.functions import dedup as dd

    base = ("spark shuffle partition reduce map stage executor task "
            "block row column join filter ") * 6
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        texts.append(base if i % 4 == 0 else base + f" unique{i} " * 30)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).repartition(3)
    kept_small, drop_small = dd.minhash_dedup(ds, sim_threshold=0.5)
    monkeypatch.setattr(dd, "_DIST_CC_PAIRS", 0)
    kept_big, drop_big = dd.minhash_dedup(ds, sim_threshold=0.5)
    assert drop_small == drop_big
    assert sorted(kept_big.to_pandas().doc_id) == \
        sorted(kept_small.to_pandas().doc_id)


def _dense_pagerank(n, edges, d=0.85, iters=20):
    """Reference power iteration with uniform dangling redistribution."""
    deg = np.zeros(n, np.int64)
    for u, _ in edges:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[deg == 0].sum()
        nxt = np.full(n, (1.0 - d) / n + d * dang / n)
        for u, v in edges:
            nxt[v] += d * r[u] / deg[u]
        r = nxt
    return r


def test_pagerank_vs_dense_power_iteration(ray_session):
    import ray

    from geobuf_ray.functions.graph import pagerank

    rng = np.random.default_rng(13)
    n = 120
    m = 700
    e = np.unique(
        rng.integers(0, n, (m, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    tbl = pa.table({"src": pa.array(e[:, 0].astype(np.int64)),
                    "dst": pa.array(e[:, 1].astype(np.int64))})
    out = pagerank(ray.data.from_arrow(tbl).repartition(4),
                   iters=15, nbuckets=8)
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    # dense oracle over the same node universe (nodes in any edge)
    present = np.unique(e)
    remap = {int(v): i for i, v in enumerate(present)}
    re_edges = [(remap[int(u)], remap[int(v)]) for u, v in e]
    ref = _dense_pagerank(len(present), re_edges, iters=15)
    assert set(got) == {int(v) for v in present}
    for v in present:
        assert abs(got[int(v)] - ref[remap[int(v)]]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_graph(ray_session):
    # hub-and-spoke: all spokes point at the hub; hub is dangling
    import ray

    from geobuf_ray.functions.graph import pagerank

    spokes = np.arange(1, 9, dtype=np.int64)
    tbl = pa.table({"src": pa.array(spokes),
                    "dst": pa.array(np.zeros(8, np.int64))})
    out = pagerank(ray.data.from_arrow(tbl), iters=30, nbuckets=4)
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    # hub outranks every spoke; spokes all equal by symmetry
    sp = [got[int(s)] for s in spokes]
    assert got[0] > max(sp)
    assert max(sp) - min(sp) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_count_known_graphs(ray_session):
    import ray

    from geobuf_ray.functions.graph import triangle_count

    def run(src, dst, nb=4):
        tbl = pa.table({"src": pa.array(src, pa.int64()),
                        "dst": pa.array(dst, pa.int64())})
        return triangle_count(ray.data.from_arrow(tbl).repartition(3),
                              nbuckets=nb).to_pydict()

    # K4: C(4,3)=4 triangles, 6 edges (given with dups + reversals +
    # a self-loop, all of which must be ignored)
    src = [0, 0, 0, 1, 1, 2, 2, 1, 3]
    dst = [1, 2, 3, 2, 3, 3, 0, 0, 3]
    out = run(src, dst)
    assert out == {"n_triangles": [4], "n_edges": [6]}
    # path graph: 0 triangles
    out = run(list(range(9)), list(range(1, 10)))
    assert out == {"n_triangles": [0], "n_edges": [9]}


def test_triangle_count_random_vs_bruteforce(ray_session):
    import ray

    from geobuf_ray.functions.graph import triangle_count

    rng = np.random.default_rng(5)
    n, m = 60, 300
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    adj = np.zeros((n, n), dtype=np.int64)
    keep = u != v
    adj[u[keep], v[keep]] = 1
    adj = ((adj + adj.T) > 0).astype(np.int64)
    expect_tri = int(np.trace(adj @ adj @ adj) // 6)
    expect_edges = int(adj.sum() // 2)

    tbl = pa.table({"src": pa.array(u, pa.int64()),
                    "dst": pa.array(v, pa.int64())})
    out = triangle_count(ray.data.from_arrow(tbl).repartition(5),
                         nbuckets=7).to_pydict()
    assert out == {"n_triangles": [expect_tri],
                   "n_edges": [expect_edges]}


def _bfs_reference(n, pairs, sources):
    """Dict-based reference BFS over an undirected graph."""
    from collections import deque
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                dq.append(w)
    return dist


def test_bfs_hops_known_graphs(ray_session):
    import ray

    from geobuf_ray.functions.graph import bfs_hops

    # path 0-1-2-...-9, source 0: dist == node id
    tbl = pa.table({"src": pa.array(np.arange(9), pa.int64()),
                    "dst": pa.array(np.arange(1, 10), pa.int64())})
    out = bfs_hops(ray.data.from_arrow(tbl).repartition(3), [0],
                   nbuckets=4).to_pydict()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {i: i for i in range(10)}
    # multi-source from both ends meets in the middle
    out = bfs_hops(ray.data.from_arrow(tbl).repartition(3), [0, 9],
                   nbuckets=4).to_pydict()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {i: min(i, 9 - i) for i in range(10)}
    # isolated source appears at dist 0; unreachable nodes absent
    out = bfs_hops(ray.data.from_arrow(tbl).repartition(3), [555],
                   nbuckets=4).to_pydict()
    assert dict(zip(out["node"], out["dist"])) == {555: 0}


def test_bfs_hops_random_vs_reference(ray_session):
    import ray

    from geobuf_ray.functions.graph import bfs_hops

    rng = np.random.default_rng(17)
    n, m = 120, 260
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    sources = [3, 77]
    expect = _bfs_reference(n, zip(u.tolist(), v.tolist()), sources)
    tbl = pa.table({"src": pa.array(u), "dst": pa.array(v)})
    out = bfs_hops(ray.data.from_arrow(tbl).repartition(5), sources,
                   nbuckets=6).to_pydict()
    assert dict(zip(out["node"], out["dist"])) == expect


def test_cc_local_and_distributed_regimes_agree(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.functions.graph import connected_components

    rng = np.random.default_rng(13)
    n = 3000
    e = rng.integers(0, 400, (n, 2)).astype(np.int64)
    tbl = pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    ds = ray.data.from_arrow(tbl).repartition(4)
    local = connected_components(ds, nbuckets=4)          # small regime
    dist = connected_components(ds, nbuckets=4,
                                local_threshold=0)        # forced shuffle
    key = [("node", "ascending")]
    assert local.sort_by(key).equals(dist.sort_by(key))


def test_weighted_sssp_vs_dijkstra(ray_session):
    import heapq

    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.functions.graph import weighted_sssp

    rng = np.random.default_rng(83)
    n_nodes, n_edges = 300, 1500
    u = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    v = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    w = rng.integers(1, 100, n_edges).astype(np.int64)
    sources = [0, 17]

    # scalar Dijkstra reference (undirected)
    adj = {}
    for a, b, ww in zip(u, v, w):
        adj.setdefault(int(a), []).append((int(b), int(ww)))
        adj.setdefault(int(b), []).append((int(a), int(ww)))
    want = {}
    pq = [(0, s) for s in sources]
    for _, s in pq:
        want[s] = 0
    heapq.heapify(pq)
    while pq:
        d, x = heapq.heappop(pq)
        if d > want.get(x, 1 << 62):
            continue
        for y, ww in adj.get(x, []):
            nd = d + ww
            if nd < want.get(y, 1 << 62):
                want[y] = nd
                heapq.heappush(pq, (nd, y))

    tbl = pa.table({"src": pa.array(u), "dst": pa.array(v),
                    "w": pa.array(w)})
    prev = None
    for nparts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = weighted_sssp(ds, sources, nbuckets=8)
        got = dict(zip(out["node"].to_pylist(), out["dist"].to_pylist()))
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_weighted_sssp_negative_raises(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray

    from geobuf_ray.functions.graph import weighted_sssp

    tbl = pa.table({"src": pa.array([0], pa.int64()),
                    "dst": pa.array([1], pa.int64()),
                    "w": pa.array([-3], pa.int64())})
    with pytest.raises(Exception):
        weighted_sssp(ray.data.from_arrow(tbl), [0], nbuckets=2)


def _kcore_oracle(edges, k):
    """Scalar peeling reference: iterate full-degree recomputation."""
    adj = {}
    for a, b in set(map(tuple, (sorted(e) for e in edges))):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


def test_kcore_vs_scalar_peeling(ray_session):
    import ray

    from geobuf_ray.functions.graph import kcore

    rng = np.random.default_rng(7)
    # planted K8 clique (7-core) + random sparse noise + path tails
    clique = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    noise = [(int(a), int(b)) for a, b in
             rng.integers(0, 300, size=(600, 2)) if a != b]
    tails = [(i, i + 1) for i in range(300, 340)]
    edges = clique + noise + tails
    # duplicate + reverse some edges: multi-edges must count once
    edges += [(b, a) for a, b in edges[::3]]
    tbl = pa.table({"src": pa.array([a for a, b in edges], pa.int64()),
                    "dst": pa.array([b for a, b in edges], pa.int64())})
    for k in (3, 7):
        got = {int(r["node"]): int(r["deg"])
               for r in kcore(ray.data.from_arrow(tbl).repartition(6),
                              k, nbuckets=8).to_pylist()}
        assert got == _kcore_oracle(edges, k), k


def test_kcore_rejects_wide_ids(ray_session):
    import pytest
    import ray

    from geobuf_ray.functions.graph import kcore

    tbl = pa.table({"src": pa.array([1 << 40], pa.int64()),
                    "dst": pa.array([1], pa.int64())})
    with pytest.raises((ValueError, Exception)):
        kcore(ray.data.from_arrow(tbl), 1, nbuckets=2).to_pylist()


def _walk_oracle(edges, starts, nsteps,
                 consts=(2654435761, 97, 40503, 2147483647)):
    """Scalar replay of the pinned-score walk (floored mod)."""
    A, B, C, M = consts
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    rows = []
    for s in sorted(set(starts)):
        cur = s
        rows.append((s, 0, s))
        for t in range(1, nsteps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda v: ((cur * A + t * B + v * C)
                                           % M, v))
            rows.append((s, t, cur))
    return rows


def test_random_walks_scalar_reference(ray_session):
    import random

    import ray

    from geobuf_ray.functions.graph import random_walks

    rng = random.Random(11)
    nodes = list(range(-20, 60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)]
    tbl = pa.table({"src": pa.array([a for a, b in edges], pa.int64()),
                    "dst": pa.array([b for a, b in edges], pa.int64())})
    starts = [n for n in nodes if n % 3 == 0]
    got = random_walks(ray.data.from_arrow(tbl).repartition(5), starts,
                       6, directed=True, nbuckets=8)
    rows = list(zip(got["start"].to_pylist(), got["step"].to_pylist(),
                    got["node"].to_pylist()))
    assert rows == _walk_oracle(edges, starts, 6)


def test_random_walks_dead_end_stops(ray_session):
    import ray

    from geobuf_ray.functions.graph import random_walks

    # 1 -> 2 -> 3, 3 has no out-edge: walk of length 5 stops at step 2
    tbl = pa.table({"src": pa.array([1, 2], pa.int64()),
                    "dst": pa.array([2, 3], pa.int64())})
    got = random_walks(ray.data.from_arrow(tbl), [1, 9], 5,
                       directed=True, nbuckets=4)
    rows = list(zip(got["start"].to_pylist(), got["step"].to_pylist(),
                    got["node"].to_pylist()))
    # start 9 has no out-edges at all: only its step-0 row survives
    assert rows == [(1, 0, 1), (1, 1, 2), (1, 2, 3), (9, 0, 9)]


def test_random_walks_partition_invariance(ray_session):
    import random

    import ray

    from geobuf_ray.functions.graph import random_walks

    rng = random.Random(4)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(150)]
    tbl = pa.table({"src": pa.array([a for a, b in edges], pa.int64()),
                    "dst": pa.array([b for a, b in edges], pa.int64())})
    starts = list(range(0, 40, 5))

    def run(parts, nb):
        t = random_walks(ray.data.from_arrow(tbl).repartition(parts),
                         starts, 4, directed=True, nbuckets=nb)
        return list(zip(t["start"].to_pylist(), t["step"].to_pylist(),
                        t["node"].to_pylist()))

    assert run(1, 2) == run(7, 16)


def test_random_walks_rejects_wide_ids(ray_session):
    import pytest
    import ray

    from geobuf_ray.functions.graph import random_walks

    tbl = pa.table({"src": pa.array([1 << 33], pa.int64()),
                    "dst": pa.array([1], pa.int64())})
    with pytest.raises(Exception):
        random_walks(ray.data.from_arrow(tbl), [1 << 33], 2,
                     nbuckets=2)


def test_mst_matches_kruskal(ray_session):
    import ray

    from geobuf_ray.functions.graph import minimum_spanning_forest

    rng = np.random.default_rng(7)
    n, m = 60, 400
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = u[keep], v[keep]
    # distinct weights via the edge index tiebreak
    w = rng.integers(0, 50, len(u)) * 1024 + np.arange(len(u))
    edges = pa.table({"src": pa.array(u, pa.int64()),
                      "dst": pa.array(v, pa.int64()),
                      "w": pa.array(w, pa.int64())})
    out = minimum_spanning_forest(
        ray.data.from_arrow(edges).repartition(5)).to_pandas()

    # scalar Kruskal
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, cnt = 0, 0
    for i in np.argsort(w):
        ra, rb = find(u[i]), find(v[i])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            total += int(w[i])
            cnt += 1
    assert len(out) == cnt
    assert int(out["w"].sum()) == total
    # forest property: edges == nodes - components
    comps = len({find(x) for x in set(u) | set(v)})
    assert cnt == len(set(u) | set(v)) - comps


def test_mst_parallel_duplicate_edges_no_cycle(ray_session):
    import ray

    from geobuf_ray.functions.graph import minimum_spanning_forest

    # two identical parallel edges between 0-1: exactly ONE enters
    edges = pa.table({"src": pa.array([0, 0, 1], pa.int64()),
                      "dst": pa.array([1, 1, 2], pa.int64()),
                      "w": pa.array([5, 5, 7], pa.int64())})
    out = minimum_spanning_forest(ray.data.from_arrow(edges))
    assert out.num_rows == 2
    assert sorted(out["w"].to_pylist()) == [5, 7]


def test_temporal_reachability_scalar_and_strictness(ray_session):
    import ray

    from geobuf_ray.functions.graph import (bfs_hops,
                                            temporal_reachability)

    rng = np.random.default_rng(3)
    m = 300
    u = rng.integers(0, 40, m)
    v = rng.integers(0, 40, m)
    t = rng.integers(0, 50, m)
    keep = u != v
    u, v, t = u[keep], v[keep], t[keep]
    edges = pa.table({"src": pa.array(u, pa.int64()),
                      "dst": pa.array(v, pa.int64()),
                      "t": pa.array(t, pa.int64())})
    out = temporal_reachability(
        ray.data.from_arrow(edges).repartition(4), [0],
        nbuckets=8).to_pandas().set_index("node")["arrival"].to_dict()

    # scalar fixpoint
    arr = {0: 0}
    changed = True
    while changed:
        changed = False
        for uu, vv, tt in zip(u, v, t):
            if uu in arr and tt >= arr[uu] and tt < arr.get(vv, 1 << 60):
                arr[vv] = int(tt)
                changed = True
    assert out == arr

    # the temporal constraint genuinely prunes vs static reachability
    static = bfs_hops(ray.data.from_arrow(edges), [0], directed=True,
                      nbuckets=8)
    assert static.num_rows >= len(out)


def test_scc_local_brute_force_and_distributed(ray_session):
    import pyarrow as pa
    import ray

    from geobuf_ray.functions.graph import (_local_scc,
                                            strongly_connected_components)

    # known structure: two 3-cycles bridged one-way + a tail
    u = np.array([1, 2, 3, 4, 5, 6, 3, 6], dtype=np.int64)
    v = np.array([2, 3, 1, 5, 6, 4, 4, 7], dtype=np.int64)
    got = _local_scc(u, v).to_pandas()
    assert dict(zip(got["node"], got["scc"])) == \
        {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7}

    # random graphs vs boolean transitive-closure brute force
    rng = np.random.RandomState(11)
    for trial in range(3):
        n, m = 40, 90
        eu = rng.randint(0, n, m).astype(np.int64)
        ev = rng.randint(0, n, m).astype(np.int64)
        adj = np.zeros((n, n), bool)
        adj[eu, ev] = True
        reach = adj.copy()
        np.fill_diagonal(reach, True)
        for _ in range(n.bit_length() + 1):
            reach = reach | (reach @ reach)
        mutual = reach & reach.T
        want = {i: int(np.flatnonzero(mutual[i])[0]) for i in range(n)}
        got = _local_scc(eu, ev).to_pandas()
        for node, scc in zip(got["node"], got["scc"]):
            assert scc == want[int(node)], (trial, node)

    # distributed peel == local kernel on a 200-node random graph
    eu = rng.randint(1, 201, 500).astype(np.int64)
    ev = rng.randint(1, 201, 500).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(eu), "dst": pa.array(ev)})) \
        .repartition(4)
    dist = strongly_connected_components(
        ds, local_threshold=0, nbuckets=8).to_pandas()
    loc = _local_scc(eu, ev).to_pandas()
    m2 = loc.merge(dist, on="node", suffixes=("_l", "_d"))
    assert len(m2) == len(loc)
    assert (m2["scc_l"] == m2["scc_d"]).all()


def test_all_pairs_hops_brute_force(ray_session):
    """all_pairs_hops vs a per-source scalar BFS replay on a random
    directed graph with a disconnected island and an isolated
    source."""
    from collections import deque

    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.functions.graph import all_pairs_hops

    rng = np.random.RandomState(13)
    n_nodes = 40
    a = rng.randint(0, n_nodes, 120)
    b = rng.randint(0, n_nodes, 120)
    # island 100..102 and isolated source 200
    a = np.concatenate([a, [100, 101]])
    b = np.concatenate([b, [101, 102]])
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(a, pa.int64()),
        "dst": pa.array(b, pa.int64())})).repartition(3)
    sources = np.concatenate([np.arange(n_nodes), [100, 200]])

    out = collect_table(all_pairs_hops(edges, sources, directed=True,
                                       batch_sources=7))
    got = {r["node"]: (r["farness"], r["n_reached"])
           for r in out.to_pylist()}
    assert len(got) == len(sources)

    adj = {}
    for x, y in zip(a, b):
        adj.setdefault(int(x), set()).add(int(y))
    for s in sources:
        dist = {int(s): 0}
        dq = deque([int(s)])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        assert got[int(s)] == (sum(dist.values()), len(dist)), s
    assert got[200] == (0, 1)


def test_edge_support_and_ktruss_brute_force(ray_session):
    """edge_triangle_support vs a set-intersection replay, and
    ktruss_summary vs a scalar peeling replay, on a random graph plus
    a planted 5-clique (which must survive as the 5-truss) and a star
    (which passes k-core reasoning but must die at k=3)."""
    import itertools

    import ray

    from geobuf_ray.functions.graph import (edge_triangle_support,
                                            ktruss_summary)

    rng = np.random.RandomState(41)
    a = rng.randint(0, 30, 80).astype(np.int64)
    b = rng.randint(0, 30, 80).astype(np.int64)
    clique = np.array(list(itertools.combinations(
        [100, 101, 102, 103, 104], 2)), np.int64)
    star = np.array([(200, x) for x in range(201, 210)], np.int64)
    ea = np.concatenate([a, clique[:, 0], star[:, 0]])
    eb = np.concatenate([b, clique[:, 1], star[:, 1]])
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(ea), "dst": pa.array(eb)})).repartition(3)

    sup = edge_triangle_support(edges)
    nbr = {}
    for x, y in zip(ea, eb):
        if x != y:
            nbr.setdefault(int(x), set()).add(int(y))
            nbr.setdefault(int(y), set()).add(int(x))
    for r in sup.to_pylist():
        assert r["src"] < r["dst"]
        assert r["support"] == len(nbr[r["src"]] & nbr[r["dst"]])

    ks = [3, 4, 5, 6]
    out = {r["k"]: (r["n_edges"], r["n_nodes"])
           for r in ktruss_summary(edges, ks).to_pylist()}

    def peel(k):
        es = {(min(int(x), int(y)), max(int(x), int(y)))
              for x, y in zip(ea, eb) if x != y}
        while True:
            nb = {}
            for x, y in es:
                nb.setdefault(x, set()).add(y)
                nb.setdefault(y, set()).add(x)
            bad = {e for e in es
                   if len(nb[e[0]] & nb[e[1]]) < k - 2}
            if not bad:
                break
            es -= bad
        nodes = {v for e in es for v in e}
        return len(es), len(nodes)

    for k in ks:
        assert out[k] == peel(k), k
    # the planted clique IS the 5-truss core; the star is gone by k=3
    assert out[5][0] >= 10
    s5 = ktruss_summary(ray.data.from_arrow(pa.table({
        "src": pa.array(clique[:, 0]),
        "dst": pa.array(clique[:, 1])})), [5]).to_pylist()[0]
    assert (s5["n_edges"], s5["n_nodes"]) == (10, 5)
    star_only = ktruss_summary(ray.data.from_arrow(pa.table({
        "src": pa.array(star[:, 0]),
        "dst": pa.array(star[:, 1])})), [3]).to_pylist()[0]
    assert star_only["n_edges"] == 0


def test_graph_diameter_columns_brute_force(ray_session):
    """all_pairs_hops' ecc/comp columns vs the scalar BFS replay on
    the random graph with island + isolated node: ecc = max dist,
    comp = min reachable id; the isolated source is its own
    zero-diameter component."""
    from collections import deque

    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.functions.graph import all_pairs_hops

    rng = np.random.RandomState(13)
    a = rng.randint(0, 30, 120)
    b = rng.randint(0, 30, 120)
    a = np.concatenate([a, b, [100, 101]])
    b = np.concatenate([b, a[:120], [101, 100]])
    sources = np.concatenate([np.arange(30), [100, 200]])
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(a, pa.int64()),
        "dst": pa.array(b, pa.int64())})).repartition(3)
    out = collect_table(all_pairs_hops(edges, sources,
                                       directed=True,
                                       batch_sources=7))
    got = {r["node"]: (r["ecc"], r["comp"])
           for r in out.to_pylist()}

    adj = {}
    for x, y in zip(a, b):
        adj.setdefault(int(x), set()).add(int(y))
    for s in sources:
        dist = {int(s): 0}
        dq = deque([int(s)])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        assert got[int(s)] == (max(dist.values()), min(dist)), s
    assert got[200] == (0, 200)


def test_all_pairs_hops_indegree_256(ray_session):
    """A frontier whose in-degree at one node is exactly 256 — the
    uint8-matmul wrap case (256 % 256 == 0 would mark the hub
    unreached): source -> 256 spokes -> hub must give the hub BFS
    distance 2, farness 1*256 + 2, n_reached 258."""
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.functions.graph import all_pairs_hops

    spokes = np.arange(1, 257, dtype=np.int64)
    a = np.concatenate([np.zeros(256, np.int64), spokes])
    b = np.concatenate([spokes, np.full(256, 1000, np.int64)])
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(a), "dst": pa.array(b)}))
    out = collect_table(all_pairs_hops(edges, [0], directed=True))
    row = out.to_pylist()[0]
    assert row["n_reached"] == 258
    assert row["farness"] == 256 * 1 + 2
    assert row["ecc"] == 2


def test_all_pairs_hops_truncation_raises(ray_session):
    """A path longer than max_rounds raises (silent truncation would
    return wrong farness); a path of length exactly max_rounds is
    fine."""
    import pytest
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.functions.graph import all_pairs_hops

    n = 10
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(np.arange(n, dtype=np.int64)),
        "dst": pa.array(np.arange(1, n + 1, dtype=np.int64))}))
    # diameter n == max_rounds: ok
    out = collect_table(all_pairs_hops(edges, [0], directed=True,
                                       max_rounds=n))
    assert out.to_pylist()[0]["ecc"] == n
    # diameter n > max_rounds n-1: raises (surfaced through Ray as a
    # RayTaskError wrapping the ValueError)
    with pytest.raises(Exception, match="max_rounds"):
        collect_table(all_pairs_hops(edges, [0], directed=True,
                                     max_rounds=n - 1))


def test_betweenness_brute_force(ray_session):
    """betweenness_centrality vs a scalar Brandes replay on a random
    directed graph (path counting + dependency accumulation), and the
    undirected halving convention on a path graph (middle of a 3-path
    has bc exactly 1)."""
    from collections import deque

    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.functions.graph import betweenness_centrality

    def scalar_brandes(adj, nodes, directed=True):
        bc = {v: 0.0 for v in nodes}
        for s in nodes:
            sigma = {v: 0.0 for v in nodes}
            dist = {v: -1 for v in nodes}
            sigma[s], dist[s] = 1.0, 0
            order, dq = [], deque([s])
            while dq:
                u = dq.popleft()
                order.append(u)
                for w in adj.get(u, ()):
                    if dist[w] < 0:
                        dist[w] = dist[u] + 1
                        dq.append(w)
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            delta = {v: 0.0 for v in nodes}
            for u in reversed(order):
                for w in adj.get(u, ()):
                    if dist[w] == dist[u] + 1:
                        delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
                if u != s:
                    bc[u] += delta[u]
        if not directed:
            bc = {v: x / 2 for v, x in bc.items()}
        return bc

    rng = np.random.RandomState(17)
    n_nodes = 30
    a = rng.randint(0, n_nodes, 90)
    b = rng.randint(0, n_nodes, 90)
    keep = a != b
    a, b = a[keep], b[keep]
    for directed in (True, False):
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array(a, pa.int64()),
            "dst": pa.array(b, pa.int64())})).repartition(3)
        out = collect_table(betweenness_centrality(
            edges, directed=directed, batch_sources=7))
        node = out["node"].to_numpy(zero_copy_only=False)
        bcv = out["bc"].to_numpy(zero_copy_only=False)
        got = {}
        for nd, v in zip(node, bcv):
            got[int(nd)] = got.get(int(nd), 0.0) + v
        adj = {}
        ea, eb = (np.concatenate([a, b]), np.concatenate([b, a])) \
            if not directed else (a, b)
        for x, y in zip(ea, eb):
            adj.setdefault(int(x), set()).add(int(y))
        nodes = sorted(set(a) | set(b))
        want = scalar_brandes(adj, nodes, directed)
        for v in nodes:
            assert abs(got.get(v, 0.0) - want[v]) < 1e-9, (directed, v)

    # 3-node path, undirected: middle carries exactly the one pair
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64())}))
    out = collect_table(betweenness_centrality(edges, directed=False))
    got = {r["node"]: r["bc"] for r in out.to_pylist()}
    assert abs(got[1] - 1.0) < 1e-12
    assert abs(got.get(0, 0.0)) < 1e-12


def test_max_flow_known_and_random(ray_session):
    """max_flow vs the textbook example and an independent scalar
    Ford-Fulkerson (DFS augmenting) on random capacitated graphs; the
    in-result min-cut certificate must equal the flow every time."""
    import ray

    from geobuf_ray.collect import collect_table
    from geobuf_ray.functions.graph import max_flow

    def run(a, b, c, pairs):
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array(a, pa.int64()),
            "dst": pa.array(b, pa.int64()),
            "cap": pa.array(c, pa.int64())}))
        out = collect_table(max_flow(edges, pairs))
        return {(r["s"], r["t"]): r for r in out.to_pylist()}

    # CLRS-style classic: max flow 0->5 is 23
    a = [0, 0, 1, 1, 2, 2, 3, 4, 4, 3]
    b = [1, 2, 2, 3, 1, 4, 2, 3, 5, 5]
    c = [16, 13, 10, 12, 4, 14, 9, 7, 4, 20]
    got = run(a, b, c, [(0, 5)])
    r = got[(0, 5)]
    assert r["max_flow"] == 23
    assert r["min_cut_capacity"] == 23

    def scalar_maxflow(n, cap, s, t):
        R = [row[:] for row in cap]

        def dfs():
            seen = [False] * n
            stack = [(s, [])]
            seen[s] = True
            while stack:
                u, path = stack.pop()
                if u == t:
                    return path
                for v in range(n):
                    if not seen[v] and R[u][v] > 0:
                        seen[v] = True
                        stack.append((v, path + [(u, v)]))
            return None

        total = 0
        while True:
            p = dfs()
            if p is None:
                return total
            bott = min(R[u][v] for u, v in p)
            for u, v in p:
                R[u][v] -= bott
                R[v][u] += bott
            total += bott

    rng = np.random.RandomState(3)
    for trial in range(4):
        n = 12
        m = 40
        a = rng.randint(0, n, m)
        b = rng.randint(0, n, m)
        keep = a != b
        a, b = a[keep], b[keep]
        c = rng.randint(1, 20, len(a))
        cap = [[0] * n for _ in range(n)]
        for x, y, w in zip(a, b, c):
            cap[int(x)][int(y)] += int(w)
        got = run(a, b, c, [(0, n - 1), (1, n - 2)])
        for (s, t), r in got.items():
            want = scalar_maxflow(n, cap, s, t)
            assert r["max_flow"] == want, (trial, s, t)
            assert r["min_cut_capacity"] == want, (trial, s, t)
