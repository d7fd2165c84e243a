"""Oracles for functions/pack: scalar next-fit reference, oversize
docs, partition invariance, and chunk-span arithmetic."""
import numpy as np
import pyarrow as pa

from geobuf_ray.functions.pack import pack_concat_chunks, pack_greedy


def _make(seed=13, n=400, ngroups=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array([f"s{int(x)}" for x in
                            rng.integers(0, ngroups, n)], pa.string()),
        "n_chars": pa.array(rng.integers(1, 900, n), pa.int64()),
    })


def _scalar_next_fit(ids, lens, budget):
    bins, fills = [], []
    b, fill, members = -1, 0, []
    out = {}
    for i, ln in zip(ids, lens):
        if b < 0 or fill + ln > budget:
            for m in members:
                out[m] = (b, fill)
            b += 1
            fill, members = 0, []
        fill += ln
        members.append(i)
    for m in members:
        out[m] = (b, fill)
    return out


def test_pack_greedy_vs_scalar_and_partitions(ray_session):
    import ray

    tbl = _make()
    a = pack_greedy(ray.data.from_arrow(tbl).repartition(7),
                    budget=2000, nbuckets=5).to_pandas()
    b = pack_greedy(ray.data.from_arrow(tbl).repartition(2),
                    budget=2000, nbuckets=3).to_pandas()
    for out in (a, b):
        df = tbl.to_pandas()
        for src, grp in df.groupby("source"):
            grp = grp.sort_values("doc_id")
            expect = _scalar_next_fit(grp.doc_id.tolist(),
                                      grp.n_chars.tolist(), 2000)
            sub = out[out.source == src]
            got = {r.doc_id: (r.bin_id, r.bin_fill)
                   for r in sub.itertuples()}
            assert got == expect


def test_pack_greedy_oversize_doc(ray_session):
    import ray

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array(["a"] * 3, pa.string()),
        "n_chars": pa.array([10, 500, 10], pa.int64()),
    })
    out = pack_greedy(ray.data.from_arrow(tbl), budget=100,
                      nbuckets=2).to_pandas().sort_values("doc_id")
    # oversize doc 1 gets its own bin with fill > budget
    assert out.bin_id.tolist() == [0, 1, 2]
    assert out.bin_fill.tolist() == [10, 500, 10]


def test_pack_chunks_spans(ray_session):
    import ray

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["a"] * 4, pa.string()),
        "n_chars": pa.array([100, 28, 5, 130], pa.int64()),
    })
    out = pack_concat_chunks(ray.data.from_arrow(tbl).repartition(2),
                             chunk=64, nbuckets=2) \
        .to_pandas().sort_values("doc_id")
    # stream offsets: 0, 100, 128, 133 (chunk=64)
    assert out.start_chunk.tolist() == [0, 1, 2, 2]
    assert out.start_offset.tolist() == [0, 36, 0, 5]
    assert out.end_chunk.tolist() == [1, 1, 2, 4]


def test_chunk_spans_scalar_and_edges(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from geobuf_ray.functions.pack import chunk_spans

    chunk, overlap = 10, 3
    stride = chunk - overlap
    lens = np.array([1, 5, 10, 11, 17, 18, 24, 100], np.int64)
    tbl = pa.table({"doc_id": pa.array(np.arange(len(lens),
                                                 dtype=np.int64)),
                    "n_chars": pa.array(lens)})
    out = chunk_spans(ray.data.from_arrow(tbl).repartition(3),
                      chunk=chunk, overlap=overlap).to_pandas()
    for d, n in enumerate(lens):
        rows = out[out.doc_id == d].sort_values("chunk_idx")
        # scalar reference
        want = []
        j = 0
        while True:
            s = j * stride
            e = min(s + chunk, n)
            want.append((j, s, e))
            if e >= n:
                break
            j += 1
        got = [(int(r.chunk_idx), int(r.c_start), int(r.c_end))
               for r in rows.itertuples(index=False)]
        assert got == want, (n, got, want)
        # coverage: last chunk reaches the end, consecutive overlap
        assert got[-1][2] == n
        for (a, b) in zip(got, got[1:]):
            assert b[1] == a[1] + stride and b[1] < a[2]
