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


def test_cdc_chunk_stats_scalar_replay():
    from geobuf_ray.functions.pack import _CDC_BASE, cdc_chunk_stats

    def scalar(s, window=16, mask_bits=6, min_size=8, max_size=64):
        b = s.encode()
        L = len(b)
        if L == 0:
            return (0, 0, 0)
        powers = [np.uint64(1)]
        with np.errstate(over="ignore"):
            for _ in range(window - 1):
                powers.append(np.uint64(powers[-1] * _CDC_BASE))
            naturals = []
            for i in range(window - 1, L - 1):
                h = np.uint64(0)
                for j in range(window):
                    h = np.uint64(h + np.uint64(b[i - j]) * powers[j])
                if int(h) & ((1 << mask_bits) - 1) == 0:
                    naturals.append(i)
        kept, last = [], None
        for p in naturals:
            if last is None or p >= last + min_size:
                kept.append(p)
                last = p
        segs, prev = [], -1
        for c in kept:
            segs.append(c - prev)
            prev = c
        if L - 1 - prev > 0:
            segs.append(L - 1 - prev)
        chunks = []
        for sl in segs:
            nfull, rem = divmod(sl, max_size)
            chunks += [max_size] * nfull + ([rem] if rem else [])
        return (len(chunks), sum(c * c for c in chunks),
                max(chunks) if chunks else 0)

    rng = np.random.default_rng(17)
    texts = ["".join(chr(97 + int(c)) for c in rng.integers(0, 26, int(n)))
             for n in rng.integers(0, 300, 30)] + ["", "x", "ab"]
    nc, sq, mx = cdc_chunk_stats(pa.array(texts, pa.string()),
                                 min_size=8, max_size=64)
    for i, s in enumerate(texts):
        assert (nc[i], sq[i], mx[i]) == scalar(s), (i, len(s))
    # chunks partition the bytes: a doc with no cuts is ONE chunk
    one = cdc_chunk_stats(pa.array(["hello"], pa.string()))
    assert one[0][0] == 1 and one[2][0] == 5


def test_cdc_chunks_stable_under_prefix_insertion():
    from geobuf_ray.functions.pack import cdc_chunk_stats

    rng = np.random.default_rng(23)
    body = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2000))
    a = cdc_chunk_stats(pa.array([body], pa.string()),
                        min_size=16, max_size=256)
    b = cdc_chunk_stats(pa.array(["ZQXJ" + body], pa.string()),
                        min_size=16, max_size=256)
    # content-defined: chunk counts shift by at most a couple at the
    # head, never globally (position-defined chunking would re-cut all)
    assert abs(int(a[0][0]) - int(b[0][0])) <= 2
