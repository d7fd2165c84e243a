"""Oracles for functions/decontam.decontaminate: planted
contamination vs a brute-force n-gram intersection."""
import numpy as np
import pyarrow as pa

from geobuf_ray.functions.decontam import decontaminate


def _shingles(text: str, n: int = 5) -> set:
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _corpus(seed=11, n_docs=120, eval_k=6):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(n_docs)]
    # plant: doc 7 embeds a 5-gram of eval doc 0; doc 9 embeds TWO
    # distinct 5-grams of eval doc 1; doc 11 repeats the same planted
    # 5-gram twice (n_hits must still count it once)
    ev0 = "alpha beta gamma delta epsilon zeta"
    ev1 = "one two three four five six seven"
    texts[0], texts[1] = ev0, ev1
    texts[7] = texts[7] + " alpha beta gamma delta epsilon"
    texts[9] = "one two three four five six " + texts[9]
    texts[11] = ("alpha beta gamma delta epsilon xx "
                 "alpha beta gamma delta epsilon")
    eval_ids = list(range(eval_k))
    return texts, eval_ids


def test_decontaminate_planted_vs_bruteforce(ray_session):
    import ray

    texts, eval_ids = _corpus()
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    docs = ray.data.from_arrow(tbl).repartition(5)

    def split(want):
        def fn(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = ids < len(eval_ids)
            return b.filter(pa.array(m if want else ~m))
        return fn

    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    ev = docs.map_batches(split(True), batch_format="pyarrow")
    out = decontaminate(corpus, ev, n=5, nbuckets=8,
                        bloom_bits=1 << 16).to_pandas()

    eshing = set().union(*[_shingles(texts[i]) for i in eval_ids])
    expect = {}
    for d in range(len(eval_ids), len(texts)):
        hits = len(_shingles(texts[d]) & eshing)
        if hits:
            expect[d] = hits
    got = dict(zip(out.doc_id, out.n_hits))
    assert got == expect
    assert expect[7] >= 1 and expect[9] >= 2 and expect[11] == 1


def test_decontaminate_short_and_empty_docs(ray_session):
    import ray

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e", "a b", "", "a b c d e f"],
                         pa.string()),
    })
    ds = ray.data.from_arrow(tbl)

    def split(want):
        def fn(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = ids == 0
            return b.filter(pa.array(m if want else ~m))
        return fn

    out = decontaminate(ds.map_batches(split(False),
                                       batch_format="pyarrow"),
                        ds.map_batches(split(True),
                                       batch_format="pyarrow"),
                        n=5, nbuckets=2).to_pandas()
    # only doc 3 shares the 5-gram "a b c d e"; docs 1 (too short)
    # and 2 (empty) produce no shingles and must not appear
    assert dict(zip(out.doc_id, out.n_hits)) == {3: 1}
