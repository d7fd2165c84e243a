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


def test_minimizer_overlap_scalar_replay(ray_session):
    """minimizer_overlap_pairs vs a scalar replay on a synthetic
    corpus with a planted shared passage (must pair) and a
    boilerplate sentence in EVERY doc (its grams exceed the
    docs-per-gram cap and must be dropped, so boilerplate alone
    never pairs)."""
    import ray

    from geobuf_ray.functions.dedup import minimizer_overlap_pairs

    rng = np.random.RandomState(31)
    vocab = [f"w{i:03d}" for i in range(400)]
    boiler = "the quick brown fox jumps over the lazy dog again"
    # low-sorting anchors every 8 tokens -> several spaced minima
    shared = ("a0 m1 m2 m3 m4 m5 m6 m7 a1 m8 m9 m10 m11 m12 m13 "
              "m14 a2 m15 m16 m17 a3 m18 m19 m20")
    docs = []
    for d in range(12):
        body = " ".join(rng.choice(vocab, 60))
        txt = f"{boiler} {body}"
        if d in (3, 7):
            txt += " " + shared
        docs.append((d, txt))
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs],
                                       pa.int64()),
                    "text": pa.array([t for _, t in docs])})
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = minimizer_overlap_pairs(ds, min_shared=2, nbuckets=5)
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in out.to_pylist()}

    # scalar replay
    def fingerprints(txt):
        w = txt.split()
        grams = [" ".join(w[i:i+3]) for i in range(len(w) - 2)]
        sel = set()
        for i, g in enumerate(grams):
            lo, hi = max(0, i - 3), min(len(grams), i + 4)
            if g == min(grams[lo:hi]):
                sel.add(g)
        return sel
    fps = {d: fingerprints(t) for d, t in docs}
    from collections import Counter
    holders = Counter(g for s in fps.values() for g in s)
    want = {}
    for a in range(12):
        for b in range(a + 1, 12):
            n = sum(1 for g in fps[a] & fps[b] if holders[g] <= 8)
            if n >= 2:
                want[(a, b)] = n
    assert got == want
    assert (3, 7) in got  # the planted shared passage pairs


def test_minimizer_containment_pairs(ray_session):
    """Containment variant: a SHORT doc fully embedded in a LONG doc
    must report n_shared == its own total (containment 1.0) while
    Jaccard-style symmetric overlap would dilute it."""
    import ray

    from geobuf_ray.functions.dedup import minimizer_containment_pairs

    rng = np.random.RandomState(37)
    vocab = [f"w{i:03d}" for i in range(300)]
    short = ("a0 m1 m2 m3 m4 m5 m6 m7 a1 m8 m9 m10 m11 m12 m13 "
             "m14 a2 m15 m16 m17 a3 m18 m19 m20")
    long_body = " ".join(rng.choice(vocab, 200))
    docs = [(1, short),
            (2, long_body + " " + short + " " +
             " ".join(rng.choice(vocab, 50))),
            (3, " ".join(rng.choice(vocab, 80)))]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs],
                                       pa.int64()),
                    "text": pa.array([t for _, t in docs])})
    out = minimizer_containment_pairs(
        ray.data.from_arrow(tbl).repartition(2), min_shared=2,
        nbuckets=3)
    rows = {(r["doc_a"], r["doc_b"]): r for r in out.to_pylist()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    # every one of the short doc's INTERIOR fingerprints recurs in
    # the long doc; boundary-window selections can differ, so
    # containment is near 1 and strictly dominated by n_a
    assert r["n_shared"] >= r["n_a"] - 2
    assert r["n_a"] < r["n_b"]
    assert r["n_shared"] <= r["n_a"]


def test_minimizer_empty_selection_batches(ray_session):
    """Batches of sub-k-token / empty documents must flow through the
    shared minimizer selection stage as empty tables (the regression
    was a NameError on the empty-selection return path), and mixed
    corpora still pair on their real duplicates."""
    import ray

    from geobuf_ray.functions.dedup import (minimizer_containment_pairs,
                                            minimizer_overlap_pairs)

    short = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["", "one", "two words", "a b"])})
    ds = ray.data.from_arrow(short).repartition(4)
    assert minimizer_overlap_pairs(ds, min_shared=1,
                                   nbuckets=3).num_rows == 0
    assert minimizer_containment_pairs(ds, min_shared=1,
                                       nbuckets=3).num_rows == 0

    # a block of empties alongside a planted duplicate pair
    passage = ("a0 m1 m2 m3 m4 m5 m6 m7 a1 m8 m9 m10 m11 m12 "
               "m13 m14 a2 m15 m16 m17 a3 m18 m19 m20")
    mixed = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["", "x", passage, passage, "", "y z"])})
    ds2 = ray.data.from_arrow(mixed).repartition(6)
    out = minimizer_overlap_pairs(ds2, min_shared=2, nbuckets=3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.to_pylist()}
    assert pairs == {(2, 3)}
