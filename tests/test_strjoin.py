"""Oracles for functions/strjoin: bit-parallel Levenshtein vs scalar
DP, and the PassJoin self-join vs brute force / DuckDB."""
import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.functions.strjoin import (edit_distance_self_join,
                                          levenshtein_pairs)


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_levenshtein_pairs_vs_scalar_dp():
    rng = np.random.default_rng(2)
    A, B = [], []
    for _ in range(1500):
        la, lb = rng.integers(0, 22, 2)
        A.append("".join(chr(97 + int(c))
                         for c in rng.integers(0, 4, la)))
        B.append("".join(chr(97 + int(c))
                         for c in rng.integers(0, 4, lb)))
    A += ["x" * 64, "x" * 64, "", "abc"]
    B += ["x" * 63 + "y", "x" * 64, "abc", ""]
    got = levenshtein_pairs(pa.array(A, pa.large_string()),
                            pa.array(B, pa.large_string()))
    exp = [_lev(a, b) for a, b in zip(A, B)]
    assert got.tolist() == exp


def test_levenshtein_rejects_over_64():
    with pytest.raises(ValueError):
        levenshtein_pairs(pa.array(["y" * 65], pa.large_string()),
                          pa.array(["x"], pa.large_string()))


def _self_join_expect(strings, k):
    d = sorted(set(strings))
    out = set()
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            if abs(len(d[i]) - len(d[j])) <= k:
                dd = _lev(d[i], d[j])
                if dd <= k:
                    out.add((d[i], d[j], dd))
    return out


def test_self_join_vs_bruteforce_random(ray_session):
    import ray

    rng = np.random.default_rng(7)
    strings = ["".join(chr(97 + int(c))
                       for c in rng.integers(0, 3, rng.integers(0, 9)))
               for _ in range(400)]
    # includes empty + very short strings (the short-key path) and
    # many duplicates (distinct-stage coverage)
    tbl = pa.table({"s": pa.array(strings, pa.string())})
    out = edit_distance_self_join(
        ray.data.from_arrow(tbl).repartition(5), "s", k=2,
        nbuckets=8).to_pandas()
    got = set(zip(out.s_a, out.s_b, out.dist))
    assert got == _self_join_expect(strings, 2)


def test_self_join_k1_words(ray_session):
    import ray

    words = ["kitten", "sitten", "sitting", "mitten", "bitten",
             "fitted", "kitten", "smitten", "a", "b", "ab", ""]
    tbl = pa.table({"s": pa.array(words, pa.string())})
    out = edit_distance_self_join(ray.data.from_arrow(tbl), "s",
                                  k=1, nbuckets=4).to_pandas()
    got = set(zip(out.s_a, out.s_b, out.dist))
    assert got == _self_join_expect(words, 1)


def _jaccard_brute(docs, t_num, t_den):
    out = {}
    items = [(d, set(txt.split())) for d, txt in docs.items()]
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (da, A), (db, B) = items[i], items[j]
            if not A or not B:
                continue
            inter = len(A & B)
            if inter * t_den >= t_num * len(A | B):
                a, b = (da, db) if da < db else (db, da)
                out[(a, b)] = (inter, len(A) if a == da else len(B),
                               len(B) if a == da else len(A))
    return out


def test_jaccard_set_join_vs_bruteforce(ray_session):
    import ray

    from geobuf_ray.functions.strjoin import jaccard_set_join

    rng = np.random.default_rng(31)
    vocab = [f"t{i}" for i in range(60)]
    docs = {}
    for i in range(120):
        k = rng.integers(3, 25)
        docs[i] = " ".join(rng.choice(vocab, k))
    # plant exact and near duplicates
    docs[200] = docs[5]
    docs[201] = docs[7] + " extraterm"
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string())})
    for thr, tn, td in [(0.5, 1, 2), (0.8, 4, 5)]:
        out = jaccard_set_join(
            ray.data.from_arrow(tbl).repartition(5), threshold=thr,
            nbuckets=4).to_pandas()
        got = {(r.doc_a, r.doc_b): (r.inter, r.size_a, r.size_b)
               for r in out.itertuples()}
        exp = _jaccard_brute(docs, tn, td)
        assert got == exp, thr
        assert (200 in {a for a, _ in got} | {b for _, b in got})


def test_jaccard_set_join_edges(ray_session):
    import ray

    from geobuf_ray.functions.strjoin import jaccard_set_join

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", "a b c", "", "z"], pa.string()),
    })
    out = jaccard_set_join(ray.data.from_arrow(tbl).repartition(2),
                           threshold=1.0, nbuckets=2).to_pandas()
    # only the exact-duplicate pair qualifies; empty docs match nothing
    assert len(out) == 1
    assert (out.iloc[0].doc_a, out.iloc[0].doc_b) == (1, 2)
    assert out.iloc[0].inter == 3


def test_soundex_canonical_vectors():
    from geobuf_ray.functions.text import soundex_batch

    # the published American Soundex test vectors (collapse-across-HW
    # quirk included) + edge cases
    vec = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
           "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
           "Honeyman": "H555", "A": "A000", "Wu": "W000",
           "lloyd": "L300", "gauss": "G200", "hilbert": "H416",
           "heilbronn": "H416", "": "000", "O'Brien": "O165"}
    got = soundex_batch(pa.array(list(vec))).to_pylist()
    assert got == list(vec.values())


def test_soundex_nulls_and_scalar_reference():
    from geobuf_ray.functions.text import soundex_batch

    def scalar(word):
        lut = {}
        for cs, d in [("AEIOUY", "0"), ("BFPV", "1"), ("CGJKQSXZ", "2"),
                      ("DT", "3"), ("L", "4"), ("MN", "5"), ("R", "6")]:
            for ch in cs:
                lut[ch] = d
        u = "".join(c for c in word.upper() if "A" <= c <= "Z")
        if not u:
            return "000"
        body = u[0] + "".join(c for c in u[1:] if c not in "HW")
        coded = "".join(lut.get(c, c) for c in body)
        coll = coded[0]
        for c in coded[1:]:
            if c != coll[-1]:
                coll += c
        digits = coll[1:].replace("0", "")
        return u[0] + (digits + "000")[:3]

    rng = np.random.default_rng(8)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = ["".join(rng.choice(letters, rng.integers(1, 12)))
             for _ in range(500)] + [None, "x", None]
    got = soundex_batch(pa.array(words, pa.string())).to_pylist()
    for w, g in zip(words, got):
        assert g == (None if w is None else scalar(w)), (w, g)


def test_fuzzy_blocking_pipeline_hand_vocab():
    import pyarrow.compute as pc

    from geobuf_ray.functions.strjoin import levenshtein_pairs
    from geobuf_ray.functions.text import soundex_batch

    vocab = ["cold", "old", "bolt", "plate", "hot", "red", "rod",
             "widget", "gizmo"]
    sdx = soundex_batch(pa.array(vocab)).to_pylist()
    blocks = {}
    for w, s in zip(vocab, sdx):
        blocks.setdefault(s[1:], []).append(w)
    pairs = []
    for b, ws in blocks.items():
        ws = sorted(ws)
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                pairs.append((ws[i], ws[j]))
    lev = levenshtein_pairs(pa.array([a for a, _ in pairs]),
                            pa.array([b for _, b in pairs]))
    got = {p for p, d in zip(pairs, lev) if d <= 2}
    assert got == {("cold", "old"), ("bolt", "cold"), ("bolt", "old"),
                   ("hot", "rod"), ("red", "rod")}
    # the verify stage genuinely rejected same-block far pairs
    assert ("hot", "red") in set(pairs) and ("hot", "red") not in got
