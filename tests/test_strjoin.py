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
