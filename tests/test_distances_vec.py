"""Equivalence tests: the NumPy-vectorized batch kernels (distances_vec)
must be elementwise-identical to the per-pair pure scorers (distances),
which are themselves pinned to brute force in test_distances_properties."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from fozzie_spark import distances as D
from fozzie_spark import distances_vec as V

short = st.text(alphabet="abcde", min_size=0, max_size=10)
batch = st.lists(st.tuples(short, short), min_size=0, max_size=40)
cutoffs = st.sampled_from([0, 1, 2, 3, 10])


def _assert_same(got: np.ndarray, want: np.ndarray, ctx):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if math.isinf(w):
            assert math.isinf(g), ctx
        else:
            assert abs(g - w) < 1e-12, ctx


@settings(max_examples=150, deadline=None)
@given(batch, cutoffs)
def test_lev_osa_lcs_hamming_match_pure(pairs, cut):
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    for m in ("lv", "osa", "lcs", "hamming"):
        got = V.METHODS[m](left, right, max_distance=cut)
        want = D.METHODS[m](left, right, max_distance=cut)
        _assert_same(got, want, (m, cut, pairs))


@settings(max_examples=150, deadline=None)
@given(batch, st.sampled_from([0.2, 0.5, 1.0]),
       st.sampled_from([(0.0, 0), (0.1, 4), (0.25, 2)]))
def test_jw_matches_pure(pairs, cut, pw):
    w, mp = pw
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    got = V.jaro_winkler(left, right, max_distance=cut, prefix_weight=w, max_prefix=mp)
    want = D.jaro_winkler(left, right, max_distance=cut, prefix_weight=w, max_prefix=mp)
    _assert_same(got, want, ("jw", cut, w, mp, pairs))


def test_nulls_and_dups_and_dispatch():
    left = ["abc", None, "abc", "abde", "abc"] * 20
    right = ["abd", "x", None, "abde", "abd"] * 20
    for m in ("lv", "osa", "lcs", "hamming", "jw"):
        got = D.score_batch(m, left, right, max_distance=3)  # >=32 -> vectorized
        want = D.METHODS[m](left, right, max_distance=3)
        _assert_same(got, want, m)
        assert math.isinf(got[1]) and math.isinf(got[2])


def test_long_string_fallback():
    long = "ab" * 600  # > _MAX_VEC_LEN -> pure fallback inside batch()
    got = V.levenshtein([long, "abc"], [long + "x", "abd"], max_distance=2)
    assert got[0] == 1.0 and got[1] == 1.0


@settings(max_examples=150, deadline=None)
@given(batch, st.sampled_from([2, 3, 4]))
def test_ngram_family_matches_pure(pairs, q):
    # the sorted-gram-array NumPy kernels must be BIT-identical to the pure
    # dict scorers (integer-valued float64 arithmetic is exact, same final
    # expression order) — including empty/short strings and dup pairs
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    for m in ("qgram", "cosine", "jaccard"):
        got = getattr(V, m)(left, right, q=q)
        want = D.METHODS[m](left, right, q=q)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g == w, (m, q, g, w)


def test_ngram_vec_nulls_and_unicode():
    left = ["héllo wörld", None, "", "ab", "ααββ", "abcabc"]
    right = ["héllo wörld!", "x", "", None, "ααβγ", "abcabc"]
    for m in ("qgram", "cosine", "jaccard"):
        got = getattr(V, m)(left, right, q=2)
        want = D.METHODS[m](left, right, q=2)
        for g, w in zip(got, want):
            assert (math.isinf(g) and math.isinf(w)) or g == w, (m, g, w)
