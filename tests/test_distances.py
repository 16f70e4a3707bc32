"""Golden tests for the batch scorers, ported from the reference's
tests/testthat/test_fozzie_string_inner_join.R and
test_fozzie_string_soundex_join.R (threshold + distance values)."""

import math

import numpy as np
import pytest

from fozzie_spark import distances as D

TEST_NAMES = [
    "Liam", "Noah", "Oliver", "Theodore", "James",
    "Olivia", "Emma", "Amelia", "Charlotte", "Mia",
]
WHOOPS = [
    "Laim", "No, ahhh", "Olive", "Jams", "A-A-ron",
    "Luças", "Oliv HEE-YAH", "Emma", "Smelia", None, "Ada",
]


def _matches(method, tau, **params):
    """All (left_name, right_name, dist) pairs with dist <= tau."""
    out = []
    for a in TEST_NAMES:
        for b in WHOOPS:
            d = D.score_batch(method, [a], [b], max_distance=tau, **params)[0]
            if d <= tau:
                out.append((a, b, d))
    return sorted(out)


# test_fozzie_string_inner_join.R:26-57
def test_levenshtein_golden():
    got = _matches("lv", 1)
    assert got == sorted([
        ("Oliver", "Olive", 1.0),
        ("James", "Jams", 1.0),
        ("Emma", "Emma", 0.0),
        ("Amelia", "Smelia", 1.0),
    ])


# test_fozzie_string_inner_join.R:249-278
def test_osa_golden():
    got = _matches("osa", 1)
    assert got == sorted([
        ("Liam", "Laim", 1.0),
        ("Oliver", "Olive", 1.0),
        ("James", "Jams", 1.0),
        ("Emma", "Emma", 0.0),
        ("Amelia", "Smelia", 1.0),
    ])


def test_dl_golden():
    # full DL at tau=1 equals OSA at tau=1 (transposition = 1 op)
    got = _matches("dl", 1)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in _matches("osa", 1)]
    # the classic case where DL < OSA
    assert D.damerau_levenshtein(["CA"], ["ABC"], max_distance=2)[0] == 2.0
    assert D.osa(["CA"], ["ABC"], max_distance=3)[0] == 3.0


# test_fozzie_string_inner_join.R:62-92
def test_hamming_golden():
    got = _matches("hamming", 1)
    assert got == sorted([("Emma", "Emma", 0.0), ("Amelia", "Smelia", 1.0)])


# test_fozzie_string_inner_join.R:95-123
def test_lcs_golden():
    got = _matches("lcs", 1)
    assert got == sorted([
        ("Oliver", "Olive", 1.0),
        ("James", "Jams", 1.0),
        ("Emma", "Emma", 0.0),
    ])


# test_fozzie_string_inner_join.R:126-155
def test_qgram_golden():
    got = _matches("qgram", 1, q=2)
    assert got == sorted([("Oliver", "Olive", 1.0), ("Emma", "Emma", 0.0)])


# test_fozzie_string_inner_join.R:158-194 (15-digit goldens)
def test_cosine_golden():
    expected = {
        ("Oliver", "Olive"): 0.133974596215561,
        ("Oliver", "Oliv HEE-YAH"): 0.683772233983162,
        ("James", "Jams"): 0.591751709536137,
        ("Olivia", "Olive"): 0.422649730810374,
        ("Olivia", "Oliv HEE-YAH"): 0.683772233983162,
        ("Emma", "Emma"): 0.0,
        ("Amelia", "Smelia"): 0.25,
    }
    got = _matches("cosine", 0.9, q=3)
    assert {(a, b) for a, b, _ in got} == set(expected)
    for a, b, d in got:
        assert d == pytest.approx(expected[(a, b)], abs=1e-12)


# test_fozzie_string_inner_join.R:197-227
def test_jaccard_golden():
    expected = {
        ("Oliver", "Olive"): 0.25,
        ("Oliver", "Oliv HEE-YAH"): 5 / 6,
        ("James", "Jams"): 0.75,
        ("Olivia", "Olive"): 0.6,
        ("Olivia", "Oliv HEE-YAH"): 5 / 6,
        ("Emma", "Emma"): 0.0,
        ("Amelia", "Smelia"): 0.4,
    }
    got = _matches("jaccard", 0.9, q=3)
    assert {(a, b) for a, b, _ in got} == set(expected)
    for a, b, d in got:
        assert d == pytest.approx(expected[(a, b)], abs=1e-12)


# test_fozzie_string_inner_join.R:231-246
def test_jw_golden():
    got = {(a, b) for a, b, _ in _matches("jw", 0.2)}
    assert got == {
        ("Liam", "Laim"),
        ("Noah", "No, ahhh"),
        ("Oliver", "Olive"),
        ("James", "Jams"),
        ("Olivia", "Olive"),
        ("Emma", "Emma"),
        ("Amelia", "Smelia"),
    }


def test_jw_quirk_prefix_increases_distance():
    # reference formula: d' = d + min(prefix, max_prefix)*w*(1-d)
    base = D.jaro_winkler(["Oliver"], ["Olive"], max_distance=1.0)[0]
    boosted = D.jaro_winkler(
        ["Oliver"], ["Olive"], max_distance=1.0, prefix_weight=0.1, max_prefix=4
    )[0]
    assert boosted == pytest.approx(base + 4 * 0.1 * (1 - base))
    # identical strings short-circuit to 0 regardless of prefix params
    assert D.jaro_winkler(["Emma"], ["Emma"], prefix_weight=0.1, max_prefix=4)[0] == 0.0


# test_fozzie_string_soundex_join.R:24-32 pins
def test_soundex_dual():
    assert D.soundex_na("Smith") == "S530"
    assert D.soundex_na("Tymczak") == "T522"  # NA variant: adjacent same-code collapse
    assert D.soundex_match("Smith", "Smyth")
    assert D.soundex_match("Smith", "Smythe")
    assert D.soundex_match("Ashcraft", "Ashcroft")
    assert D.soundex_match("VanDeusen", "Deusen")  # camel-split prefix
    assert D.soundex_match("De La Cruz", "Cruz")  # multi-token prefix
    assert not D.soundex_match("Smith", "Cruz")
    d = D.soundex_distance(["VanDeusen", "Smith"], ["Deusen", "Cruz"])
    assert d[0] == 0.0 and math.isinf(d[1])


def test_none_never_matches():
    for m in ["lv", "osa", "dl", "hamming", "lcs", "qgram", "cosine", "jaccard", "jw", "soundex"]:
        d = D.score_batch(m, [None, "a", None], ["a", None, None], max_distance=10, q=2)
        assert np.all(np.isinf(d)), m


def test_qgram_short_string_semantics():
    # len < q => empty profile (utils.rs:81-99)
    assert D.qgram_profile("ab", 3) == {}
    # cosine: any empty profile => 1.0 (cosine.rs:33-35)
    assert D.cosine(["ab"], ["abc"], q=3)[0] == 1.0
    # jaccard: both empty => 0.0 (jaccard.rs:87-93); one empty => 1.0
    assert D.jaccard(["ab"], ["xy"], q=3)[0] == 0.0
    assert D.jaccard(["ab"], ["abc"], q=3)[0] == 1.0
    # qgram: distance over empty profiles is 0 / count of the other side
    assert D.qgram(["ab"], ["xy"], q=3)[0] == 0.0
    assert D.qgram(["ab"], ["abc"], q=3)[0] == 1.0


def test_hamming_unequal_lengths_never_match():
    assert math.isinf(D.hamming(["abc"], ["abcd"], max_distance=100)[0])
