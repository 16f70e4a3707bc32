"""Golden-content tests for left/right joins, ported from
test_fozzie_string_left_join.R / _right_join.R (multi-key distances,
NULL padding — reference pads NaN, we use SQL NULL, documented)."""

import math

import pytest

from fozzie_spark import fuzzy_string_join


@pytest.fixture(scope="module")
def name_pet(spark):
    left = spark.createDataFrame(
        [("Oliver", "Sparky"), ("James", "Spike"), ("Emma", "Fido"), ("Amelia", "Bingo")],
        "Name string, Pet string",
    )
    right = spark.createDataFrame(
        [("Olive", "Sparky"), ("Jams", "Spike"), ("Emma", "Fuselage"), ("Smelia", "Bongo")],
        "Name string, Pet string",
    )
    return left, right


def rows_of(df):
    cols = ["`Name.x`", "`Pet.x`", "`Name.y`", "`Pet.y`", "mydist_Name_Name", "mydist_Pet_Pet"]
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(None if v is None else (round(v, 12) if isinstance(v, float) else v) for v in r))
    return sorted(out, key=lambda t: str(t))


# test_fozzie_string_left_join.R:1-27
def test_left_hamming_basic(spark):
    left = spark.createDataFrame([("Alice", 90.0), ("Bob", 85.0)], "Name string, Score double")
    right = spark.createDataFrame([("Alicia",), ("Rob",), ("Charlie",)], "Name string")
    out = fuzzy_string_join(
        left, right, by={"Name": "Name"}, method="hamming", max_distance=2, how="left"
    )
    got = sorted(tuple(r) for r in out.select("`Name.x`", "Score", "`Name.y`").collect())
    assert got == sorted([("Bob", 85.0, "Rob"), ("Alice", 90.0, None)])


# test_fozzie_string_left_join.R:29-121
CASES = {
    "lv": (1, 2, [
        ("Oliver", "Sparky", "Olive", "Sparky", 1.0, 0.0),
        ("James", "Spike", "Jams", "Spike", 1.0, 0.0),
        ("Amelia", "Bingo", "Smelia", "Bongo", 1.0, 1.0),
        ("Emma", "Fido", None, None, None, None),
    ]),
    "hamming": (1, 2, [
        ("Amelia", "Bingo", "Smelia", "Bongo", 1.0, 1.0),
        ("Oliver", "Sparky", None, None, None, None),
        ("James", "Spike", None, None, None, None),
        ("Emma", "Fido", None, None, None, None),
    ]),
    "osa": (1, 2, [
        ("Oliver", "Sparky", "Olive", "Sparky", 1.0, 0.0),
        ("James", "Spike", "Jams", "Spike", 1.0, 0.0),
        ("Amelia", "Bingo", "Smelia", "Bongo", 1.0, 1.0),
        ("Emma", "Fido", None, None, None, None),
    ]),
    "cosine": (0.9, 2, [
        ("Oliver", "Sparky", "Olive", "Sparky", 0.105572809000084, 0.0),
        ("James", "Spike", "Jams", "Spike", 0.422649730810374, 0.0),
        ("Amelia", "Bingo", "Smelia", "Bongo", 0.2, 0.5),
        ("Emma", "Fido", None, None, None, None),
    ]),
    "jw": (0.5, 2, [
        ("Oliver", "Sparky", "Olive", "Sparky", 0.0555555555555555, 0.0),
        ("James", "Spike", "Jams", "Spike", 0.0666666666666668, 0.0),
        ("Amelia", "Bingo", "Smelia", "Bongo", 0.111111111111111, 0.133333333333333),
        ("Emma", "Fido", None, None, None, None),
    ]),
}


@pytest.mark.parametrize("method", list(CASES))
def test_left_multikey_goldens(name_pet, method):
    left, right = name_pet
    tau, q, expected = CASES[method]
    out = fuzzy_string_join(
        left, right, by={"Name": "Name", "Pet": "Pet"}, method=method, how="left",
        max_distance=tau, q=q, distance_col="mydist",
    )
    got = rows_of(out)
    exp = sorted(
        (tuple(None if v is None else (round(v, 12) if isinstance(v, float) else v) for v in row))
        for row in expected
    )
    exp = sorted(exp, key=lambda t: str(t))
    assert got == exp, method


# test_fozzie_string_right_join.R:29-60 mirror
def test_right_multikey(name_pet):
    left, right = name_pet
    out = fuzzy_string_join(
        left, right, by={"Name": "Name", "Pet": "Pet"}, method="lv", how="right",
        max_distance=1, distance_col="mydist",
    )
    got = rows_of(out)
    assert got == rows_of_expected_right()


def rows_of_expected_right():
    rows = [
        ("Oliver", "Sparky", "Olive", "Sparky", 1.0, 0.0),
        ("James", "Spike", "Jams", "Spike", 1.0, 0.0),
        ("Amelia", "Bingo", "Smelia", "Bongo", 1.0, 1.0),
        (None, None, "Emma", "Fuselage", None, None),
    ]
    return sorted(rows, key=lambda t: str(t))
