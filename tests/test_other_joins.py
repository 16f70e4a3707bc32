"""Difference / distance / interval / regex / temporal join tests, ported
from the reference's test_fozzie_{difference,distance,interval,temporal}_join.R
and test_regex_join.R."""

import datetime as dt

import pytest

from fozzie_spark import (
    difference_join,
    distance_join,
    interval_join,
    regex_join,
    temporal_interval_join,
    temporal_join,
)


def xdf(spark, vals, schema="x double"):
    return spark.createDataFrame([(v,) if not isinstance(v, tuple) else v for v in vals], schema)


# ---- difference join (test_fozzie_difference_join.R) ----------------------


def test_difference_inner(spark):
    df1 = xdf(spark, [1.0, 2.0, 3.0])
    df2 = xdf(spark, [1.05, 2.2, 2.95])
    out = difference_join(df1, df2, by="x", max_distance=0.1)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1.0, 1.05), (3.0, 2.95)]


def test_difference_modes(spark):
    df1 = xdf(spark, [1.0, 2.0, 3.0])
    df2 = xdf(spark, [1.05, 2.1])
    left = difference_join(df1, df2, by="x", how="left", max_distance=0.05)
    assert left.count() == 3
    assert left.filter(left["`x.y`"].isNull()).count() == 2

    anti = difference_join(df1, df2, by="x", how="anti", max_distance=0.05)
    assert sorted(r[0] for r in anti.collect()) == [2.0, 3.0]

    full = difference_join(
        xdf(spark, [1.0, 2.0, 3.1]), xdf(spark, [2.1, 3.0, 4.0]), by="x",
        how="full", max_distance=0.05,
    )
    assert full.count() == 6


def test_difference_distance_col_and_named_by(spark):
    df1 = spark.createDataFrame([(1.0,)], "a double")
    df2 = spark.createDataFrame([(1.05,)], "b double")
    out = difference_join(df1, df2, by={"a": "b"}, max_distance=0.1, distance_col="diff")
    row = out.first()
    assert row["diff"] == pytest.approx(0.05)


def test_difference_multikey(spark):
    df1 = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 100.0)], "x double, y double"
    )
    df2 = spark.createDataFrame(
        [(1.05, 10.1), (2.1, 19.9), (2.95, 30.05), (3.95, 1.0)], "x double, y double"
    )
    inner = difference_join(df1, df2, by={"x": "x", "y": "y"}, max_distance=0.15)
    assert inner.count() == 3
    left = difference_join(df1, df2, by={"x": "x", "y": "y"}, how="left", max_distance=0.15)
    assert left.count() == 4


def test_difference_na_skipped(spark):
    df1 = xdf(spark, [1.0, None, 3.0])
    df2 = xdf(spark, [1.05, 2.0, None])
    out = difference_join(df1, df2, by="x", max_distance=0.1)
    assert [tuple(r) for r in out.collect()] == [(1.0, 1.05)]


# ---- k-D distance join (test_fozzie_distance_join.R, F6) ------------------


def test_distance_join_manhattan_euclidean(spark):
    import itertools
    import math

    l_rows = [(0.0, 0.0), (1.0, 1.0), (5.0, 5.0), (None, 2.0)]
    r_rows = [(0.5, 0.2), (1.4, 1.1), (9.0, 9.0), (2.0, None)]
    df1 = spark.createDataFrame(l_rows, "x double, y double")
    df2 = spark.createDataFrame(r_rows, "x double, y double")

    for method, metric in [
        ("manhattan", lambda a, b: abs(a[0] - b[0]) + abs(a[1] - b[1])),
        ("euclidean", lambda a, b: math.hypot(a[0] - b[0], a[1] - b[1])),
    ]:
        expected = sorted(
            (a[0], a[1], b[0], b[1], round(metric(a, b), 9))
            for a, b in itertools.product(l_rows, r_rows)
            if None not in a and None not in b and metric(a, b) <= 1.0
        )
        out = distance_join(
            df1, df2, by=["x", "y"], method=method, max_distance=1.0, distance_col="d"
        )
        got = sorted(
            (r[0], r[1], r[2], r[3], round(r[4], 9))
            for r in out.select("`x.x`", "`y.x`", "`x.y`", "`y.y`", "d").collect()
        )
        assert got == expected, method


# ---- interval join (test_fozzie_interval_join.R) ---------------------------


def idf(spark, rows, typ="double"):
    return spark.createDataFrame(rows, f"start {typ}, end {typ}")


def test_interval_inner_real(spark):
    df1 = idf(spark, [(1.0, 3.0), (5.0, 7.0), (10.0, 12.0), (30.0, 32.0), (15.0, 25.0)])
    df2 = idf(spark, [(2.0, 4.0), (6.0, 8.0), (11.0, 13.0), (33.0, 35.0), (100.0, 125.0)])
    out = interval_join(df1, df2, by={"start": "start", "end": "end"}, interval_mode="real")
    got = sorted(tuple(r) for r in out.collect())
    # oracle: cross join + start.x<=end.y & start.y<=end.x (lines 5-8)
    expected = sorted(
        (a[0], a[1], b[0], b[1])
        for a in [(1.0, 3.0), (5.0, 7.0), (10.0, 12.0), (30.0, 32.0), (15.0, 25.0)]
        for b in [(2.0, 4.0), (6.0, 8.0), (11.0, 13.0), (33.0, 35.0), (100.0, 125.0)]
        if a[0] <= b[1] and b[0] <= a[1]
    )
    assert got == expected


def test_interval_modes_and_pads(spark):
    df1 = idf(spark, [(1.0, 3.0), (5.0, 7.0), (10.0, 12.0)])
    df2 = idf(spark, [(2.0, 4.0), (6.0, 8.0)])
    left = interval_join(df1, df2, by={"start": "start", "end": "end"}, how="left")
    assert left.count() == 3 and left.filter(left["`start.y`"].isNull()).count() == 1
    anti = interval_join(df1, df2, by={"start": "start", "end": "end"}, how="anti")
    assert [r["start"] for r in anti.collect()] == [10.0]
    full = interval_join(
        df1, idf(spark, [(100.0, 101.0), (101.0, 102.0), (102.0, 103.0)]),
        by={"start": "start", "end": "end"}, how="full",
    )
    assert full.count() == 6


def test_interval_overlap_types(spark):
    # within (lines 53-58)
    out = interval_join(
        idf(spark, [(1.0, 10.0), (5.0, 7.0)]),
        idf(spark, [(2.0, 9.0), (6.0, 6.5)]),
        by={"start": "start", "end": "end"}, overlap_type="within",
    )
    assert out.count() == 1
    # start (60-66)
    out = interval_join(
        idf(spark, [(1.0, 10.0), (5.0, 7.0)]),
        idf(spark, [(1.0, 2.0), (6.0, 8.0)]),
        by={"start": "start", "end": "end"}, overlap_type="start",
    )
    assert out.count() == 1
    # end (68-75)
    out = interval_join(
        idf(spark, [(1.0, 10.0), (5.0, 7.0)]),
        idf(spark, [(9.0, 10.0), (6.0, 7.0)]),
        by={"start": "start", "end": "end"}, overlap_type="end",
    )
    assert out.count() == 2


def test_interval_maxgap_minoverlap(spark):
    out = interval_join(
        idf(spark, [(1.0, 3.0), (5.0, 7.0)]),
        idf(spark, [(10.0, 12.0), (20.0, 22.0)]),
        by={"start": "start", "end": "end"}, maxgap=1,
    )
    assert out.count() == 0
    out = interval_join(
        idf(spark, [(1.0, 3.0), (5.0, 7.0)]),
        idf(spark, [(2.9, 3.1), (6.9, 7.1)]),
        by={"start": "start", "end": "end"}, minoverlap=0.5,
    )
    assert out.count() == 0


def test_interval_integer_mode(spark):
    # inclusive ends + adjacency at maxgap=0 => 3 matches (lines 93-98)
    out = interval_join(
        idf(spark, [(1, 3), (5, 7)], "int"),
        idf(spark, [(2, 4), (6, 8)], "int"),
        by={"start": "start", "end": "end"}, interval_mode="integer", maxgap=0,
    )
    assert out.count() == 3
    # real mode on the same data: only true overlaps
    out = interval_join(
        idf(spark, [(1.0, 3.0), (5.0, 7.0)]),
        idf(spark, [(2.0, 4.0), (6.0, 8.0)]),
        by={"start": "start", "end": "end"}, interval_mode="real",
    )
    assert out.count() == 2


def test_interval_length_skew_stays_linear(spark):
    # one interval 10^4x longer than the rest: the p95-quantile bin width
    # must keep blocking near-linear (the old max-length width collapsed
    # the whole line into one bin -> quadratic candidates)
    from fozzie_spark import blocking
    from fozzie_spark.joins import _interval_bin_width

    n = 2000
    rows = [(float(i * 10), float(i * 10 + 1)) for i in range(n)] + [(0.0, 1e5)]
    l = spark.createDataFrame(rows, "__fz_l0 double, __fz_l1 double")
    r = spark.createDataFrame(rows, "__fz_r0 double, __fz_r1 double")
    w = _interval_bin_width(l, r, maxgap=0)
    assert w < 100.0  # p95 of lengths is 1; the max (1e5) must not dominate
    n_cand = blocking.interval_bin_candidates(
        l, r, ("__fz_l0", "__fz_l1"), ("__fz_r0", "__fz_r1"), 0.0, w
    ).count()
    assert n_cand < 100_000  # naive max-width blocking gives ~n^2 = 4M

    out = interval_join(
        idf(spark, rows), idf(spark, rows), by={"start": "start", "end": "end"},
        interval_mode="real",
    )
    # self-overlaps (n+1) + long covers every short (2n directional pairs)
    assert out.count() == (n + 1) + 2 * n


def test_interval_named_by_and_auto(spark):
    df1 = spark.createDataFrame([(1.0, 3.0), (5.0, 7.0)], "a double, b double")
    df2 = spark.createDataFrame([(2.0, 4.0), (6.0, 8.0)], "c double, d double")
    out = interval_join(df1, df2, by={"a": "c", "b": "d"})
    assert out.count() == 2


# ---- regex join (test_regex_join.R) ----------------------------------------


def test_regex_join(spark):
    df1 = spark.createDataFrame([("apple",), ("banana",), ("cherry",), ("melon",)], "name string")
    df2 = spark.createDataFrame([("^a",), ("an",), ("rry$",)], "pattern string")
    inner = regex_join(df1, df2, by={"name": "pattern"})
    got = sorted(tuple(r) for r in inner.collect())
    assert got == sorted([("apple", "^a"), ("banana", "an"), ("cherry", "rry$")])

    left = regex_join(df1, df2, by={"name": "pattern"}, how="left")
    assert left.count() == 4
    assert left.filter(left["pattern"].isNotNull()).count() == 3


def test_regex_ignore_case(spark):
    df1 = spark.createDataFrame([("Apple",), ("Banana",), ("Cherry",), ("Melon",)], "name string")
    df2 = spark.createDataFrame([("^a",), ("an",), ("rry$",)], "pattern string")
    assert regex_join(df1, df2, by={"name": "pattern"}).count() == 2  # case-sensitive
    out = regex_join(df1, df2, by={"name": "pattern"}, ignore_case=True)
    assert sorted(r["name"] for r in out.collect()) == ["Apple", "Banana", "Cherry"]


def test_regex_multi_match_and_anchors(spark):
    df1 = spark.createDataFrame([("apple",)], "name string")
    df2 = spark.createDataFrame([("^a",), ("pp",), ("le$",)], "pattern string")
    assert regex_join(df1, df2, by={"name": "pattern"}).count() == 3

    df1 = spark.createDataFrame([("apple pie",), ("pie apple",), ("apple",)], "name string")
    df2 = spark.createDataFrame([("^apple",), ("apple$",)], "pattern string")
    assert regex_join(df1, df2, by={"name": "pattern"}).count() == 4


def test_regex_invalid_pattern_errors(spark):
    df1 = spark.createDataFrame([("apple",)], "name string")
    df2 = spark.createDataFrame([("(",), ("^a",)], "pattern string")
    with pytest.raises(Exception):
        regex_join(df1, df2, by={"name": "pattern"}).collect()


# ---- temporal joins (test_fozzie_temporal_join.R, F9) ----------------------


def test_temporal_seconds(spark):
    t = dt.datetime
    df1 = spark.createDataFrame([(t(2023, 1, 1, 12, 0, 0),), (t(2023, 1, 1, 13, 0, 0),)], "time timestamp")
    df2 = spark.createDataFrame([(t(2023, 1, 1, 12, 0, 5),), (t(2023, 1, 1, 14, 0, 0),)], "time timestamp")
    out = temporal_join(df1, df2, by="time", max_distance=10, unit="seconds")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["time.x"] == t(2023, 1, 1, 12, 0, 0)
    assert rows[0]["time.y"] == t(2023, 1, 1, 12, 0, 5)


def test_temporal_dates(spark):
    d = dt.date
    df1 = spark.createDataFrame([(d(2023, 1, 1),), (d(2023, 1, 4),), (d(2023, 1, 7),)], "date date")
    df2 = spark.createDataFrame([(d(2023, 1, 2),), (d(2023, 1, 5),), (d(2023, 1, 8),)], "date date")
    out = temporal_join(df1, df2, by="date", max_distance=1, unit="days", distance_col="d")
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["d"] == 1.0 for r in rows)
    with pytest.raises(ValueError):
        temporal_join(df1, df2, by="date", max_distance=1, unit="hours")


def test_temporal_mixed_types_error(spark):
    df1 = spark.createDataFrame([(dt.date(2023, 1, 1),)], "t date")
    df2 = spark.createDataFrame([(dt.datetime(2023, 1, 1),)], "t timestamp")
    with pytest.raises(TypeError):
        temporal_join(df1, df2, by="t", max_distance=1)


# ---- temporal interval join (test_fozzie_temporal_interval_join.R) ---------


def test_temporal_interval_join(spark):
    t = dt.datetime
    df1 = spark.createDataFrame(
        [(t(2023, 1, 1, 12, 0, 0), t(2023, 1, 1, 13, 0, 0))], "start timestamp, end timestamp"
    )
    df2 = spark.createDataFrame(
        [(t(2023, 1, 1, 12, 30, 0), t(2023, 1, 1, 14, 0, 0)),
         (t(2023, 1, 1, 13, 0, 30), t(2023, 1, 1, 15, 0, 0))],
        "start timestamp, end timestamp",
    )
    # overlap with first; second is 30s past the end
    out = temporal_interval_join(df1, df2, by={"start": "start", "end": "end"}, unit="seconds")
    assert out.count() == 1
    # a 60s maxgap pulls in the second interval
    out = temporal_interval_join(
        df1, df2, by={"start": "start", "end": "end"}, maxgap=60, unit="seconds"
    )
    assert out.count() == 2
    # output keeps original timestamp columns only
    assert set(out.columns) == {"start.x", "end.x", "start.y", "end.y"}


# ---- interval validation (interval/real.rs:47-63) ---------------------------


def test_interval_invalid_raises(spark):
    good = spark.createDataFrame([(1.0, 2.0)], "s double, e double")
    bad = spark.createDataFrame([(5.0, 3.0)], "s double, e double")
    # raises on the first action (the bin-width stats job runs eagerly
    # inside interval_join, so construction itself already trips it)
    with pytest.raises(Exception, match="start > end"):
        interval_join(good, bad, by=["s", "e"], interval_mode="real").collect()
    # opt-out matches the old permissive behavior
    out2 = interval_join(good, bad, by=["s", "e"], interval_mode="real", validate=False)
    out2.collect()
