"""API-surface tests: `by` normalization (port of test_rutils.R),
directional wrappers, natural joins, carried-column typing."""

import datetime as dt

import pytest

import fozzie_spark as fz
from fozzie_spark.util import normalize_by


def test_normalize_by_forms(spark):
    l = spark.createDataFrame([("a", 1)], "Name string, x int")
    r = spark.createDataFrame([("b", 2)], "Name string, y int")
    # NULL => natural join on shared names (rutils.R:22-30)
    assert normalize_by(l, r, None) == [("Name", "Name")]
    # plain string / vector => same name both sides (rutils.R:33-36)
    assert normalize_by(l, r, "Name") == [("Name", "Name")]
    assert normalize_by(l, r, ["Name"]) == [("Name", "Name")]
    # dict / named list => left -> right mapping
    assert normalize_by(l, r, {"x": "y"}) == [("x", "y")]
    # tuples
    assert normalize_by(l, r, [("x", "y"), "Name"]) == [("x", "y"), ("Name", "Name")]
    # invalid columns error (rutils.R:39-46)
    with pytest.raises(ValueError):
        normalize_by(l, r, {"nope": "y"})
    with pytest.raises(ValueError):
        normalize_by(l, r, {"x": "nope"})
    # no shared columns for natural join
    l2 = spark.createDataFrame([(1,)], "a int")
    r2 = spark.createDataFrame([(1,)], "b int")
    with pytest.raises(ValueError):
        normalize_by(l2, r2, None)


def test_natural_join_default(spark, test_df, whoops):
    # by=None: natural join on the shared "Name" column
    out = fz.fuzzy_string_join(test_df, whoops, method="lv", max_distance=1)
    assert out.count() == 4


def test_directional_wrappers(spark, test_df, whoops):
    inner = fz.fuzzy_string_inner_join(test_df, whoops, by="Name", method="lv", max_distance=1)
    assert inner.count() == 4
    anti = fz.fuzzy_string_anti_join(test_df, whoops, by="Name", method="lv", max_distance=1)
    assert anti.count() == 6
    semi = fz.fuzzy_string_semi_join(test_df, whoops, by="Name", method="lv", max_distance=1)
    assert semi.columns == test_df.columns

    d1 = spark.createDataFrame([(1.0,)], "x double")
    d2 = spark.createDataFrame([(1.2,), (9.0,)], "x double")
    assert fz.difference_left_join(d1, d2, by="x", max_distance=0.5).count() == 1
    assert fz.difference_full_join(d1, d2, by="x", max_distance=0.5).count() == 2


def test_carried_column_types(spark, test_df, whoops):
    """F1-style typed columns survive the join untouched (type + value),
    the Spark analog of the reference's attribute preservation
    (merge/mod.rs:34-80, test_fozzie_tibbles.R)."""
    out = fz.fuzzy_string_join(
        test_df, whoops, by="Name", method="lv", how="inner", max_distance=1
    )
    schema = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert schema["int_col"] == "int"
    assert schema["real_col"] == "double"
    assert schema["logical_col"] == "boolean"
    assert schema["date_col"] == "date"
    row = out.where(out["`Name.x`"] == "Oliver").first()
    assert row["date_col"] == dt.date(2020, 1, 3)
    assert row["factor_col"] == "B"


def _persistent_rdd_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_no_cache_left_behind(spark, tmp_path):
    # join calls must not leak cached blocks into a long-lived session
    from fozzie_spark.blocking import sorted_neighborhood_candidates
    from fozzie_spark.pipeline import er_pipeline
    from fozzie_spark.synth import synth_documents

    names = spark.createDataFrame(
        [(f"name {i} token{i % 7}",) for i in range(200)], "name string"
    )
    before = _persistent_rdd_ids(spark)
    fz.fuzzy_string_join(names, names, by="name", method="lv", max_distance=1).count()
    fz.fuzzy_string_join(names, names, by="name", method="soundex").count()
    fz.fuzzy_string_join(
        names, names, by="name", method="jaccard", max_distance=0.4
    ).count()
    sorted_neighborhood_candidates(names, "name", window=5).count()
    er_pipeline(
        spark, synth_documents(spark, 50, seed=7), checkpoint_dir=str(tmp_path),
        resume=False,
    )
    leaked = _persistent_rdd_ids(spark) - before
    assert not leaked, f"cached RDDs leaked: {leaked}"
