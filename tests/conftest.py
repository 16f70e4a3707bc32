import datetime as dt

import pytest
from pyspark.sql import Row, SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("fozzie-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def test_df(spark):
    """F1 fixture — reference data-raw/test_data.R:1-22 (baby names +
    typed carried columns incl. NULLs)."""
    names = [
        "Liam", "Noah", "Oliver", "Theodore", "James",
        "Olivia", "Emma", "Amelia", "Charlotte", "Mia",
    ]
    rows = []
    for i, n in enumerate(names):
        rows.append(
            Row(
                Name=n,
                int_col=None if i == 6 else i + 1,
                real_col=None if i == 7 else float(i + 1),
                logical_col=[True, True, True, True, None, True, True, False, False, False][i],
                date_col=dt.date(2020, 1, 1) + dt.timedelta(days=i),
                factor_col="AABBCCDDEE"[i],
            )
        )
    return spark.createDataFrame(
        rows,
        "Name string, int_col int, real_col double, logical_col boolean, "
        "date_col date, factor_col string",
    )


@pytest.fixture(scope="session")
def whoops(spark):
    """F2 fixture — misspelled probe names incl. NULL
    (test_fozzie_string_inner_join.R:1-15)."""
    vals = [
        "Laim", "No, ahhh", "Olive", "Jams", "A-A-ron",
        "Luças", "Oliv HEE-YAH", "Emma", "Smelia", None, "Ada",
    ]
    return spark.createDataFrame([(v,) for v in vals], "Name string")
