"""Vectorized pairwise scoring: Arrow-batched pandas UDFs over candidate
pairs. This is the engine's only Python-side hot path; everything else is
JVM DataFrame ops. Mirrors the reference's `fuzzy_indices` scoring +
`compare_pairs` multi-key refinement (src/rust/src/string/mod.rs:82-179).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

from fozzie_spark import distances


def string_distance_udf(method: str, **params):
    """pandas UDF (left, right) -> double distance; +inf when > cutoff."""

    def _score(left: pd.Series, right: pd.Series) -> pd.Series:
        arr = distances.score_batch(
            method, left.to_numpy(dtype=object), right.to_numpy(dtype=object), **params
        )
        return pd.Series(arr)

    # asNondeterministic stops Catalyst from collapsing the scoring
    # projection into the threshold filter, which would EVALUATE THE UDF
    # TWICE per row (observed as stacked ArrowEvalPython nodes). Scoring is
    # pure, but single evaluation matters more than expression reuse here.
    return F.pandas_udf(_score, DoubleType()).asNondeterministic()


def score_string_pairs(
    pairs: DataFrame,
    col_pairs: list[tuple[str, str]],
    method: str,
    max_distance: float,
    dist_cols: list[str],
    **params,
) -> DataFrame:
    """Score each key pair and keep rows where EVERY key distance passes.

    Multi-key semantics mirror the reference (string/mod.rs:96-113): the
    blocking stage ran on the first key only; every key (including the
    first) is scored with the same method/threshold; a pair survives iff
    all pass. Soundex ignores max_distance (scorer emits 0/inf).
    """
    udf = string_distance_udf(method, max_distance=max_distance, **params)
    out = pairs
    for (lc, rc), dc in zip(col_pairs, dist_cols):
        out = out.withColumn(dc, udf(F.col(lc), F.col(rc)))
        out = out.filter(F.col(dc) <= float(max_distance))
    return out
