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

INF = float("inf")

#: methods whose exact fozziejoin distance is expressible as a pure JVM
#: column (whole-stage codegen — no Python workers in the scoring stage)
JVM_METHODS = frozenset(["levenshtein", "lv", "hamming", "qgram", "cosine", "jaccard"])


def jvm_distance_col(method: str, lc: str, rc: str, max_distance: float, q: int = 2):
    """JVM Column computing the exact distance for `method`, or None when the
    method needs the Python scorer (osa/dl/lcs/jaro/jw/soundex).

    Semantics are IDENTICAL to the fozzie_spark.distances scorers (which stay
    as the unit-test oracle): null on either side => +inf; lv beyond the
    integer cutoff => +inf; profile distances use the same integer-exact
    accumulation (long sums), so float results are bit-identical.
    """
    from fozzie_spark.blocking import qgrams_col

    l, r = F.col(lc), F.col(rc)
    null_inf = lambda d: F.when(l.isNull() | r.isNull(), F.lit(INF)).otherwise(d)  # noqa: E731

    if method in ("levenshtein", "lv"):
        cutoff = int(max_distance)
        lev = F.levenshtein(l, r, cutoff)  # -1 when > cutoff (banded, JVM)
        return null_inf(F.when(lev < 0, F.lit(INF)).otherwise(lev.cast("double")))

    if method == "hamming":
        cutoff = int(max_distance)
        diff = F.size(
            F.filter(
                F.sequence(F.lit(1), F.length(l)),
                lambda i: F.substring(l, i, F.lit(1)) != F.substring(r, i, F.lit(1)),
            )
        ).cast("double")
        d = F.when(F.length(l) != F.length(r), F.lit(INF)).otherwise(
            F.when(diff > cutoff, F.lit(INF)).otherwise(diff)
        )
        return null_inf(d)

    ga, gb = qgrams_col(lc, q), qgrams_col(rc, q)

    def _cnt(arr, g):
        return F.size(F.filter(arr, lambda x: x == g)).cast("long")

    if method == "jaccard":
        sa, sb = F.array_distinct(ga), F.array_distinct(gb)
        inter = F.size(F.array_intersect(sa, sb))
        union = F.size(sa) + F.size(sb) - inter
        d = F.when((F.size(sa) == 0) & (F.size(sb) == 0), F.lit(0.0)).otherwise(
            F.lit(1.0) - inter.cast("double") / union.cast("double")
        )
        return null_inf(d)

    if method == "qgram":
        u = F.array_distinct(F.concat(ga, gb))
        d = F.aggregate(
            u,
            F.lit(0).cast("long"),
            lambda acc, g: acc + F.abs(_cnt(ga, g) - _cnt(gb, g)),
        ).cast("double")
        return null_inf(d)

    if method == "cosine":
        ua, ub = F.array_distinct(ga), F.array_distinct(gb)
        dot = F.aggregate(
            ua, F.lit(0).cast("long"), lambda acc, g: acc + _cnt(ga, g) * _cnt(gb, g)
        )
        s1 = F.aggregate(
            ua, F.lit(0).cast("long"), lambda acc, g: acc + _cnt(ga, g) * _cnt(ga, g)
        )
        s2 = F.aggregate(
            ub, F.lit(0).cast("long"), lambda acc, g: acc + _cnt(gb, g) * _cnt(gb, g)
        )
        d = F.when((F.size(ga) == 0) | (F.size(gb) == 0), F.lit(1.0)).otherwise(
            F.lit(1.0)
            - dot.cast("double") / (F.sqrt(s1.cast("double")) * F.sqrt(s2.cast("double")))
        )
        return null_inf(d)

    return None


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

    JVM-expressible methods (lv/hamming/ngram family) score entirely in
    whole-stage codegen; the Arrow pandas UDF is the path for the DP methods
    Spark has no builtin for (osa/dl/lcs/jaro/jw) and soundex.
    """
    udf = None
    out = pairs
    q = params.get("q", 2)
    for (lc, rc), dc in zip(col_pairs, dist_cols):
        expr = jvm_distance_col(method, lc, rc, max_distance, q=q)
        if expr is None:
            if udf is None:
                udf = string_distance_udf(method, max_distance=max_distance, **params)
            expr = udf(F.col(lc), F.col(rc))
        out = out.withColumn(dc, expr)
        out = out.filter(F.col(dc) <= float(max_distance))
    return out
