"""Join-mode materialization over the match-pair IR.

The IR is a DataFrame of matched DISTINCT key tuples
(__fz_l0..__fz_l{k-1}, __fz_r0.., <distance columns>) — the Spark analog of
the reference's (idx1, idx2, dist) triples (src/rust/src/merge/mod.rs:11-30).
Row expansion happens here by equi-joining rows back on their key values
(valid because null keys never participate in matches).

Semantics mirror merge/{inner,left,right,full,semi,anti}.rs:
- shared column names get suffixes on BOTH sides (default .x/.y, inner.rs:16-45)
- outer modes pad the missing side and the distance column(s) with NULL
  (reference pads distances with NaN; we use SQL NULL — documented deviation)
- anti/semi return df1 rows only, no distance columns (semi.rs, anti.rs)
- the reference's O(n*m) unmatched-complement scan (merge/left.rs:17-19)
  becomes a proper left_anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOW_MODES = ("inner", "left", "right", "full", "semi", "anti")


def _qual(alias: str, col: str):
    return F.col(f"{alias}.`{col}`")


def materialize(
    left: DataFrame,
    right: DataFrame,
    by_pairs: list[tuple[str, str]],
    matches: DataFrame,
    how: str,
    dist_names: list[str],
    suffixes: tuple[str, str] = (".x", ".y"),
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    if how not in HOW_MODES:
        raise ValueError(f"unknown join mode {how!r}; expected one of {HOW_MODES}")

    lcols = [c for c in left.columns if c not in exclude]
    rcols = [c for c in right.columns if c not in exclude]
    sx, sy = suffixes
    lout = {c: (c + sx if c in set(rcols) else c) for c in lcols}
    rout = {c: (c + sy if c in set(lcols) else c) for c in rcols}

    L, R, M = left.alias("__fzL"), right.alias("__fzR"), matches.alias("__fzM")
    lcond = [
        _qual("__fzL", lc) == _qual("__fzM", f"__fz_l{i}") for i, (lc, _) in enumerate(by_pairs)
    ]
    rcond = [
        _qual("__fzR", rc) == _qual("__fzM", f"__fz_r{i}") for i, (_, rc) in enumerate(by_pairs)
    ]

    if how in ("semi", "anti"):
        lkeys = matches.select(
            *[F.col(f"__fz_l{i}").alias(f"__fz_k{i}") for i in range(len(by_pairs))]
        ).distinct()
        cond = [
            _qual("__fzL", lc) == F.col(f"__fz_k{i}") for i, (lc, _) in enumerate(by_pairs)
        ]
        # semi/anti return df1 rows with ORIGINAL names (no right side in
        # the output, so no suffixing — merge/semi.rs, merge/anti.rs)
        mode = "left_semi" if how == "semi" else "left_anti"
        return L.join(lkeys, cond, mode).select(
            *[_qual("__fzL", c).alias(c) for c in lcols]
        )

    inner = (
        L.join(M, lcond)
        .join(R, rcond)
        .select(
            *[_qual("__fzL", c).alias(lout[c]) for c in lcols],
            *[_qual("__fzR", c).alias(rout[c]) for c in rcols],
            *[_qual("__fzM", d) for d in dist_names],
        )
    )
    if how == "inner":
        return inner

    rtypes = dict(zip(right.columns, [f.dataType for f in right.schema.fields]))
    ltypes = dict(zip(left.columns, [f.dataType for f in left.schema.fields]))

    def left_pad() -> DataFrame:
        lkeys = matches.select(
            *[F.col(f"__fz_l{i}").alias(f"__fz_k{i}") for i in range(len(by_pairs))]
        ).distinct()
        cond = [_qual("__fzL", lc) == F.col(f"__fz_k{i}") for i, (lc, _) in enumerate(by_pairs)]
        unmatched = L.join(lkeys, cond, "left_anti")
        return unmatched.select(
            *[_qual("__fzL", c).alias(lout[c]) for c in lcols],
            *[F.lit(None).cast(rtypes[c]).alias(rout[c]) for c in rcols],
            *[F.lit(None).cast("double").alias(d) for d in dist_names],
        )

    def right_pad() -> DataFrame:
        rkeys = matches.select(
            *[F.col(f"__fz_r{i}").alias(f"__fz_k{i}") for i in range(len(by_pairs))]
        ).distinct()
        cond = [_qual("__fzR", rc) == F.col(f"__fz_k{i}") for i, (_, rc) in enumerate(by_pairs)]
        unmatched = R.join(rkeys, cond, "left_anti")
        return unmatched.select(
            *[F.lit(None).cast(ltypes[c]).alias(lout[c]) for c in lcols],
            *[_qual("__fzR", c).alias(rout[c]) for c in rcols],
            *[F.lit(None).cast("double").alias(d) for d in dist_names],
        )

    if how == "left":
        return inner.unionByName(left_pad())
    if how == "right":
        return inner.unionByName(right_pad())
    return inner.unionByName(left_pad()).unionByName(right_pad())  # full
