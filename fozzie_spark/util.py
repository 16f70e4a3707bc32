"""Shared helpers: join-spec normalization, internal column names."""

from __future__ import annotations

from pyspark.sql import DataFrame

# f64 machine epsilon — the reference's difference-join threshold is
# |x-y| <= max_distance + EPS  (src/rust/src/difference/mod.rs:28)
F64_EPS = 2.220446049250313e-16

LKEY = "__fz_l{}"
RKEY = "__fz_r{}"
DIST = "__fz_d{}"


def normalize_by(left: DataFrame, right: DataFrame, by) -> list[tuple[str, str]]:
    """Resolve a fozziejoin-style ``by`` spec to [(left_col, right_col)].

    Mirrors R/rutils.R:20-49: None => natural join on shared column names;
    list/tuple of names => same name both sides; dict => left->right mapping.
    Invalid columns raise ValueError.
    """
    if by is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        if not shared:
            raise ValueError("no shared columns for natural join; pass `by`")
        pairs = [(c, c) for c in shared]
    elif isinstance(by, dict):
        pairs = list(by.items())
    elif isinstance(by, str):
        pairs = [(by, by)]
    elif isinstance(by, (list, tuple)):
        pairs = []
        for item in by:
            if isinstance(item, str):
                pairs.append((item, item))
            elif isinstance(item, (list, tuple)) and len(item) == 2:
                pairs.append((item[0], item[1]))
            else:
                raise ValueError(f"bad `by` entry: {item!r}")
    else:
        raise ValueError(f"bad `by` spec: {by!r}")

    for lc, rc in pairs:
        if lc not in left.columns:
            raise ValueError(f"column {lc!r} not in left dataframe")
        if rc not in right.columns:
            raise ValueError(f"column {rc!r} not in right dataframe")
    return pairs
