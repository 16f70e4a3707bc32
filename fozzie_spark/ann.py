"""Similarity search over embedding columns (array<float>).

- brute-force cosine threshold/top-k: JVM-side dot products via
  F.zip_with + F.aggregate — correct baseline, O(n*m) but fully
  distributed and codegen'd; right answer for re-ranking and small probes.
- LSH (random hyperplane) bucketing: the scale path — signature via one
  vectorized NumPy matmul in a pandas UDF, candidates from equi-joins on
  signature bands, exact cosine verification on candidates only.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

_log = logging.getLogger("fozzie_spark.ann")

#: memoized routing counts keyed by (plan semanticHash, plan sizeInBytes):
#: the size component is the freshness signal — overwriting the same
#: external path in place changes sizeInBytes, so a stale count can no
#: longer flip exact<->LSH routing silently.
_COUNT_CACHE: dict[tuple, int] = {}
_COUNT_CACHE_MAX = 4096


def _plan_row_count(df: DataFrame) -> int | None:
    """Optimizer rowCount statistic when the plan carries one (CBO /
    analyzed tables / LocalRelation) — the only row-CONFIDENT signal that
    costs no job at all."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(rc.get().longValue())
    except Exception:
        pass
    return None


def _vec_row_bytes(df: DataFrame, vec_col: str) -> tuple[int | None, bool]:
    """Schema-derived bytes/row for an embedding frame: vector payload
    (dim x element width — dim probed from ONE non-null row, a
    single-partition job, orders cheaper than the count it replaces) plus
    id/overhead pad. Returns (row_bytes, is_empty); is_empty
    short-circuits routing (a side with no non-null vectors produces no
    pairs under any strategy, so it never exceeds any threshold)."""
    from pyspark.sql.types import ArrayType, FloatType

    try:
        r = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    except Exception:
        return None, False
    if r is None:
        return None, True
    elem = 8
    try:
        t = df.schema[vec_col].dataType
        if isinstance(t, ArrayType) and isinstance(t.elementType, FloatType):
            elem = 4
    except Exception:
        pass
    return len(r[0]) * elem + 16, False


def _exceeds_rows(df: DataFrame, threshold: int, row_bytes: int | None = None) -> bool:
    """True iff `df` has more than `threshold` rows — resolved WITHOUT an
    eager count whenever a row-confident signal settles it: (1) the
    optimizer rowCount statistic when present; (2) est_rows = sizeInBytes /
    `row_bytes` for confident extremes (>4x / <1/4 of the threshold), but
    ONLY when the caller supplied a schema-derived `row_bytes` — a generic
    bytes/row guess misroutes wide rows (256+-dim float64 embeddings) to
    approximate LSH, a silent results change. Gray-zone and unknown-stats
    plans pay a count job, memoized per (plan, sizeInBytes)."""
    from fozzie_spark.blocking import _plan_size_bytes

    rows = _plan_row_count(df)
    if rows is not None:
        _log.info("_exceeds_rows: plan rowCount=%d vs threshold=%d", rows, threshold)
        return rows > threshold
    sz = _plan_size_bytes(df)
    if row_bytes and sz is not None and threshold > 0:
        est = sz / row_bytes
        if est > 4.0 * threshold or est < threshold / 4.0:
            _log.info(
                "_exceeds_rows: plan sizeInBytes=%d / row_bytes=%d -> est_rows=%.0f "
                "vs threshold=%d (confident)", sz, row_bytes, est, threshold,
            )
            return est > threshold
    try:
        key = (df.semanticHash(), sz)
    except Exception:
        key = None
    if key is not None and key in _COUNT_CACHE:
        n = _COUNT_CACHE[key]
    else:
        n = df.count()
        if key is not None:
            if len(_COUNT_CACHE) >= _COUNT_CACHE_MAX:
                _COUNT_CACHE.clear()
            _COUNT_CACHE[key] = n
    _log.info("_exceeds_rows: counted rows=%d vs threshold=%d", n, threshold)
    return n > threshold


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cosine_from_norms(a, b, na, nb):
    """cosine with the per-row norms precomputed ONCE per side instead of
    once per PAIR: `cosine_similarity_col` re-evaluates both norm
    aggregations for every joined row, tripling the higher-order-function
    work of a quadratic scoring join. Same expressions, same evaluation
    order — results are bit-identical (guide §2.3: don't compute per pair
    what is a per-row property)."""
    return _dot(a, b) / (na * nb)


def _spread_small(df: DataFrame, max_bytes: int = 1 << 30) -> DataFrame:
    """Round-robin repartition a PROVABLY SMALL frame across the cluster's
    cores. The exact scoring paths stream one side of a nested-loop join
    with the side's SCAN partitioning — a small parquet file arrives as
    one partition and pins the whole quadratic compute to a single core
    (measured: the 500-vector exact cosine_pairs bench leg ran 4.7 s on
    one task). Only fires when optimizer plan stats prove the frame small
    (the linear shuffle is then negligible vs the quadratic compute);
    unknown or large stats leave the plan untouched."""
    from fozzie_spark.blocking import _plan_size_bytes

    sz = _plan_size_bytes(df)
    if sz is None or sz > max_bytes:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par)


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.9,
    other: DataFrame | None = None,
    strategy: str = "auto",
    auto_threshold: int = 200_000,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 13,
) -> DataFrame:
    """All pairs (id1 < id2 for self-join) with cosine >= min_cosine.

    strategy:
    - "exact": brute-force all-pairs (the self-join plans a BNLJ) —
      correct baseline, quadratic; right for small/re-rank inputs.
    - "lsh": hyperplane-LSH bucket join + exact cosine verification —
      precision 1.0, recall < 1 (pinned >= 0.95 at min_cosine 0.4 with the
      default 16 planes / 8 bands in tests) — the 100 TB path.
    - "auto" (default): switches to LSH above `auto_threshold` rows — for
      two-table calls, when EITHER side exceeds it — where the exact BNLJ
      becomes a scale-killer; below it, exact. Sizing is plan-stats-first
      (`_exceeds_rows`): inputs whose optimizer statistics are confidently
      above/below the threshold route WITHOUT any job; only gray-zone or
      unknown-stats plans pay a (memoized) count. The routing decision is
      logged (logger "fozzie_spark.ann") so the recall change is visible;
      pass strategy="exact" to opt out.
    """
    if strategy not in ("exact", "lsh", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        rb, empty = _vec_row_bytes(df, vec_col)
        big = (not empty) and _exceeds_rows(df, auto_threshold, row_bytes=rb)
        if not big and other is not None:
            rb2, empty2 = _vec_row_bytes(other, vec_col)
            big = (not empty2) and _exceeds_rows(other, auto_threshold, row_bytes=rb2)
        strategy = "lsh" if big else "exact"
        _log.warning(
            "cosine_pairs auto routed to %s (threshold=%d rows)%s",
            strategy, auto_threshold,
            " — approximate results (recall < 1)" if strategy == "lsh" else "",
        )
    if strategy == "lsh":
        return lsh_cosine_pairs(
            df, id_col, vec_col, min_cosine, n_planes, bands, seed, other=other
        )
    a = _spread_small(
        df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    ).withColumn("__fz_na", _norm(F.col("v1")))
    if other is None:
        b = df.select(
            F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
        ).withColumn("__fz_nb", _norm(F.col("v2")))
        pairs = a.join(b, F.col("id1") < F.col("id2"))
    else:
        b = other.select(
            F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
        ).withColumn("__fz_nb", _norm(F.col("v2")))
        pairs = a.crossJoin(b)
    return (
        pairs.withColumn(
            "cosine",
            _cosine_from_norms(
                F.col("v1"), F.col("v2"), F.col("__fz_na"), F.col("__fz_nb")
            ),
        )
        .where(F.col("cosine") >= min_cosine)
        .select("id1", "id2", "cosine")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    strategy: str = "auto",
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 13,
    dim: int | None = None,
    auto_threshold: int = 10_000,
    multiprobe: bool = True,
) -> DataFrame:
    """Top-k neighbors per query (query_id, neighbor_id, cosine, rank).

    Deterministic tie-break: (cosine desc, neighbor_id asc).

    strategy="exact": brute force — the probe side is usually small, so
    Catalyst broadcasts it and streams the corpus once; exact but O(q x n).
    strategy="lsh": candidates restricted to corpus vectors sharing >= 1
    signature band with the query (equi-join, IVF-style bucket probe), then
    exact cosine + rank over candidates only — approximate; the
    corpus-scale path when the probe set itself is large. With
    `multiprobe` (default on), queries whose buckets yielded fewer than k
    candidates take a second pass probing every band hash at Hamming
    distance 1 (Lv et al., multi-probe LSH, VLDB'07) — the starved-query
    re-probe MITIGATES the silent under-fill of sparse buckets while
    well-filled queries never pay the extra join volume. One distance-1
    pass is no fill guarantee: a query whose entire Hamming-1 ball is
    sparse can still return fewer than k rows (raise bands, or lower
    n_planes/bands ratio, when that matters).
    strategy="auto" (default): sizes the probe side plan-stats-first
    (`_exceeds_rows` — a count job only for gray-zone or unknown-stats
    plans, memoized per plan) and routes to LSH above `auto_threshold`
    probes — a corpus-scale probe set would otherwise silently plan a
    probes x corpus crossJoin. The decision is logged
    (logger "fozzie_spark.ann"); pass strategy="exact" to opt out.
    """
    from pyspark.sql import Window

    if strategy not in ("exact", "lsh", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        rb, empty = _vec_row_bytes(queries, vec_col)
        big = (not empty) and _exceeds_rows(queries, auto_threshold, row_bytes=rb)
        strategy = "lsh" if big else "exact"
        _log.warning(
            "cosine_topk auto routed to %s (probe threshold=%d)%s",
            strategy, auto_threshold,
            " — approximate results (recall < 1)" if strategy == "lsh" else "",
        )

    if strategy == "lsh":
        qs = _banded(lsh_signatures(queries, id_col, vec_col, n_planes, seed, dim=dim),
                     n_planes, bands).select(
            F.col("id").alias("query_id"), F.col("v").alias("qv"), "band", "bh",
            _norm(F.col("v")).alias("__fz_nq"),
        )
        cs = _banded(lsh_signatures(corpus, id_col, vec_col, n_planes, seed, dim=dim),
                     n_planes, bands).select(
            F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "band", "bh",
            _norm(F.col("v")).alias("__fz_nc"),
        )

        def _probe(probes):
            return (
                probes.join(cs, ["band", "bh"])
                .where(F.col("query_id") != F.col("neighbor_id"))
                .select("query_id", "neighbor_id", "qv", "cv", "__fz_nq", "__fz_nc")
                .distinct()
            )

        scored = _probe(qs)
        if multiprobe:
            # starved queries: < k distinct candidates from their exact
            # buckets (including zero — queries absent from the band join).
            # Only they re-probe, at every band hash one bit-flip away.
            r = max(1, n_planes // bands)
            have = scored.groupBy("query_id").agg(F.count(F.lit(1)).alias("__fz_cnt"))
            starved = (
                qs.select("query_id")
                .distinct()
                .join(have, "query_id", "left")
                .where(F.coalesce("__fz_cnt", F.lit(0)) < k)
                .select("query_id")
            )
            flips = qs.join(starved, "query_id").select(
                "query_id",
                "qv",
                "__fz_nq",
                "band",
                F.explode(
                    F.array(*[F.col("bh").bitwiseXOR(F.lit(1 << i)) for i in range(r)])
                ).alias("bh"),
            )
            scored = scored.unionByName(_probe(flips)).distinct()
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("__fz_nq"),
        )
        c = _spread_small(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        ).withColumn("__fz_nc", _norm(F.col("cv")))
        scored = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))

    scored = scored.withColumn(
        "cosine",
        _cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("__fz_nq"), F.col("__fz_nc")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def lsh_signatures(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int = 16, seed: int = 13,
    dim: int | None = None,
) -> DataFrame:
    """(id, sig): sign pattern of `n_planes` random hyperplanes, computed
    with one NumPy matmul per Arrow batch (vectorized pandas UDF).

    `dim` may be None: the hyperplanes are then derived INSIDE the UDF
    from the first Arrow batch's width (deterministic — `_hyperplanes`
    is a pure function of (dim, n_planes, seed), so every task builds the
    same matrix) instead of paying a one-row driver probe job per call."""

    planes0 = _hyperplanes(dim, n_planes, seed) if dim is not None else None
    cache: dict = {}

    @F.pandas_udf(LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        planes = planes0
        if planes is None:
            planes = cache.get(mat.shape[1])
            if planes is None:  # once per task (cache is task-local)
                planes = cache[mat.shape[1]] = _hyperplanes(
                    mat.shape[1], n_planes, seed
                )
        bits = (mat @ planes) > 0  # (batch, n_planes)
        out = np.zeros(len(vecs), dtype=np.int64)
        for b in range(planes.shape[1]):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "sig", sig_udf(F.col("v"))
    )


def _banded(sigs: DataFrame, n_planes: int, bands: int) -> DataFrame:
    """(id, v, band, bh): one row per signature band (the LSH bucket key)."""
    r = max(1, n_planes // bands)
    return sigs.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * r).bitwiseAND(F.lit((1 << r) - 1)).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "v", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 13,
    dim: int | None = None,
    other: DataFrame | None = None,
) -> DataFrame:
    """Approximate near-neighbor pairs: hyperplane-LSH bucket join (equi-join
    per signature band), then EXACT cosine verification of candidates.
    Recall < 1 by design (pinned >= 0.95 at min_cosine 0.4 with 16 planes /
    8 bands in tests/test_ann.py); tune n_planes/bands per threshold.
    Self-join by default (id1 < id2); pass `other` for a two-table join
    (id1 from df, id2 from other, both sides bucketed with the SAME
    hyperplanes so buckets align)."""
    sigs = lsh_signatures(df, id_col, vec_col, n_planes, seed, dim=dim)
    # per-SIDE norms computed before the band join so the verify step reads
    # them as columns — `cosine_similarity_col` would re-aggregate both
    # norms per candidate pair (bit-identical either way)
    banded = _banded(sigs, n_planes, bands).withColumn("__fz_n", _norm(F.col("v")))
    if other is None:
        right, pred = banded, F.col("a.id") < F.col("b.id")
    else:
        right = _banded(
            lsh_signatures(other, id_col, vec_col, n_planes, seed, dim=dim),
            n_planes, bands,
        ).withColumn("__fz_n", _norm(F.col("v")))
        pred = F.lit(True)
    cand = (
        banded.alias("a")
        .join(right.alias("b"), ["band", "bh"])
        .where(pred)
        .select(
            F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
            F.col("a.v").alias("v1"), F.col("b.v").alias("v2"),
            F.col("a.__fz_n").alias("__fz_na"), F.col("b.__fz_n").alias("__fz_nb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "cosine",
            _cosine_from_norms(
                F.col("v1"), F.col("v2"), F.col("__fz_na"), F.col("__fz_nb")
            ),
        )
        .where(F.col("cosine") >= min_cosine)
        .select("id1", "id2", "cosine")
    )


def _kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    seed: int,
    sample_size: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Coarse spherical k-means quantizer for the IVF index, trained on a
    DETERMINISTIC bounded sample: the `sample_size` corpus rows with the
    lowest xxhash64(id) (TakeOrdered — no full sort, no driver blow-up at
    any corpus size), Lloyd iterations in one NumPy process on the driver.
    Returns L2-normalized centroids (n_cells, dim). Deterministic for a
    given (data, seed): ties in assignment break by lowest cell index
    (argmax on exact float64), empty cells keep their previous centroid.
    """
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h", F.col(vec_col).cast("string"))
        .limit(int(sample_size))
        .collect()
    )
    if not rows:  # empty corpus: no quantizer to train (ivf_topk returns empty)
        return np.zeros((0, 0), dtype=np.float64)
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    x = np.where(nrm > 0, x / np.where(nrm == 0, 1.0, nrm), x)
    n_cells = min(int(n_cells), len(x))
    rng = np.random.RandomState(seed)
    c = x[rng.choice(len(x), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_cells):
            m = x[assign == j]
            if len(m):
                v = m.mean(axis=0)
                d = np.linalg.norm(v)
                if d > 0:
                    c[j] = v / d
    return c


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray, n_probe: int = 1
) -> DataFrame:
    """(id, v, cell): each row exploded to its `n_probe` nearest coarse
    cells by cosine (argpartition over one NumPy matmul per Arrow batch).
    n_probe=1 indexes a corpus; n_probe>1 fans a probe set out to the
    cells it must search."""
    from pyspark.sql.types import ArrayType, IntegerType

    c = np.ascontiguousarray(centroids, dtype=np.float64)
    n_probe = min(int(n_probe), len(c))

    @F.pandas_udf(ArrayType(IntegerType()))
    def cells_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = np.where(nrm > 0, mat / np.where(nrm == 0, 1.0, nrm), mat)
        scores = mat @ c.T  # (batch, n_cells)
        if n_probe == 1:
            top = np.argmax(scores, axis=1)[:, None]
        else:
            # argpartition then exact sort of the head: O(cells) per row
            part = np.argpartition(-scores, n_probe - 1, axis=1)[:, :n_probe]
            order = np.argsort(-np.take_along_axis(scores, part, axis=1), axis=1)
            top = np.take_along_axis(part, order, axis=1)
        return pd.Series([row.astype("int32") for row in top])

    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.explode(cells_udf(F.col(vec_col))).alias("cell"),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 13,
    sample_size: int = 4096,
    iters: int = 10,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the bucketed ANN scale path
    alongside `cosine_topk(strategy="lsh")`.

    (1) train a coarse spherical-kmeans quantizer on a deterministic
        bounded corpus sample (driver-side NumPy — the only non-distributed
        step, capped at `sample_size` rows regardless of corpus size);
    (2) assign every corpus vector to its nearest cell — one NumPy matmul
        per Arrow batch, centroids shipped in the UDF closure (n_cells x
        dim doubles, a few KB-MB broadcast, never a shuffle);
    (3) each query probes its `n_probe` nearest cells; candidates come
        from the cell equi-join — the scan is n_probe/n_cells of the
        corpus per query instead of all of it;
    (4) exact cosine + deterministic rank (cosine desc, neighbor_id asc)
        over candidates only.

    Recall < 1 by design (a true neighbor can live in an unprobed cell);
    n_probe == n_cells degenerates to exhaustive search and matches
    `cosine_topk(strategy="exact")` exactly (pinned in tests/test_ann.py).
    Output: (query_id, neighbor_id, cosine, rank).
    """
    from pyspark.sql import Window

    cent = _kmeans_centroids(
        corpus, id_col, vec_col, n_cells, seed, sample_size=sample_size, iters=iters
    )
    if cent.size == 0:  # empty corpus -> trivially empty top-k, typed schema
        from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

        schema = StructType([
            StructField("query_id", queries.schema[id_col].dataType),
            StructField("neighbor_id", corpus.schema[id_col].dataType),
            StructField("cosine", DoubleType()),
            StructField("rank", IntegerType()),
        ])
        return queries.sparkSession.createDataFrame([], schema)
    cs = ivf_assign(corpus, id_col, vec_col, cent, n_probe=1).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "cell",
        _norm(F.col("v")).alias("__fz_nc"),
    )
    qs = ivf_assign(queries, id_col, vec_col, cent, n_probe=n_probe).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "cell",
        _norm(F.col("v")).alias("__fz_nq"),
    )
    scored = (
        qs.join(cs, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv", "__fz_nq", "__fz_nc")
        .distinct()
        .withColumn(
            "cosine",
            _cosine_from_norms(
                F.col("qv"), F.col("cv"), F.col("__fz_nq"), F.col("__fz_nc")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.95,
    strategy: str = "auto",
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-duplicate GROUPING: cosine_pairs edges ->
    connected components -> (id, dup_group, group_size, is_canonical) —
    the same output contract as textops.exact_dedup/near_dedup, over an
    embedding column instead of text. strategy follows cosine_pairs
    ("auto" routes to the LSH-bucketed path above the row threshold;
    "exact" for oracle-exact grouping at any size)."""
    from pyspark.sql import Window

    from fozzie_spark.cluster import connected_components

    pairs = cosine_pairs(
        df, id_col, vec_col, min_cosine=min_cosine, strategy=strategy,
        n_planes=n_planes, bands=bands, seed=seed,
    ).select("id1", "id2")
    cc = connected_components(pairs, "id1", "id2", precontract=False).select(
        F.col("node").alias(id_col), F.col("component").alias("__fz_comp")
    )
    w = Window.partitionBy("dup_group")
    return (
        df.join(cc, id_col, "left")
        .withColumn("dup_group", F.coalesce("__fz_comp", F.col(id_col)))
        .drop("__fz_comp")
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))
    )
