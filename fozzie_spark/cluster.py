"""Transitive clustering: connected components over the thresholded edge
DataFrame via alternating large-star / small-star rounds (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).

The reference emits match PAIRS only — clustering is the north-rule
extension (SURVEY.md §2.7). Converges in O(log n) rounds; every round is
two groupBy shuffles; lineage is cut per round with localCheckpoint so the
plan doesn't grow unboundedly.

Node ids must be orderable (long or string). Output: (node, component)
where component = the minimum node id in the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fingerprint(edges: DataFrame) -> tuple:
    # (count, order-independent hash sum) — enough to detect any edge-set
    # change between rounds (collision odds negligible); one scan, two
    # aggregate expressions
    row = edges.agg(*_fingerprint_aggs())
    return tuple(row.first())


def _fingerprint_aggs() -> list:
    return [
        F.count(F.lit(1)).alias("__fz_n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("__fz_h"),
    ]


def _rm_path(spark, path: str) -> None:
    """Recursively delete a path via the Hadoop FS API (works for any
    supported filesystem, not just local)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _unpersist_ids(spark, ids) -> None:
    """Unpersist persisted RDDs by id (the only handle PySpark exposes for
    blocks pinned by DataFrame.localCheckpoint)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def _local_contract(edges: DataFrame) -> DataFrame:
    """Partition-local union-find pre-contraction (Arrow-batched
    mapInPandas): collapse every connected subgraph that lives inside one
    partition to star edges (node -> local minimum) BEFORE the global
    large-star/small-star rounds.

    Why: the rounds are latency-bound serial job submissions — the clusters
    stage puts a level-independent floor on every run (~21 s at 1M
    entities). Contraction shrinks the edge set to <= one edge per distinct
    node per partition AND collapses long intra-partition min-chains, so
    the alternating rounds start closer to convergence and finish in fewer
    rounds. Pure streaming pass, one dict per partition (bounded by the
    partition's distinct nodes), no shuffle.

    Correctness: contracting edges connected within a partition preserves
    global components — every original edge maps to a path through the
    local root, and every emitted edge is derived from original paths. The
    final component ids (global min per component) are therefore
    bit-identical with or without the pass.

    Node ids may be scalars (long/string) or structs (er_pipeline's 128-bit
    kid): struct cells arrive as field-ordered dicts and are compared as
    value tuples — the same lexicographic order Spark gives the struct.
    """
    schema = edges.schema
    is_struct = hasattr(schema["u"].dataType, "fields")
    fields = [f.name for f in schema["u"].dataType.fields] if is_struct else None

    def contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(pdf["u"], pdf["v"]):
                ka = tuple(a[f] for f in fields) if is_struct else a
                kb = tuple(b[f] for f in fields) if is_struct else b
                if ka not in parent:
                    parent[ka] = ka
                if kb not in parent:
                    parent[kb] = kb
                ra, rb = find(ka), find(kb)
                if ra == rb:
                    continue
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # union by min: root stays the minimum

        out_u, out_v = [], []
        for k in list(parent):
            r = find(k)
            if r != k:
                out_u.append(k)
                out_v.append(r)
        if not out_u:
            return
        if is_struct:
            out_u = [dict(zip(fields, t)) for t in out_u]
            out_v = [dict(zip(fields, t)) for t in out_v]
        yield pd.DataFrame({"u": out_u, "v": out_v})

    return edges.mapInPandas(contract, schema)


def _large_star(edges: DataFrame) -> DataFrame:
    # undirected neighborhoods; connect strictly-larger neighbors to the min
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient each edge (big -> small), group small neighbors under each node
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbr_edges = e.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return nbr_edges.union(self_edges).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
    precontract: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`.

    Edges are undirected; self-loops ignored. Component id = min node id.

    Lineage is cut each `checkpoint_every` rounds. Default: localCheckpoint
    (executor-memory blocks — fast, but NOT tolerant to executor loss).
    Pass `checkpoint_dir` for RELIABLE rounds: each cut writes a parquet
    stage table and re-reads it, so losing an executor mid-round only
    recomputes from the previous round's table instead of the whole edge
    lineage — the right mode on a real cluster / the 100 TB path. Round
    tables are deleted as iterations advance; the LAST round's table backs
    the returned DataFrame and is cleaned up with the checkpoint_dir by the
    caller. (No cross-run resume: a restarted call recomputes from the
    input edges.)
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )
    all_nodes = e.select(F.col("u").alias("node")).union(e.select("v")).distinct()
    if precontract:
        # OFF by default after measurement: the pass pays Python-worker
        # spin-up per partition (~6-10 s on a 256-edge set), is a wash at
        # 5M long-keyed parquet edges (47-66 s both ways), and is HARMFUL
        # on struct-keyed (kid) edge tables — per-row struct<->dict Arrow
        # conversion added ~18-30 s to the 1M-entity clusters stage. The
        # alternating rounds alone are the right default; opt in only for
        # graphs with long intra-partition chains over scalar node ids
        # (components are provably identical either way — pinned in
        # tests/test_pipeline.py).
        e = _local_contract(e)

    from pyspark.sql import Observation

    prev_fp, prev_path, prev_ids = None, None, set()
    for i in range(max_iter):
        e = _small_star(_large_star(e))
        if checkpoint_every and i % checkpoint_every == 0:
            # FUSE the convergence fingerprint into the checkpoint's own
            # materialization action (Observation metrics are collected as
            # a side effect of the write/localCheckpoint job) — the rounds
            # are latency-bound serial job submissions, so one action per
            # round instead of two halves the serial floor the clusters
            # stage puts on every run regardless of parallelism.
            obs = Observation()
            e = e.observe(obs, *_fingerprint_aggs())
            if checkpoint_dir:
                path = f"{checkpoint_dir.rstrip('/')}/cc_round_{i}"
                e.write.mode("overwrite").parquet(path)
                e = e.sparkSession.read.parquet(path)
                if prev_path:  # this round is durable; the one before is dead
                    _rm_path(e.sparkSession, prev_path)
                prev_path = path
            else:
                # localCheckpoint pins executor blocks; free the previous
                # round's as soon as this round is materialized (only the
                # LAST round's blocks back the returned DataFrame — the
                # caller frees those, or ContextCleaner does on GC)
                spark = e.sparkSession
                before = _persistent_ids(spark)
                e = e.localCheckpoint(eager=True)
                _unpersist_ids(spark, prev_ids)
                prev_ids = _persistent_ids(spark) - before
            m = obs.get
            fp = (m["__fz_n"], m["__fz_h"])
        else:
            fp = _fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp

    # converged: star edges point big -> component min
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        all_nodes.join(assign, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )
