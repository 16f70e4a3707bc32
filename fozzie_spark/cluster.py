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
    row = edges.agg(*_fingerprint_aggs(edges.schema))
    return tuple(row.first())[:2]


def _payload_bytes_col(dt, col):
    """Per-row payload bytes of `col` of DataType `dt` — octet-aware for
    variable-width types so the driver-finish gate measures real bytes,
    never row counts (the round-4 broadcast-gate lesson: count-only gates
    break on kilobyte keys)."""
    name = dt.typeName()
    if name in ("string", "binary"):
        return F.coalesce(F.octet_length(col), F.lit(0))
    if hasattr(dt, "fields"):  # struct: sum the fields
        out = F.lit(0)
        for f in dt.fields:
            out = out + _payload_bytes_col(f.dataType, col.getField(f.name))
        return out
    fixed = {"long": 8, "double": 8, "timestamp": 8, "timestamp_ntz": 8,
             "date": 4, "integer": 4, "float": 4, "short": 2, "byte": 1,
             "boolean": 1}
    return F.lit(fixed.get(name, 16))


def _fingerprint_aggs(schema) -> list:
    return [
        F.count(F.lit(1)).alias("__fz_n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("__fz_h"),
        F.sum(
            _payload_bytes_col(schema["u"].dataType, F.col("u"))
            + _payload_bytes_col(schema["v"].dataType, F.col("v"))
        ).alias("__fz_b"),
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


def _np_field_arrays(col, dt):
    """Arrow node column -> (list of numpy field arrays, ok) for the
    vectorized sort path; ok=False routes to the generic Python path.

    Scalars: any fixed-width numpy-comparable dtype (one-element list).
    Structs: one array per field when every field is fixed-width; a
    field-major lexsort then gives exactly Spark's struct ordering.
    Anything else (strings, decimals, nested structs) is handled
    generically with Python-object comparison, which matches Spark's
    ordering too (UTF-8 byte order equals code-point order)."""
    if hasattr(dt, "fields"):
        arrs = []
        for i in range(col.type.num_fields):
            a = col.field(i).to_numpy(zero_copy_only=False)
            if a.dtype.kind not in "iufM":
                return None, False
            arrs.append(a)
        return arrs, True
    a = col.to_numpy(zero_copy_only=False)
    return ([a], True) if a.dtype.kind in "iufM" else (None, False)


def _py_key(val, dt):
    # struct rows arrive as dicts; compare as field-ordered value tuples
    if hasattr(dt, "fields"):
        return tuple(_py_key(val[f.name], f.dataType) for f in dt.fields)
    return val


def _py_val(key, dt):
    if hasattr(dt, "fields"):
        return {f.name: _py_val(k, f.dataType) for f, k in zip(dt.fields, key)}
    return key


def _driver_components(edges: DataFrame):
    """Collect a SMALL edge set once (Arrow) and label its components on
    the driver: dense-encode nodes in sorted order, then converge min-label
    propagation with pointer jumping in numpy (micro-seconds per vector
    pass at millions of edges). Sorted-unique encoding makes index order ==
    node order, so min index == min node id — the same component id the
    alternating rounds converge to.

    Returns (labels, take) where labels[i] is the component's dense index
    for dense node i and take(indices) materializes an Arrow array of the
    original node values."""
    import numpy as np
    import pyarrow as pa

    tbl = edges.toArrow()
    dt = edges.schema["u"].dataType
    u_col = tbl.column("u").combine_chunks()
    v_col = tbl.column("v").combine_chunks()
    n_edges = len(u_col)

    nu, ok_u = _np_field_arrays(u_col, dt)
    nv, ok_v = _np_field_arrays(v_col, dt)
    if ok_u and ok_v:
        fields = [np.concatenate([a, b]) for a, b in zip(nu, nv)]
        if len(fields) == 1:
            uniq_fields, inv = np.unique(fields[0], return_inverse=True)
            uniq_fields = [uniq_fields]
        else:
            # multi-field: one lexsort (primary field last in the key
            # tuple) + boundary scan — ~2-3x faster than np.unique on a
            # structured dtype at millions of rows
            n = len(fields[0])
            order = np.lexsort(tuple(reversed(fields)))
            sorted_fields = [f[order] for f in fields]
            new_grp = np.ones(n, dtype=bool)
            neq = np.zeros(max(n - 1, 0), dtype=bool)
            for sf in sorted_fields:
                neq |= sf[1:] != sf[:-1]
            new_grp[1:] = neq
            gid = np.cumsum(new_grp) - 1
            inv = np.empty(n, dtype=np.int64)
            inv[order] = gid
            uniq_fields = [sf[new_grp] for sf in sorted_fields]
        ue, ve = inv[:n_edges], inv[n_edges:]
        n_nodes = len(uniq_fields[0])

        def take(indices):
            if hasattr(dt, "fields"):
                children = [
                    pa.array(uf[indices], type=u_col.type.field(i).type)
                    for i, uf in enumerate(uniq_fields)
                ]
                return pa.StructArray.from_arrays(
                    children,
                    fields=[u_col.type.field(i) for i in range(u_col.type.num_fields)],
                )
            return pa.array(uniq_fields[0][indices], type=u_col.type)

    else:
        ku = [_py_key(x, dt) for x in u_col.to_pylist()]
        kv = [_py_key(x, dt) for x in v_col.to_pylist()]
        uniq = sorted(set(ku) | set(kv))
        idx = {k: i for i, k in enumerate(uniq)}
        ue = np.fromiter((idx[k] for k in ku), dtype=np.int64, count=n_edges)
        ve = np.fromiter((idx[k] for k in kv), dtype=np.int64, count=n_edges)
        n_nodes = len(uniq)

        def take(indices):
            return pa.array([_py_val(uniq[i], dt) for i in indices], type=u_col.type)

    lab = np.arange(n_nodes, dtype=np.int64)
    while True:
        old = lab.copy()
        m = np.minimum(lab[ue], lab[ve])
        np.minimum.at(lab, ue, m)
        np.minimum.at(lab, ve, m)
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    return lab, take


def _driver_finish(edges: DataFrame) -> DataFrame:
    """Finish a SMALL star-edge set on the driver in one pass.

    The alternating rounds are latency-bound serial job submissions
    (~3 s/round on this box regardless of parallelism) — once a round's
    materialized edge set fits the bytes gate, running more rounds to move
    the last labels is pure serial floor. Returns the CONVERGED star set
    (node -> component min) as a local-relation DataFrame — bit-identical
    to what the remaining rounds would produce, since component id = min
    node either way.

    At 100 TB this never fires: the star-edge count stays ~#nodes, far
    above any sane gate, and the rounds proceed exactly as before.
    """
    import numpy as np
    import pyarrow as pa

    spark = edges.sparkSession
    lab, take = _driver_components(edges)
    nonroot = np.nonzero(lab != np.arange(len(lab), dtype=np.int64))[0]
    out = pa.table({"u": take(nonroot), "v": take(lab[nonroot])})
    return spark.createDataFrame(out)


def _driver_finish_assign(edges: DataFrame) -> DataFrame:
    """PRE-round fast path: when the INPUT edge set is provably tiny by
    optimizer plan stats, skip the rounds, the distinct, and the all-nodes
    join entirely — label the raw (null/self-loop-filtered) edges on the
    driver and return the full (node, component) assignment. Every node
    appears in some edge, so the dense-encoded universe IS all_nodes."""
    import numpy as np
    import pyarrow as pa

    spark = edges.sparkSession
    lab, take = _driver_components(edges)
    allidx = np.arange(len(lab), dtype=np.int64)
    out = pa.table({"node": take(allidx), "component": take(lab)})
    return spark.createDataFrame(out)


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


def driver_finish_budget(spark, cap: int = 512 << 20) -> int:
    """Bound a CC driver-finisher gate by what the session's task-result
    path can actually carry: min(cap, spark.driver.maxResultSize // 2).
    On default configs (maxResultSize=1g) a 512MB gate would collect up to
    512MB of edge payload plus transient copies through the driver —
    aborting the job or OOMing where the round loop was safe; deriving
    from the live conf keeps the finisher a strict optimization on any
    config. maxResultSize=0 (unlimited) keeps `cap`."""
    try:
        mrs = int(
            spark.sparkContext._jsc.sc().conf().getSizeAsBytes(
                "spark.driver.maxResultSize", "1g"
            )
        )
    except Exception:
        mrs = 1 << 30
    if mrs <= 0:
        return cap
    return min(cap, mrs // 2)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
    precontract: bool = False,
    driver_finish_bytes: int | None = 256 << 20,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`.

    Edges are undirected; self-loops ignored. Component id = min node id.

    driver_finish_bytes: the serial-floor killer, two gates, both
    bytes-aware (never row counts — the round-4 broadcast-gate lesson):
    (a) PRE-round — if optimizer plan stats prove the input edge set is
    under driver_finish_bytes/4 (stats track on-disk bytes; the /4 margin
    covers decode expansion), skip the rounds, the distinct, and the
    all-nodes join entirely and label the collected edges on the driver
    (`_driver_finish_assign`); unknown stats (LogicalRDD sentinel) never
    fire it. (b) POST-round — once a round's materialized star-edge set
    weighs in under driver_finish_bytes of exact octet-measured payload
    (fused into the round's Observation), the remaining rounds are
    finished on the driver (`_driver_finish`) instead of paying ~3 s of
    serial job latency per round. Components are bit-identical through
    every path (pinned in tests). 0/None disables both. The gate must stay
    comfortably under spark.driver.maxResultSize (default 1g): the finish
    collects the gated edge set through the driver once. At 100 TB neither
    gate fires (star edges stay ~#nodes) and rounds proceed unchanged.

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
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
    )
    sz = None
    if driver_finish_bytes:
        from fozzie_spark.blocking import _plan_size_bytes

        sz = _plan_size_bytes(raw)
        if sz is not None and sz <= driver_finish_bytes // 4:
            return _driver_finish_assign(raw)
    e = raw.distinct()
    if driver_finish_bytes and sz is None:
        # Unknown plan stats (LogicalRDD / join-product sentinel) mean the
        # edge lineage may be an arbitrarily expensive candidate pipeline
        # (near_dedup's minhash candidate join): the round loop would
        # otherwise execute it at least TWICE — round 0 fuses the distinct
        # into the first star job, and the final all-nodes join scans the
        # raw edges again (measured +11 s on the sf0.1 near_dedup bench).
        # Materialize the distinct edge set ONCE and measure exact payload
        # octets in the same job; when it fits the driver gate, finish the
        # whole assignment on the driver (components bit-identical —
        # distinct does not change the graph) and free the cache before
        # returning. Past the gate the persisted frame backs the rounds
        # and the all-nodes join; its blocks are freed by the caller /
        # ContextCleaner, the same contract as the round checkpoints.
        e = e.persist()
        row = e.agg(*_fingerprint_aggs(e.schema)).first()
        if row[0] and row[2] is not None and row[2] <= driver_finish_bytes:
            out = _driver_finish_assign(e)
            e.unpersist()
            return out
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
            e = e.observe(obs, *_fingerprint_aggs(e.schema))
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
            fp, nbytes = (m["__fz_n"], m["__fz_h"]), m["__fz_b"]
        else:
            row = e.agg(*_fingerprint_aggs(e.schema)).first()
            fp, nbytes = (row[0], row[1]), row[2]
        if fp == prev_fp:
            break
        prev_fp = fp
        if driver_finish_bytes and fp[0] and nbytes is not None and nbytes <= driver_finish_bytes:
            e = _driver_finish(e)
            # the finished frame is a driver-local relation: every round
            # artifact (blocks or stage tables) is now dead
            spark = e.sparkSession
            _unpersist_ids(spark, prev_ids)
            prev_ids = set()
            if prev_path:
                _rm_path(spark, prev_path)
                prev_path = None
            break

    # converged: star edges point big -> component min
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        all_nodes.join(assign, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )
