"""Structured Streaming operators for document streams.

The reference is batch-only (SURVEY.md §2.7); these are the streaming
counterparts a continuously-ingesting training-data pipeline needs:

- `streaming_exact_dedup`: watermarked drop-duplicates on the content
  fingerprint (state bounded by the watermark window)
- `streaming_enrich`: stateless per-row enrichment (fingerprint, token
  counts, quality, language id) — identical expressions to the batch ops,
  so batch/stream parity is by construction
- `streaming_sessionize` / `sessionize`: CUSTOM stateful sessionization
  via `applyInPandasWithState` (event-time timeouts, per-key open-session
  state) and its batch twin via `applyInPandas` — both share the same
  splitting rule, so batch/stream parity is by construction; the batch
  side is oracle-gated against a DuckDB window-function sessionization.
- `streaming_incremental_match`: foreachBatch incremental linkage — each
  micro-batch is fuzzy-joined against the (broadcastable) canonical entity
  key table and appended with its match; new unmatched keys accumulate in
  the entity table (min-hash of key as entity id). This is the streaming
  face of the batch ER pipeline, suitable for entity tables that fit the
  canonical-store pattern (compact key table, not the raw corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fozzie_spark import textops


def streaming_enrich(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless enrichment — works identically on batch and stream."""
    out = textops.fingerprint(stream, text_col)
    out = textops.token_counts(out, text_col)
    out = textops.language_id(out, text_col)
    return out


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact near-real-time dedup: first row per content fingerprint within
    the watermark horizon survives. State is bounded by the watermark."""
    return (
        textops.fingerprint(stream, text_col)
        .withWatermark(event_time_col, watermark)
        .dropDuplicates(["fingerprint"])
    )


def _split_sessions(ts_us, vals, gap_us, max_us, cur=None):
    """Shared session-splitting rule (batch + streaming): returns
    (closed_sessions, open_session) where each session is
    (start_us, last_us, n, total), all times in MICROseconds (full
    timestamp precision). `cur` seeds an open session."""
    closed = []
    for i in sorted(range(len(ts_us)), key=lambda j: ts_us[j]):
        t, v = ts_us[i], vals[i]
        if cur is not None and (t - cur[1] > gap_us or (max_us and t - cur[0] > max_us)):
            closed.append(cur)
            cur = None
        if cur is None:
            cur = (t, t, 1, v)
        else:
            cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
    return closed, cur


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    max_session_seconds: int | None = None,
) -> DataFrame:
    """Batch counterpart of `streaming_sessionize` (same closing rules,
    shared splitter — batch/stream parity by construction): per-key
    applyInPandas emits EVERY session including the final open one.
    Scale shape: one shuffle on the key, Arrow-batched per-group work."""
    import pandas as pd

    gap_us = gap_seconds * 1_000_000
    max_us = max_session_seconds * 1_000_000 if max_session_seconds else None
    key_type = df.schema[key_col].dataType.simpleString()  # not hardcoded long:
    # string/decimal/etc. user keys keep their type through the group map
    out_schema = (
        f"{key_col} {key_type}, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        ts_us = [int(t.value // 10**3) for t in pd.to_datetime(pdf[ts_col])]
        vals = [float(v) for v in pdf[value_col]]
        closed, cur = _split_sessions(ts_us, vals, gap_us, max_us)
        if cur is not None:
            closed.append(cur)
        return pd.DataFrame(
            [
                (key, pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), n, tot)
                for (s, e, n, tot) in closed
            ],
            columns=[key_col, "session_start", "session_end", "n_events", "total_value"],
        )

    return df.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(fn, out_schema)


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    max_session_seconds: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionization via `applyInPandasWithState`:
    per-key event sessions that close after `gap_seconds` of silence
    (event-time timeout) — and, unlike the built-in
    `F.session_window` aggregation, support CUSTOM closing rules:
    `max_session_seconds` force-closes a session whose total duration
    exceeds the cap, however busy it is (bot/abuse cut-off).

    Emits (key, session_start, session_end, n_events, total_value) rows
    as sessions CLOSE (append mode). State per key is one open session
    (4 longs + a double), bounded by key cardinality; the event-time
    timeout is re-armed to last_event + gap on every update, so idle
    keys are flushed and evicted as the watermark passes.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    state_schema = "start long, last long, n long, total double"
    gap_us = gap_seconds * 1_000_000
    max_us = max_session_seconds * 1_000_000 if max_session_seconds else None

    def fn(key, pdfs, state: GroupState):
        sessions = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            sessions.append((key[0], start, last, n, total))
            state.remove()
        else:
            ts_us, vals = [], []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 10**3) for t in pd.to_datetime(pdf[ts_col]))
                vals.extend(float(v) for v in pdf[value_col])
            cur = tuple(state.get) if state.exists else None
            closed, cur = _split_sessions(ts_us, vals, gap_us, max_us, cur)
            sessions.extend((key[0],) + c for c in closed)
            if cur is not None:
                state.update(cur)
                # GroupState timeouts are millisecond-granular
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
            else:
                state.remove()
        if sessions:
            yield pd.DataFrame(
                [
                    (k, pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), n, tot)
                    for (k, s, e, n, tot) in sessions
                ],
                columns=[key_col, "session_start", "session_end", "n_events", "total_value"],
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def _parquet_fragments(spark, path: str) -> int:
    """Number of parquet part files under `path` (0 when absent), via the
    Hadoop FileSystem API so any supported storage scheme works."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return 0
    return sum(
        1 for st in fs.listStatus(p) if st.getPath().getName().endswith(".parquet")
    )


def _compact_parquet(spark, path: str, target_files: int):
    """Rewrite a parquet dir down to `target_files` fragments: write to a
    sibling tmp dir, then swap via RENAME-ASIDE (live -> __compact_old,
    tmp -> live, delete __compact_old). Unlike delete-then-rename, a crash
    between the two renames leaves the data recoverable on disk
    (`_recover_compaction` restores it on the next batch); each rename's
    boolean return is checked so a failed swap raises instead of silently
    losing the table. The swap is still not atomic against concurrent
    readers — callers run it inside foreachBatch, where the streaming
    trigger serializes access to the table."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    spark.read.parquet(path).coalesce(max(target_files, 1)).write.mode(
        "overwrite"
    ).parquet(tmp)
    hp = jvm.org.apache.hadoop.fs.Path
    p, pt, po = hp(path), hp(tmp), hp(old)
    fs = p.getFileSystem(hconf)
    fs.delete(po, True)  # stale aside dir from an earlier crashed swap
    if not fs.rename(p, po):
        raise IOError(f"compaction swap failed: cannot move {path} aside")
    if not fs.rename(pt, p):
        fs.rename(po, p)  # roll back: restore the live table
        raise IOError(f"compaction swap failed: cannot move {tmp} into place")
    fs.delete(po, True)


def _recover_compaction(spark, path: str) -> None:
    """Crash recovery for `_compact_parquet`: if the live dir is absent but
    the rename-aside dir survives (crash between the two renames), restore
    it before anyone reads the table."""
    jvm = spark.sparkContext._jvm
    hp = jvm.org.apache.hadoop.fs.Path
    p, po = hp(path), hp(path.rstrip("/") + "__compact_old")
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p) and fs.exists(po):
        fs.rename(po, p)


def _path_exists(spark, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def run_incremental_match(
    stream: DataFrame,
    entity_table_path: str,
    checkpoint_dir: str,
    key_col: str = "text",
    method: str = "jaccard",
    max_distance: float = 0.4,
    q: int = 3,
    compact_above: int | None = 16,
    compact_target_files: int = 4,
    compact_assignments: bool = False,
):
    """Start a foreachBatch query that fuzzy-matches each micro-batch
    against the canonical entity key table at `entity_table_path` (parquet,
    schema: entity_key string, entity_id long) and appends newly seen keys.

    Returns the StreamingQuery. Output: `{entity_table_path}_assignments`
    accumulates (doc row + entity_id) per batch.

    Every micro-batch appends one parquet fragment to the entity table (and
    the assignments dir) — the classic streaming small-files problem. When
    a table's fragment count exceeds `compact_above`, it is rewritten down
    to `compact_target_files` fragments inside the same foreachBatch call
    (the trigger serializes table access, so readers never race the swap).
    Assignments compaction is off by default (`compact_assignments`) —
    assignment rows are append-only results, and downstream consumers may
    be tailing the directory.
    """
    from fozzie_spark.joins import fuzzy_string_join

    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int):
        # a crash mid-compaction may have left the table renamed aside;
        # restore it BEFORE the existence check — only a genuinely
        # never-written table may start empty (a bare read-with-fallback
        # here would silently mint new entity ids for every known key)
        _recover_compaction(spark, entity_table_path)
        if _path_exists(spark, entity_table_path):
            entities = spark.read.parquet(entity_table_path)
        else:
            entities = spark.createDataFrame([], "entity_key string, entity_id bigint")
        matched = fuzzy_string_join(
            batch_df,
            entities,
            by={key_col: "entity_key"},
            method=method,
            how="left",
            max_distance=max_distance,
            q=q,
            suffixes=("", "_e"),
            # micro-batches are small by construction — skip the auto-sizing
            # count job the 'auto' route would otherwise pay per batch
            prefix_mode="simple",
        )
        resolved = matched.withColumn(
            "entity_id",
            F.coalesce(F.col("entity_id"), F.xxhash64(F.col(key_col))),
        ).drop("entity_key")
        resolved.write.mode("append").parquet(entity_table_path + "_assignments")
        new_keys = (
            resolved.join(
                entities.select(F.col("entity_id").alias("eid")),
                resolved["entity_id"] == F.col("eid"),
                "left_anti",
            )
            .select(F.col(key_col).alias("entity_key"), "entity_id")
            .distinct()
        )
        new_keys.write.mode("append").parquet(entity_table_path)
        if compact_above and _parquet_fragments(spark, entity_table_path) > compact_above:
            _compact_parquet(spark, entity_table_path, compact_target_files)
        if (
            compact_assignments
            and compact_above
            and _parquet_fragments(spark, entity_table_path + "_assignments") > compact_above
        ):
            _compact_parquet(spark, entity_table_path + "_assignments", compact_target_files)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
