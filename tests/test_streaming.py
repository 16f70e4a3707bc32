"""Structured Streaming tests: file-source micro-batches through the
streaming dedup/enrich/incremental-match operators."""

import datetime as dt
import os

from fozzie_spark import streaming


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id string, text string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_exact_dedup_and_enrich(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    _write_batch(
        spark,
        src,
        [
            ("a", "the quick brown fox", t),
            ("b", "the  QUICK brown fox", t),  # same fingerprint as a
            ("c", "a different document", t),
        ],
    )
    stream = spark.readStream.schema("doc_id string, text string, ts timestamp").parquet(src)
    enriched = streaming.streaming_enrich(
        streaming.streaming_exact_dedup(stream, "text", "ts", "10 minutes"), "text"
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = {r["doc_id"]: r for r in got.collect()}
    # one of a/b survives (same fingerprint), c survives
    assert len(rows) == 2 and "c" in rows
    surviving = next(k for k in rows if k != "c")
    assert rows[surviving]["ws_tokens"] == 4
    assert rows["c"]["fingerprint"] != rows[surviving]["fingerprint"]


def test_incremental_match(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    ent = str(tmp_path / "entities")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    _write_batch(
        spark,
        src,
        [("a", "hello world document", t), ("b", "hello world documenz", t)],
    )
    stream = spark.readStream.schema("doc_id string, text string, ts timestamp").parquet(src)
    q = streaming.run_incremental_match(
        stream, ent, ckpt, key_col="text", max_distance=0.4, q=3
    )
    q.awaitTermination(120)

    assigns = spark.read.parquet(ent + "_assignments")
    got = {r["doc_id"]: r["entity_id"] for r in assigns.collect()}
    assert len(got) == 2

    # second wave: a near-duplicate of doc a must resolve to an EXISTING entity
    _write_batch(spark, src, [("c", "hello world documents", t)])
    stream2 = spark.readStream.schema("doc_id string, text string, ts timestamp").parquet(src)
    q2 = streaming.run_incremental_match(
        stream2, ent, str(tmp_path / "ckpt3"), key_col="text", max_distance=0.4, q=3
    )
    q2.awaitTermination(180)
    assigns2 = spark.read.parquet(ent + "_assignments")
    by_doc = {}
    for r in assigns2.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["entity_id"])
    assert by_doc["c"] & (by_doc["a"] | by_doc["b"])  # c joined an existing entity


def test_incremental_match_compaction(spark, tmp_path):
    # 12 micro-batches: without compaction the entity table accumulates one
    # fragment per batch; with compact_above the fragment count stays
    # bounded while assignments are identical to the uncompacted run
    from fozzie_spark.streaming import _parquet_fragments

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [[(f"d{i}", f"document number {i} unique payload {i}", t)] for i in range(12)]

    def run(tag, **kw):
        src = str(tmp_path / f"src_{tag}")
        ent = str(tmp_path / f"ent_{tag}")
        for rows in batches:
            _write_batch(spark, src, rows)
        stream = (
            spark.readStream.schema("doc_id string, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming.run_incremental_match(
            stream, ent, str(tmp_path / f"ck_{tag}"), key_col="text",
            max_distance=0.4, q=3, **kw,
        )
        q.awaitTermination(300)
        assigns = {
            (r["doc_id"], r["entity_id"])
            for r in spark.read.parquet(ent + "_assignments").collect()
        }
        return assigns, _parquet_fragments(spark, ent)

    plain, frags_plain = run("plain", compact_above=None)
    compacted, frags_comp = run(
        "comp", compact_above=5, compact_target_files=2, compact_assignments=True
    )
    assert frags_plain >= 12  # one fragment per batch without compaction
    assert frags_comp <= 5 + 1  # bounded: compacted down whenever cap exceeded
    assert {d for d, _ in plain} == {d for d, _ in compacted} == {f"d{i}" for i in range(12)}
    assert plain == compacted  # identical assignment results


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_streaming_sessionize(spark, tmp_path):
    src = str(tmp_path / "ev")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: user 1 has two bursts separated by > gap (in-batch split);
    # user 2 has one event
    _write_events(
        spark, src,
        [(1, at(0), 1.0), (1, at(1), 2.0), (1, at(20), 4.0), (2, at(0), 8.0)],
    )
    # batch 2: only user 2 — advances the watermark past user 1's timeout
    _write_events(spark, src, [(2, at(120), 16.0)])
    # batch 3: only user 2 again — lets batch-2's watermark fire timeouts
    _write_events(spark, src, [(2, at(240), 32.0)])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming.streaming_sessionize(
            stream, gap_seconds=300, watermark="1 second"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    )
    # user 1: burst (12:00-12:01, 2 events, 3.0) closed by the in-batch gap;
    # burst (12:20, 1 event, 4.0) closed by event-time timeout
    u1 = [r for r in rows if r[0] == 1]
    assert (1, at(0), at(1), 2, 3.0) in u1
    assert (1, at(20), at(20), 1, 4.0) in u1
    # user 2's 12:00 event sessionized away from the later ones
    u2 = [r for r in rows if r[0] == 2]
    assert any(r[1] == at(0) and r[3] == 1 and r[4] == 8.0 for r in u2)


def test_sessionize_string_keys(spark, tmp_path):
    # key type is derived from the input schema, not hardcoded long —
    # string user keys must survive batch AND streaming sessionization
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [("alice", at(0), 1.0), ("alice", at(1), 2.0), ("alice", at(20), 4.0),
            ("bob", at(0), 8.0)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["total_value"])
        for r in streaming.sessionize(df, gap_seconds=300).collect()
    )
    assert got == [
        ("alice", at(0), 2, 3.0), ("alice", at(20), 1, 4.0), ("bob", at(0), 1, 8.0)
    ]

    src = str(tmp_path / "ev_str")
    out = str(tmp_path / "sess_out_str")
    spark.createDataFrame(rows, "user_id string, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("bob", at(120), 16.0)], "user_id string, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming.streaming_sessionize(stream, gap_seconds=300, watermark="1 second")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_str"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    srows = {(r["user_id"], r["session_start"]) for r in spark.read.parquet(out).collect()}
    assert ("alice", at(0)) in srows  # in-batch gap split with a string key


def test_sessionize_max_session_cap(spark, tmp_path):
    # events 2 min apart never hit the 5-min gap, but the 10-min session cap
    # force-closes the run — a rule session_window cannot express
    src = str(tmp_path / "ev2")
    out = str(tmp_path / "sess_out2")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(7, t0 + dt.timedelta(minutes=2 * i), 1.0) for i in range(8)]
    _write_events(spark, src, rows)
    _write_events(spark, src, [(8, t0 + dt.timedelta(hours=3), 0.0)])
    _write_events(spark, src, [(8, t0 + dt.timedelta(hours=6), 0.0)])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming.streaming_sessionize(
            stream, gap_seconds=300, max_session_seconds=600, watermark="1 second"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    u7 = sorted(
        (r["session_start"], r["n_events"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == 7
    )
    # 8 events 2-min apart, 10-min cap: closes after the first event past
    # +10min, i.e. sessions of 6 events (0..10 min) then the rest
    assert u7 and u7[0][1] == 6


def test_compaction_swap_is_crash_recoverable(spark, tmp_path):
    # simulate a driver crash between _compact_parquet's two renames: the
    # live dir is absent but the rename-aside dir holds the data; the next
    # batch's _recover_compaction must restore it instead of silently
    # starting from an empty entity table
    import shutil

    live = str(tmp_path / "tbl")
    spark.createDataFrame(
        [("k1", 1), ("k2", 2)], "entity_key string, entity_id bigint"
    ).write.parquet(live)
    shutil.move(live, live + "__compact_old")  # crash window state
    assert not os.path.exists(live)
    streaming._recover_compaction(spark, live)
    assert os.path.exists(live)
    got = {(r["entity_key"], r["entity_id"]) for r in spark.read.parquet(live).collect()}
    assert got == {("k1", 1), ("k2", 2)}
    # idempotent when nothing to recover
    streaming._recover_compaction(spark, live)
    assert {(r["entity_key"], r["entity_id"]) for r in spark.read.parquet(live).collect()} == got


def test_compact_parquet_rename_aside(spark, tmp_path):
    # normal-path compaction: fragments drop, rows identical, no aside dir
    # left behind
    from fozzie_spark.streaming import _compact_parquet, _parquet_fragments

    p = str(tmp_path / "frag")
    for i in range(6):
        spark.createDataFrame([(f"k{i}", i)], "entity_key string, entity_id bigint") \
            .coalesce(1).write.mode("append").parquet(p)
    assert _parquet_fragments(spark, p) >= 6
    before = {(r["entity_key"], r["entity_id"]) for r in spark.read.parquet(p).collect()}
    _compact_parquet(spark, p, 2)
    assert _parquet_fragments(spark, p) <= 2
    after = {(r["entity_key"], r["entity_id"]) for r in spark.read.parquet(p).collect()}
    assert after == before
    assert not os.path.exists(p + "__compact_old")
    assert not os.path.exists(p + "__compact_tmp")
