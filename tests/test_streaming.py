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
