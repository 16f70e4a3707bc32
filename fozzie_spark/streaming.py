"""Structured Streaming operators for document streams.

The reference is batch-only (SURVEY.md §2.7); these are the streaming
counterparts a continuously-ingesting training-data pipeline needs:

- `streaming_exact_dedup`: watermarked drop-duplicates on the content
  fingerprint (state bounded by the watermark window)
- `streaming_enrich`: stateless per-row enrichment (fingerprint, token
  counts, quality, language id) — identical expressions to the batch ops,
  so batch/stream parity is by construction
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


def run_incremental_match(
    stream: DataFrame,
    entity_table_path: str,
    checkpoint_dir: str,
    key_col: str = "text",
    method: str = "jaccard",
    max_distance: float = 0.4,
    q: int = 3,
):
    """Start a foreachBatch query that fuzzy-matches each micro-batch
    against the canonical entity key table at `entity_table_path` (parquet,
    schema: entity_key string, entity_id long) and appends newly seen keys.

    Returns the StreamingQuery. Output: `{entity_table_path}_assignments`
    accumulates (doc row + entity_id) per batch.
    """
    from fozzie_spark.joins import fuzzy_string_join

    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int):
        try:
            entities = spark.read.parquet(entity_table_path)
        except Exception:
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

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
