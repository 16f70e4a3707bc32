"""Physical-plan audit for the headline queries: prints each plan's
operator inventory and flags the anti-patterns the engine promises to
avoid (CartesianProduct / BroadcastNestedLoopJoin on paths that must be
equi-joins, missing whole-stage codegen, full-column parquet scans).

    python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(name: str, df, allow_bnlj: bool = False) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if not allow_bnlj and "BroadcastNestedLoopJoin" in plan:
        flags.append("BroadcastNestedLoopJoin")
    joins = sorted(set(re.findall(r"(\w*HashJoin|SortMergeJoin\w*|BroadcastNestedLoopJoin|CartesianProduct)", plan)))
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    print(f"{name}: joins={joins} "
          f"scan_cols={[s.count(':') for s in scans]} "
          f"{'FLAGS: ' + ','.join(flags) if flags else 'clean'}")
    return {"name": name, "flags": flags}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import fozzie_spark as fz
    from fozzie_spark import ann, textops
    from fozzie_spark.streaming import sessionize

    names = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    results = []
    # r7: tiny-input string joins DELIBERATELY route to a scored cross
    # product (blocking.use_tiny_cross — stats-gated at <= 1k combined
    # distinct keys), so a BNLJ here is the intended plan, not a leak;
    # the index paths are audited below via the prefix-mode builders and
    # the large-side gate is exercised in tests/test_blocking.py
    results.append(audit(
        "string_lv (tiny-cross route)",
        fz.fuzzy_string_join(names, names, by="name", method="lv", max_distance=1),
        allow_bnlj=True,
    ))
    results.append(audit(
        "string_jaccard (tiny-cross route)",
        fz.fuzzy_string_join(names, names, by="name", method="jaccard",
                             max_distance=0.4, q=2),
        allow_bnlj=True,
    ))
    results.append(audit(
        "jaccard_dedup",
        textops.jaccard_dedup_pairs(docs, "doc_id", "text", 3, 0.6),
    ))
    results.append(audit(
        "minhash_dedup",
        textops.minhash_dedup_pairs(docs, "doc_id", "text", 64, 16, 3, 0.6),
    ))
    results.append(audit(
        "lsh_cosine_pairs",
        ann.lsh_cosine_pairs(emb, "vec_id", "v", min_cosine=0.4, n_planes=16, bands=8),
    ))
    results.append(audit(
        "sessionize", sessionize(ev, "user_id", "ts", "value", 600)
    ))
    # interval join: equi-join on overlap bins, no range cross join
    o = ev.where(F.col("event_type") == "error").select(
        "event_id", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    results.append(audit(
        "temporal_interval",
        fz.temporal_interval_join(
            o, o.select(F.col("event_id").alias("e2"), F.col("s").alias("s2"),
                        F.col("e").alias("e2t")),
            by={"s": "s2", "e": "e2t"}, maxgap=60, unit="seconds",
        ),
    ))
    # id-keyed ER candidate builders (kids + grams shuffle, no key strings,
    # no cross joins)
    from fozzie_spark import blocking as B

    keys = docs.select(
        F.xxhash64("text").alias("kid"), F.col("text").alias("key")
    ).distinct()
    prof_q = keys.select(
        "kid",
        F.array_distinct(B.qgrams_col("key", 3)).alias("__fz_gs"),
        F.size(B.qgrams_col("key", 3)).alias("__fz_tc"),
    )
    results.append(audit(
        "er_qgram_ids", B.qgram_candidates_ids(prof_q, "kid", 4, prefix_mode="prefix")
    ))
    prof_c = keys.select("kid", B._count_map_col("key", 3).alias("__fz_cm"))
    results.append(audit(
        "er_cosine_ids", B.cosine_candidates_ids(prof_c, "kid", 0.25, prefix_mode="prefix")
    ))
    prof_j = keys.select(
        "kid", F.length("key").cast("int").alias("__fz_kn"),
        B.char_occurrence_tokens("key").alias("__fz_ts"),
    )
    results.append(audit(
        "er_jw_ids", B.jaro_candidates_ids(prof_j, "kid", 0.25)
    ))
    bad = [r["name"] for r in results if r["flags"]]
    print("AUDIT:", "FAIL " + ",".join(bad) if bad else "all plans clean")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
