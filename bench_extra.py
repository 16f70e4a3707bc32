"""Round-7 profiling harness (guide §1): isolates the expensive bench
queries with sub-phase timers and noop sinks so optimization targets the
right stage. Does NOT replace bench.py (frozen for measurement); numbers
from here are cited in OPTIMIZATION_r07.md.

Usage: python bench_extra.py <probe> [repeat]
  probes: ann, near_dedup, string_lv, er, er_cos, minhash, all
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def make_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fozzie-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s" + (f" ({out})" if out is not None else ""), flush=True)
    return dt


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "all"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from pyspark.sql import functions as F

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from fozzie_spark import ann, fuzzy_string_join, textops
    from fozzie_spark.pipeline import er_pipeline
    from fozzie_spark.synth import synth_documents

    def rd(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    for it in range(rep):
        print(f"--- iteration {it} ---", flush=True)

        if probe in ("ann", "all"):
            print("[ann]", flush=True)
            emb = rd("embeddings").select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            )
            n = emb.count()
            dim = len(emb.select("v").first()[0])
            print(f"  corpus rows={n} dim={dim} "
                  f"partitions={emb.rdd.getNumPartitions()}", flush=True)
            emb_s = emb.where(F.col("vec_id") < 500)
            timed("exact_pairs_500.collect", lambda: len(
                ann.cosine_pairs(emb_s, "vec_id", "v", min_cosine=0.4,
                                 strategy="exact").collect()))
            timed("lsh_pairs_500.collect", lambda: len(
                ann.lsh_cosine_pairs(emb_s, "vec_id", "v", min_cosine=0.4,
                                     n_planes=16, bands=8).collect()))
            probes = emb.where(F.col("vec_id") < 100)
            timed("cosine_topk.count", lambda: ann.cosine_topk(
                probes, emb, "vec_id", "v", k=10).count())

        if probe in ("minhash", "near_dedup", "all"):
            print("[dedup]", flush=True)
            docs = rd("documents")
            t_sig = timed("minhash_sigs.noop", lambda: noop(
                textops.minhash_signatures(docs, "doc_id", "text", 64, 3)))
            t_pairs = timed("minhash_pairs.count", lambda: textops.minhash_dedup_pairs(
                docs, "doc_id", "text", num_hashes=64, bands=16, shingle_w=3,
                max_distance=0.6).count())
            t_nd = timed("near_dedup.count", lambda: textops.near_dedup(
                docs, "doc_id", "text", method="minhash", shingle_w=3,
                max_distance=0.6).count())
            print(f"  near_dedup - pairs = {t_nd - t_pairs:.3f}s", flush=True)

        if probe in ("string_lv", "all"):
            print("[string_lv]", flush=True)
            names = rd("part").select(F.col("p_name").alias("name")).distinct()
            nn = names.count()
            print(f"  distinct names={nn}", flush=True)
            from fozzie_spark import blocking
            l0 = names.select(F.col("name").alias("__fz_l0")).distinct()
            r0 = names.select(F.col("name").alias("__fz_r0")).distinct()
            timed("edit_candidates.count", lambda: blocking.edit_candidates(
                l0, r0, "__fz_l0", "__fz_r0", 1, method="lv", q=2).count())
            timed("full_join.count", lambda: fuzzy_string_join(
                names, names, by="name", method="lv", max_distance=1,
                distance_col="d").count())

        if probe in ("er", "all"):
            print("[er_pipeline jaccard]", flush=True)
            n_entities = max(int(500_000 * sf), 500)
            ckpt = tempfile.mkdtemp(prefix="fzx_er_")
            t0 = time.time()
            out = er_pipeline(
                spark, synth_documents(spark, n_entities), checkpoint_dir=ckpt,
                resume=False,
            )
            out["entities"].count()
            print(f"  total: {time.time()-t0:.3f}s", flush=True)
            r = out["runner"]
            print("  stage walls:", {
                st: r.manifests[st]["wall_s"]
                for st in ("keys", "pairs", "edges", "clusters", "entities")
            }, flush=True)

        if probe in ("er_cos", "all"):
            print("[er_pipeline cosine]", flush=True)
            n_cos = max(int(200_000 * sf), 500)
            ckpt = tempfile.mkdtemp(prefix="fzx_ercos_")
            t0 = time.time()
            out = er_pipeline(
                spark, synth_documents(spark, n_cos), checkpoint_dir=ckpt,
                method="cosine", max_distance=0.25, q=3, resume=False,
            )
            out["entities"].count()
            print(f"  total: {time.time()-t0:.3f}s", flush=True)
            r = out["runner"]
            print("  stage walls:", {
                st: r.manifests[st]["wall_s"]
                for st in ("keys", "pairs", "edges", "clusters", "entities")
            }, flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
