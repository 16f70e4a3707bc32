"""Round-7 pairs-stage breakdown (guide §1): replicates er_pipeline's
pairs stage step by step with timers + noop sinks, for the jaccard (50k
entities) and cosine (20k docs) bench corpora. Throwaway profiling
evidence for OPTIMIZATION_r07.md — not part of the library.

Usage: python scripts/prof_pairs_r07.py {jaccard|cosine}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time()-t0:.3f}s" + (f" ({out})" if out is not None else ""),
          flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "jaccard"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("prof-pairs")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fozzie_spark import blocking as B
    from fozzie_spark.blocking import _count_map_col, qgrams_col
    from fozzie_spark.pipeline import NSIG, _bloom_sig_cols, key_id
    from fozzie_spark.synth import doc_text_key, synth_documents

    if which == "jaccard":
        n, q, max_distance = 50_000, 4, 0.6
    else:
        n, q, max_distance = 20_000, 3, 0.25

    docs = synth_documents(spark, n)
    keys = docs.select("doc_id", doc_text_key("spans").alias("key")).withColumn(
        "kid", key_id(F.col("key"))
    )
    # warm the session (JIT + python workers) on the keys projection
    timed("keys.noop (warm)", lambda: noop(keys))
    timed("keys.noop (again)", lambda: noop(keys))

    _gs = F.array_distinct(qgrams_col("key", q))
    _me = F.transform(
        F.map_entries(_count_map_col("key", q)),
        lambda e: F.struct(
            F.pmod(F.xxhash64(e["key"]), F.lit(128)).cast("int").alias("b"),
            e["value"].cast("double").alias("c"),
        ),
    )
    if which == "jaccard":
        uniq = (
            keys.select("key", "kid").where(F.col("key").isNotNull()).distinct()
            .select("key", "kid", _gs.alias("gs"), F.size(_gs).alias("n"),
                    *_bloom_sig_cols(_gs))
            .persist()
        )
    else:
        # mirror pipeline.py's chained build
        base = keys.select("key", "kid").where(F.col("key").isNotNull()).distinct()
        _me_from_cm = F.transform(
            F.map_entries(F.col("cm")),
            lambda e: F.struct(
                F.pmod(F.xxhash64(e["key"]), F.lit(128)).cast("int").alias("b"),
                e["value"].cast("double").alias("c"),
            ),
        )
        u1 = base.select("key", "kid", _count_map_col("key", q).alias("cm"))
        u2 = u1.select("key", "kid", _me_from_cm.alias("me"), "cm")
        u3 = u2.select(
            "*", F.transform(F.map_keys("cm"), lambda g: F.xxhash64(g)).alias("__hs")
        )
        uniq = u3.select(
            *[c for c in u3.columns if c != "__hs"],
            *_bloom_sig_cols(F.col("__hs"), hashed=True),
        ).persist()
    row = timed("uniq.agg (materialize persist)",
                lambda: tuple(uniq.agg(F.count(F.lit(1)), F.sum(F.octet_length("key"))).first()))
    n_uniq = int(row[0])
    cap = max(10_000, n_uniq // 8)
    print(f"  n_uniq={n_uniq} cap={cap}", flush=True)

    sig_cols = [f"s{i}" for i in range(NSIG)]

    if which == "jaccard":
        t = 1.0 - max_distance
        grams = uniq.select("kid", "n", *sig_cols, F.explode("gs").alias("g"))
        gram_df_all = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).persist()
        timed("gram_df count (n_capped)",
              lambda: gram_df_all.where(F.col("df") > cap).count())
        grams = grams.join(F.broadcast(gram_df_all), "g")
        plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
        agg = grams.groupBy("kid", "n", *sig_cols).agg(
            F.array_sort(F.collect_list(F.struct("df", "g"))).alias("__sorted")
        )
        grams2 = agg.select(
            "kid", "n", *sig_cols,
            F.posexplode(F.slice("__sorted", 1, plen)).alias("__p", "__e"),
        ).select(
            "kid", "n", *sig_cols,
            F.col("__e.g").alias("g"), (F.col("__p") + 1).alias("rn"),
        ).persist()
        timed("prefix-gram frame.noop (materialize)", lambda: noop(grams2))
        timed("prefix-gram rows", lambda: grams2.count())
        right_cols = {"kid": "kid2", "n": "n2", "rn": "rn2",
                      **{f"s{i}": f"b{i}" for i in range(NSIG)}}
        right = grams2.select("g", *[F.col(c).alias(a) for c, a in right_cols.items()])
        cand = grams2.join(right, "g").where(F.col("kid") < F.col("kid2"))
        cand = cand.where(
            F.least("n", "n2") >= F.ceil(F.lit(t) * F.greatest("n", "n2")))
        alpha = F.ceil(F.lit(t / (1.0 + t)) * (F.col("n") + F.col("n2")))
        cand = cand.where(
            F.lit(1) + F.least(F.col("n") - F.col("rn"), F.col("n2") - F.col("rn2"))
            >= alpha)
        timed("raw candidate count (pre-bloom)", lambda: cand.count())
        alpha_b = F.ceil(F.lit(t / (1.0 + t)) * (F.col("n") + F.col("n2")))
        shared_bits = sum(
            F.bit_count(F.col(f"s{i}").bitwiseAND(F.col(f"b{i}"))) for i in range(NSIG))
        cand2 = cand.where(
            shared_bits >= F.greatest(F.floor(alpha_b / 2) - 2, F.lit(1)))
        timed("bloom-cut survivor count", lambda: cand2.count())
        final = cand2.select("kid", "kid2").distinct()
        timed("distinct pairs.noop", lambda: noop(final))
        timed("pairs again (all steps, warm).noop", lambda: noop(final))
    else:
        _sw = [F.col(f"s{i}").alias(f"__fz_sig{i}") for i in range(NSIG)]
        gsrc = uniq.select(F.explode(F.map_keys("cm")).alias("g"))
        timed("n_capped count", lambda: gsrc.groupBy("g").agg(
            F.count(F.lit(1)).alias("df")).where(F.col("df") > cap).count())
        prof = uniq.select("kid", F.col("cm").alias("__fz_cm"), *_sw)
        cand_nocap = B.cosine_candidates_ids(
            prof, "kid", max_distance, prefix_mode="prefix", sig_words=NSIG,
            max_gram_df=None, bin_words=0,
        )
        timed("candidates UNCAPPED.noop", lambda: noop(cand_nocap))
        cand_cap = B.cosine_candidates_ids(
            prof, "kid", max_distance, prefix_mode="prefix", sig_words=NSIG,
            max_gram_df=cap, bin_words=0,
        )
        timed("candidates capped.noop", lambda: noop(cand_cap))
        from fozzie_spark.blocking import sorted_neighborhood_candidates
        sn = sorted_neighborhood_candidates(uniq.select("key"), "key", window=10)
        extra = sn.select(
            key_id(F.col("key")).alias("a"), key_id(F.col("key2")).alias("b")
        ).select(F.least("a", "b").alias("kid"), F.greatest("a", "b").alias("kid2"))
        timed("SN pass.noop", lambda: noop(extra))
        full = cand_cap.unionByName(extra).distinct()
        timed("capped+SN distinct.noop (full pairs output)", lambda: noop(full))
        timed("UNCAPPED distinct again.noop", lambda: noop(cand_nocap))

    spark.stop()


if __name__ == "__main__":
    main()
