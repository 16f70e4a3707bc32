"""Round-7 control for the jw-ER hot-token valve (VERDICT r6 next-round
item #2): the 10k uniform-character corpus where both round-5 and round-6
builders DNF'd (BENCH/BASELINE.md negative result #3 — occurrence-1 token
df ~ 0.4n makes the candidate join ~n^2 regardless of ordering).

Runs er_pipeline(method="jw") with a given max_gram_df (token-df cap) and
reports wall, candidate volume, and pairwise F1 against the generator's
ground-truth entity ids.

Usage: python scripts/bench_jw_uniform.py <n_entities> <max_gram_df|auto>
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    cap_arg = sys.argv[2] if len(sys.argv) > 2 else "auto"
    cap = cap_arg if cap_arg == "auto" else int(cap_arg)

    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jw-uniform")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fozzie_spark.pipeline import er_pipeline, pairwise_f1

    # ADVERSARIAL corpus: 10-char uniform-random-letter keys (no name
    # pool, no vocabulary skew), 1-3 variants per entity within 1-2
    # single-char edits — the regime where every (char, occurrence-1)
    # token is hot.
    rng = random.Random(0x0F07)
    letters = "abcdefghijklmnopqrstuvwxyz"

    def mutate(s, r):
        s = list(s)
        for _ in range(r.randint(1, 2)):
            i = r.randrange(len(s))
            op = r.randint(0, 2)
            if op == 0:
                s[i] = r.choice(letters)
            elif op == 1 and len(s) > 2:
                del s[i]
            else:
                s.insert(i, r.choice(letters))
        return "".join(s)

    rows = []
    for e in range(n_entities):
        base = "".join(rng.choice(letters) for _ in range(10))
        rows.append((f"doc-{e}-0", e, [{"kind": "text", "text": base,
                                        "media_ref": None, "offset": 0}]))
        for v in range(rng.randint(0, 2)):
            rows.append((
                f"doc-{e}-{v+1}", e,
                [{"kind": "text", "text": mutate(base, rng),
                  "media_ref": None, "offset": 0}],
            ))
    docs = spark.createDataFrame(
        rows,
        "doc_id string, entity_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    ).repartition(int(cpus))
    print(f"docs={len(rows)} entities={n_entities} cap={cap_arg}", flush=True)

    ckpt = tempfile.mkdtemp(prefix="fz_jwuni_")
    t0 = time.time()
    out = er_pipeline(
        spark, docs, checkpoint_dir=ckpt, method="jw", max_distance=0.25,
        prefix_weight=0.0, resume=False, max_gram_df=cap,
    )
    ents = out["entities"].select("doc_id", "entity_id",
                                  F.col("entity_id").alias("truth")).drop("entity_id")
    # entities output renames: truth lives in the docs frame; re-derive
    pred = out["entities"].select("doc_id", F.col("entity_id").alias("pred"))
    truth = docs.select("doc_id", F.col("entity_id").alias("truth"))
    joined = pred.join(truth, "doc_id")
    n_docs = joined.count()
    wall = time.time() - t0
    r = out["runner"]
    walls = {st: r.manifests[st]["wall_s"]
             for st in ("keys", "pairs", "edges", "clusters", "entities")}
    print(f"TOTAL {wall:.1f}s walls={walls}", flush=True)
    print(f"raw_candidates={r.metric('pairs', 'raw_candidates')} "
          f"pairs_rows={r.metric('pairs', 'rows')}", flush=True)
    f1 = pairwise_f1(joined.withColumnRenamed("truth", "entity_id"),
                     truth_col="entity_id", pred_col="pred")
    print(f"F1={f1['f1']:.6f} precision={f1['precision']:.6f} "
          f"recall={f1['recall']:.6f} docs={n_docs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
