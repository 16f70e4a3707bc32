"""The north-rule 3-stage entity-resolution pipeline over interleaved
text+media documents:

    stage 1  keys      doc_id -> join key (ordered concat of text spans)
    stage 2  blocking  q-gram inverted index (+ hot-gram capping, salted
                       repartition) -> distinct candidate KEY pairs
    stage 3  scoring   Arrow-batched pairwise distances, threshold -> edges
    stage 4  cluster   large-star/small-star connected components
    stage 5  assign    docs join key->entity; spans carried untouched

Clustering runs in KEY space (distinct key values), so identical texts
cluster for free and the edge graph is as small as possible; doc
assignment is one equi-join at the end. Every stage checkpoints through
StageRunner (lineage + metrics + resume).

Scale levers (100 TB story):
- all candidate generation is equi-join on generated block keys; no cross
  joins anywhere
- hot q-grams (power-law!) are capped by document frequency (`max_gram_df`)
  BEFORE the pair join, bounding the worst block quadratic
- the pair join is salted by repartition(salt_partitions) when requested
- scoring touches only distinct key pairs (dedup-before-score)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fozzie_spark.blocking import qgrams_col
from fozzie_spark.checkpoint import StageRunner
from fozzie_spark.cluster import connected_components
from fozzie_spark.scoring import string_distance_udf
from fozzie_spark.synth import doc_text_key


def er_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_dir: str,
    method: str = "jaccard",
    max_distance: float = 0.6,
    q: int = 4,
    max_gram_df: int | None = 10_000,
    salt_partitions: int | None = None,
    sn_window: int | None = 10,
    resume: bool = True,
    table_format: str = "parquet",
) -> dict[str, DataFrame]:
    """Run the pipeline; returns dict of stage DataFrames
    (keys, pairs, edges, clusters, entities)."""
    params = {
        "method": method,
        "max_distance": max_distance,
        "q": q,
        "max_gram_df": max_gram_df,
        "salt_partitions": salt_partitions,
        "sn_window": sn_window,
    }
    runner = StageRunner(
        spark, checkpoint_dir, run_config=params, resume=resume, table_format=table_format
    )

    # ---- stage 1: derive keys (pure projection — no shuffle) --------------
    def _keys():
        return docs.select("doc_id", doc_text_key("spans").alias("key"))

    keys = runner.stage("keys", _keys, params={"q": q})

    # ---- stage 2: blocking on distinct keys -------------------------------
    def _pairs():
        """Prefix-filtered q-gram inverted index (PPJoin-style, exact).

        Hot q-grams are power-law distributed; a naive share-a-gram join is
        quadratic in the hottest gram's document frequency. Prefix filtering
        (Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) is LOSSLESS for
        Jaccard: order each key's distinct grams by global rarity; two keys
        with jaccard_sim >= t = 1 - max_distance MUST share a gram within
        their first (n - ceil(t*n) + 1) grams. Indexing only prefixes turns
        the hot-gram quadratic into joins on the rarest grams.
        `max_gram_df` remains as an (approximate) safety valve on top.
        """
        from pyspark.sql import Window

        t = 1.0 - max_distance  # similarity threshold
        uniq = keys.select("key").where(F.col("key").isNotNull()).distinct().persist()
        grams = uniq.select(
            F.col("key"),
            F.size(F.array_distinct(qgrams_col("key", q))).alias("n"),
            F.explode(F.array_distinct(qgrams_col("key", q))).alias("g"),
        )
        gram_df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        if max_gram_df:
            gram_df = gram_df.where(F.col("df") <= max_gram_df)
        # gram-df table is small (bounded by distinct grams) — broadcast so
        # the exploded gram rows don't shuffle for the df lookup
        grams = grams.join(F.broadcast(gram_df), "g")  # inner: drops capped grams
        if method == "jaccard" and t > 0:
            w = Window.partitionBy("key").orderBy(F.col("df").asc(), F.col("g").asc())
            prefix_len = F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
            grams = (
                grams.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= prefix_len)
                .drop("rn")
            )
        grams = grams.select("key", "n", "g")
        right = grams.select(F.col("key").alias("key2"), F.col("n").alias("n2"), "g")
        if salt_partitions:
            grams = grams.repartition(salt_partitions, "g")
        cand = (
            grams.join(right, "g")
            .where(F.col("key") < F.col("key2"))
            # size-bound prune: jaccard_sim >= t needs min/max >= t
            .where(F.least("n", "n2") >= F.ceil(F.lit(t) * F.greatest("n", "n2")))
            .select("key", "key2")
            .distinct()
        )
        if sn_window:
            # complementary sorted-neighborhood pass (north rule): catches
            # pairs whose shared grams were all dropped by the df cap
            from fozzie_spark.blocking import sorted_neighborhood_candidates

            sn = sorted_neighborhood_candidates(uniq, "key", window=sn_window)
            sn = sn.select(
                F.least("key", "key2").alias("key"),
                F.greatest("key", "key2").alias("key2"),
            )
            cand = cand.unionByName(sn).distinct()
        return cand

    pairs = runner.stage("pairs", _pairs, params=params, depends_on=("keys",))

    # ---- stage 2b: JVM exact refine (profile methods only) -----------------
    # For jaccard the distance is computable entirely JVM-side from the gram
    # arrays (array_intersect — whole-stage codegen, no Python, no Arrow
    # transfer of the candidate strings). This is the cheap exact kill for
    # the "shared one rare word" candidate mass; the Arrow scorer then only
    # touches true near-duplicates. Lossless: same distance definition.
    if method == "jaccard":

        def _refine():
            # gram SETS as hashed bigint arrays: 3-4x smaller than string
            # arrays through the join, and long-compare intersection.
            # xxhash64 collisions (~n^2/2^64) are negligible and would only
            # ever ADD a candidate — the Arrow scorer re-verifies exactly.
            sets_df = (
                keys.select("key")
                .where(F.col("key").isNotNull())
                .distinct()
                .select(
                    "key",
                    F.transform(
                        F.array_distinct(qgrams_col("key", q)), lambda g: F.xxhash64(g)
                    ).alias("gs"),
                )
            )
            # the distinct-key gram table is tiny relative to the pair table
            # — broadcast it both ways so the 10M+ pair rows never shuffle.
            # (At key cardinalities beyond memory, drop the hint: Catalyst
            # falls back to a shuffled join, still correct.)
            n_keys = sets_df.count()
            bcast = n_keys < 5_000_000
            a = sets_df.select(F.col("key"), F.col("gs").alias("gs1"))
            b = sets_df.select(F.col("key").alias("key2"), F.col("gs").alias("gs2"))
            if bcast:
                a, b = F.broadcast(a), F.broadcast(b)
            inter = F.size(F.array_intersect("gs1", "gs2"))
            union = F.size("gs1") + F.size("gs2") - inter
            jd = F.when(
                (F.size("gs1") == 0) & (F.size("gs2") == 0), F.lit(0.0)
            ).otherwise(F.lit(1.0) - inter / union)
            return (
                pairs.join(a, "key")
                .join(b, "key2")
                .where(jd <= max_distance)
                .select("key", "key2")
            )

        scored_input = runner.stage("refine", _refine, params=params, depends_on=("pairs",))
        refine_dep = ("refine",)
    else:
        scored_input = pairs
        refine_dep = ("pairs",)

    # ---- stage 3: vectorized scoring -> edges ------------------------------
    def _edges():
        udf = string_distance_udf(method, max_distance=max_distance, q=q)
        return (
            scored_input.withColumn("dist", udf(F.col("key"), F.col("key2")))
            .where(F.col("dist") <= max_distance)
            .select("key", "key2", "dist")
        )

    edges = runner.stage("edges", _edges, params=params, depends_on=refine_dep)

    # ---- stage 4: transitive clustering over keys --------------------------
    def _clusters():
        return connected_components(edges, src="key", dst="key2").select(
            F.col("node").alias("key"), F.col("component").alias("entity_key")
        )

    clusters = runner.stage("clusters", _clusters, params=params, depends_on=("edges",))

    # ---- stage 5: assign docs, carry spans byte-identical -------------------
    def _entities():
        assign = keys.join(clusters, "key", "left").select(
            "doc_id", F.coalesce("entity_key", "key").alias("entity_key")
        )
        return (
            docs.join(assign, "doc_id")
            .withColumn("entity_id", F.xxhash64("entity_key"))
            .drop("entity_key")
        )

    entities = runner.stage("entities", _entities, params=params, depends_on=("clusters", "keys"))

    return {
        "keys": keys,
        "pairs": pairs,
        "edges": edges,
        "clusters": clusters,
        "entities": entities,
        "runner": runner,
    }


def pairwise_f1(entities: DataFrame, truth_col: str = "entity_id", pred_col: str = "pred") -> dict:
    """Pairwise precision/recall/F1 of predicted vs true clusters.

    Counts co-clustered pairs via sum-of-squares per cluster id — no pair
    materialization, three aggregations total.
    """

    def pair_count(df, col):
        return (
            df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) / 2")))
            .first()[0]
            or 0
        )

    tp = pair_count(
        entities.select(F.concat_ws("|", F.col(truth_col), F.col(pred_col)).alias("both")), "both"
    )
    true_pairs = pair_count(entities, truth_col)
    pred_pairs = pair_count(entities, pred_col)
    precision = tp / pred_pairs if pred_pairs else 1.0
    recall = tp / true_pairs if true_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "true_pairs": int(true_pairs),
        "pred_pairs": int(pred_pairs),
        "tp": int(tp),
    }
