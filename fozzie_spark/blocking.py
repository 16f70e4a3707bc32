"""Candidate-pair generation (the blocking stage).

All builders operate on DataFrames of DISTINCT key tuples — the engine
dedupes on unique key values before pairing (the reference's central
optimization, src/rust/src/utils.rs:7-20) and re-expands to rows after
scoring. Every builder is pure DataFrame ops (JVM-side, codegen-friendly);
nothing here collects to the driver except scalar stats for bin sizing.

Blocking families (SURVEY.md §2.2/§4):
- length-band join for edit distances  (ref: string/edit/mod.rs:35-48)
- q-gram inverted index (+ count lower bound) for edit & ngram methods
  (ref: string/ngram/jaccard.rs:118-177)
- numeric banding for difference joins (ref: difference/mod.rs:19-43)
- grid cells for k-D distance joins
- overlap bins for interval joins (replaces the reference's interval tree)

Each candidate join is an equi-join on a generated block key, so Catalyst
plans a shuffled hash / sort-merge join; hot keys can be salted upstream by
`pairs.salt_repartition`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: auto prefix-filter gate (see `use_prefix_filter`): inputs whose combined
#: distinct-key count is below this use the round-2 share-any-gram join —
#: the prefix machinery's fixed-cost stages (global gram-df aggregation,
#: per-key sort, second profile join) don't amortize on small inputs, and
#: the post-filter candidate set is IDENTICAL either way.
PREFIX_AUTO_KEY_THRESHOLD = 50_000
#: inputs whose optimizer plan stats exceed this many bytes skip the count
#: job entirely and go straight to the prefix path (stats unknown => large)
PREFIX_AUTO_BYTES_THRESHOLD = 512 << 20


_UNKNOWN_SIZE = (1 << 63) - 1  # Spark's sizeInBytes sentinel for "no idea"


def _plan_size_bytes(df: DataFrame) -> int | None:
    try:
        sz = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        return None if sz >= _UNKNOWN_SIZE else sz
    except Exception:
        return None


#: memoized auto-route decisions keyed by (left, right) plan semanticHash —
#: long chains of small joins over the SAME inputs (streaming micro-batches,
#: multi-method pytest suites) would otherwise pay one count job per call.
#: semanticHash fingerprints the logical plan, so in-place mutation of the
#: same external path is the only staleness case (same caveat the resume
#: fingerprint in checkpoint.py documents).
_PREFIX_DECISION_CACHE: dict[tuple, bool] = {}
_PREFIX_CACHE_MAX = 4096

#: tiny-input cross route (see `use_tiny_cross`): when BOTH sides'
#: combined distinct keys fit here, a scored cross product (<= ~250k
#: exact evaluations, 3-4 stages) beats ANY index plan — the blocking
#: machinery's dozen-plus codegen stages cost multiples of the whole
#: query on cold sessions (measured: 64-name lv join 8.8 s cold via the
#: gram index vs 1.6 s via the cross route, identical matches).
TINY_CROSS_KEY_THRESHOLD = 1_000
#: plans estimated past this skip the deciding count job outright — the
#: estimate is the PRE-distinct scan size, so it is deliberately generous
_TINY_CROSS_BYTES_THRESHOLD = 64 << 20

_UNION_COUNT_CACHE: dict[tuple, int] = {}


def _union_count(lkeys: DataFrame, rkeys: DataFrame) -> int:
    """Combined row count of both key frames in ONE job, memoized per
    (left, right) plan pair — shared by the auto-routing gates so a query
    resolves every physical-strategy decision with at most one count."""
    try:
        cache_key = (lkeys.semanticHash(), rkeys.semanticHash())
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _UNION_COUNT_CACHE:
        return _UNION_COUNT_CACHE[cache_key]
    total = (
        lkeys.select(F.lit(1).alias("__fz_one"))
        .unionByName(rkeys.select(F.lit(1).alias("__fz_one")))
        .count()
    )
    if cache_key is not None:
        if len(_UNION_COUNT_CACHE) >= _PREFIX_CACHE_MAX:
            _UNION_COUNT_CACHE.clear()
        _UNION_COUNT_CACHE[cache_key] = total
    return total


def use_tiny_cross(lkeys: DataFrame, rkeys: DataFrame) -> bool:
    """True iff the combined distinct-key count is small enough that the
    scored cross product is the cheapest physical plan (candidate
    SUPERSET; the exact scorers keep match results identical). Stats
    first: a side estimated past the bytes gate answers False without any
    job; small plans pay one memoized count shared with
    `use_prefix_filter`."""
    sizes = [_plan_size_bytes(df) for df in (lkeys, rkeys)]
    if any(sz is None or sz > _TINY_CROSS_BYTES_THRESHOLD for sz in sizes):
        return False
    return _union_count(lkeys, rkeys) <= TINY_CROSS_KEY_THRESHOLD


def use_prefix_filter(lkeys: DataFrame, rkeys: DataFrame) -> bool:
    """Resolve prefix_mode='auto': True => run the Ed-Join/PPJoin prefix
    machinery, False => the share-any-gram join is already cheap enough.

    Decision costs nothing at scale: optimizer plan stats (propagated from
    the parquet scan sizes) short-circuit known-large inputs to the prefix
    path WITHOUT running a job; small-by-stats plans pay two cheap count
    jobs, and unknown-stats plans (e.g. LogicalRDD from createDataFrame —
    driver-resident, so counting is trivial) also resolve by counting.
    Resolved decisions are memoized per input-plan pair, so repeated joins
    over the same inputs count once.
    """
    try:
        # thresholds are part of the key: a decision is only reusable under
        # the same gate configuration
        cache_key = (
            lkeys.semanticHash(), rkeys.semanticHash(),
            PREFIX_AUTO_KEY_THRESHOLD, PREFIX_AUTO_BYTES_THRESHOLD,
        )
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _PREFIX_DECISION_CACHE:
        return _PREFIX_DECISION_CACHE[cache_key]
    sizes = [_plan_size_bytes(df) for df in (lkeys, rkeys)]
    if any(sz is not None and sz > PREFIX_AUTO_BYTES_THRESHOLD for sz in sizes):
        decision = True
    else:
        # one memoized job, shared with the tiny-cross gate
        decision = _union_count(lkeys, rkeys) >= PREFIX_AUTO_KEY_THRESHOLD
    if cache_key is not None:
        if len(_PREFIX_DECISION_CACHE) >= _PREFIX_CACHE_MAX:
            _PREFIX_DECISION_CACHE.clear()
        _PREFIX_DECISION_CACHE[cache_key] = decision
    return decision


def qgrams_col(col: str, q: int):
    """Array of character q-grams; strings shorter than q => empty array.

    Mirrors the reference's char-window extraction (utils.rs:81-99).
    """
    return F.when(
        F.length(F.col(col)) >= q,
        F.expr(f"transform(sequence(1, length({col}) - {q} + 1), i -> substring({col}, i, {q}))"),
    ).otherwise(F.array().cast("array<string>"))


def _gram_counts(keys: DataFrame, key: str, q: int) -> DataFrame:
    """(key, gram, cnt) multiset profile per distinct key value."""
    return (
        keys.select(key, F.explode(qgrams_col(key, q)).alias("__fz_g"))
        .groupBy(key, "__fz_g")
        .agg(F.count(F.lit(1)).alias("__fz_c"))
    )


def _count_map_col(col: str, q: int):
    """map<gram, multiset count> per key, built as pure JVM expressions.

    Sorted-run form: sort the gram array once, find the run boundaries,
    and read distinct grams + counts off them — O(g log g) per key. The
    previous form counted each distinct gram with a full-array filter,
    O(g²) per key, which dominated the ER dictionary build on document
    keys (~50 grams => ~2,700 interpreted ops per key). Map keys now come
    out SORTED instead of in first-occurrence order; every consumer
    treats the map as a multiset (keyed lookups, order-insensitive
    joins/sorts, integer counts exact either way) — the only observable
    drift is the summation order of downstream floating-point profile
    aggregates (norms, binned masses), all of which feed LOSSLESS bounds
    with 1e-9 slack and exact re-verification, never results."""
    ga = qgrams_col(col, q)

    # A lambda that references an outer COLUMN EXPRESSION gets that
    # expression inlined and re-evaluated per element (an early form
    # re-sorted the array once per index — measured 20x SLOWER than the
    # O(g²) filter). Bind each computed array once as a lambda variable
    # via transform over a one-element array.
    def _bind(expr, fn):
        return F.element_at(F.transform(F.array(expr), fn), 1)

    def _from_sorted(s):
        # 1-based positions where a run of equal grams ENDS in `s`
        ends = F.filter(
            F.sequence(F.lit(1), F.size(s)),
            lambda i: F.try_element_at(s, i + 1).isNull()
            | (F.element_at(s, i) != F.try_element_at(s, i + 1)),
        )

        def _from_ends(e):
            sa = F.transform(e, lambda i: F.element_at(s, i))
            counts = F.zip_with(
                e,
                F.concat(
                    F.array(F.lit(0)),
                    F.slice(e, 1, F.greatest(F.size(e) - 1, F.lit(0))),
                ),
                lambda x, p: x - p,
            )
            return F.map_from_arrays(sa, counts)

        return _bind(ends, _from_ends)

    return F.when(
        F.length(F.col(col)) >= q, _bind(F.array_sort(ga), _from_sorted)
    ).otherwise(
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<int>")
        )
    )


def _rarity_prefix_tokens(
    lkeys: DataFrame, rkeys: DataFrame, lkey: str, rkey: str, q: int, plen
):
    """(l_prefix, r_prefix) token frames for prefix-filtered candidate joins.

    Each key's distinct grams are ranked by GLOBAL rarity (document
    frequency over BOTH sides — the prefix theorem needs one shared total
    order); only the first `plen(n)` grams per key survive, where `plen`
    maps the distinct-gram count column to the admissible prefix length.
    Hot grams are the most frequent, so they sort last and almost never
    land in a prefix — THE property that keeps the candidate equi-join
    sub-quadratic under power-law gram frequencies (Chaudhuri et al.
    ICDE'06; Xiao et al. WWW'08/VLDB'08).
    """
    lx = lkeys.select(lkey, F.explode(F.array_distinct(qgrams_col(lkey, q))).alias("__fz_g"))
    rx = rkeys.select(rkey, F.explode(F.array_distinct(qgrams_col(rkey, q))).alias("__fz_g"))
    gram_df = (
        lx.select("__fz_g")
        .unionByName(rx.select("__fz_g"))
        .groupBy("__fz_g")
        .agg(F.count(F.lit(1)).alias("__fz_df"))
    )

    def _prefix(ex: DataFrame, key: str) -> DataFrame:
        agg = (
            ex.join(gram_df, "__fz_g")
            .groupBy(key)
            .agg(F.array_sort(F.collect_list(F.struct("__fz_df", "__fz_g"))).alias("__fz_s"))
        )
        n = F.size("__fz_s")
        return agg.select(
            key, F.explode(F.slice("__fz_s", 1, plen(n).cast("int"))).alias("__fz_e")
        ).select(key, F.col("__fz_e.__fz_g").alias("__fz_g"))

    return _prefix(lx, lkey), _prefix(rx, rkey)


def edit_candidates(
    lkeys: DataFrame,
    rkeys: DataFrame,
    lkey: str,
    rkey: str,
    max_distance: float,
    method: str = "levenshtein",
    q: int = 2,
    gram_filter: bool = True,
    prefix_mode: str = "auto",
) -> DataFrame:
    """Candidates for edit-distance methods (lv/osa/dl/lcs/hamming).

    Sound two-path blocking:
    - SHORT pairs (both sides shorter than q + q*tau): length-band equi-join
      — char-length superset of the reference's byte-length band
      (levenshtein.rs:62-64), never fewer candidates.
    - LONG pairs: q-gram count filtering. A Levenshtein edit destroys at
      most q q-grams, so a pair within lv distance tau shares
      >= max(|a|,|b|) - q + 1 - q*tau q-grams (Gravano et al., VLDB'01).
      A TRANSPOSITION destroys up to q+1 grams ("Liam"/"Laim" share zero
      2-grams), so OSA/DL use damage (q+1) per edit.

    The long path has two result-identical physical strategies, chosen by
    `prefix_mode` ('auto' routes by input size, see `use_prefix_filter`):
    - 'simple': share-any-gram inverted-index join + SUM(min(count))
      threshold — two shuffles, the fastest plan when the input is small.
    - 'prefix': Ed-Join prefix filtering (Xiao et al. VLDB'08) — a pair
      within edit distance tau keeps all but <= damage*tau of either side's
      distinct grams, so their rarity-ordered prefixes of length
      damage*tau + 1 must intersect; hot grams (power-law!) sort last and
      stay out of prefixes, so the candidate equi-join stays sub-quadratic
      under hot grams. The multiset count bound is then verified per
      candidate over precomputed count maps.

    Returns distinct (lkey, rkey) pairs.
    """
    tau = int(max_distance)
    damage = (q + 1) if method in ("osa", "damerau_levenshtein", "dl") else q
    l = lkeys.select(lkey).withColumn("__fz_ll", F.length(lkey))
    r = rkeys.select(rkey).withColumn("__fz_rl", F.length(rkey))

    if method == "hamming":
        # unequal lengths never match (hamming.rs:26-31): exact-length block
        return l.join(r, F.col("__fz_ll") == F.col("__fz_rl")).select(lkey, rkey)

    if not gram_filter:
        le = l.withColumn(
            "__fz_bl", F.explode(F.sequence(F.col("__fz_ll") - tau, F.col("__fz_ll") + tau))
        )
        return le.join(r, F.col("__fz_bl") == F.col("__fz_rl")).select(lkey, rkey)

    short_cut = q + damage * tau  # strings >= this length are prunable by grams

    # short path: band join restricted to both-short keys
    ls = l.filter(F.col("__fz_ll") < short_cut).withColumn(
        "__fz_bl", F.explode(F.sequence(F.col("__fz_ll") - tau, F.col("__fz_ll") + tau))
    )
    rs = r.filter(F.col("__fz_rl") < short_cut)
    short_pairs = ls.join(rs, F.col("__fz_bl") == F.col("__fz_rl")).select(lkey, rkey)

    if prefix_mode == "auto":
        prefix_mode = "prefix" if use_prefix_filter(lkeys, rkeys) else "simple"

    if prefix_mode == "simple":
        # share-any-gram inverted index + SUM(min(count)) threshold
        lg = _gram_counts(lkeys, lkey, q).withColumnRenamed("__fz_c", "__fz_cl")
        rg = _gram_counts(rkeys, rkey, q).withColumnRenamed("__fz_c", "__fz_cr")
        shared = (
            lg.join(rg, "__fz_g")
            .groupBy(lkey, rkey)
            .agg(F.sum(F.least("__fz_cl", "__fz_cr")).alias("__fz_shared"))
        )
        long_pairs = (
            shared.withColumn("__fz_ll", F.length(lkey))
            .withColumn("__fz_rl", F.length(rkey))
            .filter(F.greatest("__fz_ll", "__fz_rl") >= short_cut)
            .filter(F.abs(F.col("__fz_ll") - F.col("__fz_rl")) <= tau)
            .filter(
                F.col("__fz_shared")
                >= F.greatest("__fz_ll", "__fz_rl") - q + 1 - damage * tau
            )
            .select(lkey, rkey)
        )
        return short_pairs.unionByName(long_pairs)

    lp, rp = _rarity_prefix_tokens(
        lkeys, rkeys, lkey, rkey, q, lambda n: F.least(n, F.lit(damage * tau + 1))
    )
    cand0 = lp.join(rp, "__fz_g").select(lkey, rkey).distinct()
    lprof = lkeys.select(
        lkey,
        F.array_distinct(qgrams_col(lkey, q)).alias("__fz_sa"),
        _count_map_col(lkey, q).alias("__fz_ml"),
        F.length(lkey).alias("__fz_ll"),
    )
    rprof = rkeys.select(
        rkey,
        F.array_distinct(qgrams_col(rkey, q)).alias("__fz_sb"),
        _count_map_col(rkey, q).alias("__fz_mr"),
        F.length(rkey).alias("__fz_rl"),
    )
    shared = F.aggregate(
        F.array_intersect("__fz_sa", "__fz_sb"),
        F.lit(0),
        lambda acc, g: acc
        + F.least(F.element_at("__fz_ml", g), F.element_at("__fz_mr", g)),
    )
    long_pairs = (
        cand0.join(lprof, lkey)
        .join(rprof, rkey)
        .filter(F.greatest("__fz_ll", "__fz_rl") >= short_cut)
        .filter(F.abs(F.col("__fz_ll") - F.col("__fz_rl")) <= tau)
        .filter(shared >= F.greatest("__fz_ll", "__fz_rl") - q + 1 - damage * tau)
        .select(lkey, rkey)
    )
    return short_pairs.unionByName(long_pairs)


def ngram_candidates(
    lkeys: DataFrame,
    rkeys: DataFrame,
    lkey: str,
    rkey: str,
    method: str,
    max_distance: float,
    q: int,
    prefix_mode: str = "auto",
) -> DataFrame:
    """Candidates for qgram/cosine/jaccard profile distances.

    Core: inverted-index join on distinct grams (the reference's jaccard
    index, jaccard.rs:118-158) + method-specific small/empty-profile blocks
    so semantics on short strings survive (SURVEY.md §2.6 #8):
    - jaccard: both-empty profiles => dist 0.0 -> always candidates;
      plus size-bound prune 1 - min/max > tau  (jaccard.rs:169-177).
    - cosine: empty profile => dist 1.0, only reachable when tau >= 1 — and
      then EVERY pair matches, so candidates degenerate to the cross join.
    - qgram: pairs with no shared gram have dist n1+n2; include the
      small-profile cross block (n1 + n2 <= tau).

    `prefix_mode` ('auto' | 'prefix' | 'simple') picks between the
    hot-gram-proof prefix-filtered plans (PPJoin for jaccard/qgram, weighted
    AllPairs for cosine) and the round-2 share-any-gram join; the candidate
    sets differ but the post-verification MATCHES are identical, and 'auto'
    routes small inputs to the cheaper simple plan (`use_prefix_filter`).
    """
    if method == "cosine" and max_distance >= 1.0:
        return lkeys.select(lkey).crossJoin(rkeys.select(rkey))

    if prefix_mode == "auto":
        prefix_mode = "prefix" if use_prefix_filter(lkeys, rkeys) else "simple"

    lsets = lkeys.select(lkey, F.array_distinct(qgrams_col(lkey, q)).alias("__fz_gs"))
    rsets = rkeys.select(rkey, F.array_distinct(qgrams_col(rkey, q)).alias("__fz_gs2"))

    if method == "jaccard" and max_distance < 1.0 and prefix_mode == "prefix":
        # PREFIX-FILTERED index (PPJoin): jaccard_sim >= t = 1 - tau forces
        # the rarity-ordered prefixes (first n - ceil(t*n) + 1 grams) to
        # intersect — lossless for t > 0 and hot-gram-proof, unlike the
        # share-any-gram join. (At tau >= 1 the share-any-gram path below
        # keeps the reference's quirk: pairs with NO shared gram sit at
        # dist exactly 1.0 and are not emitted, jaccard.rs:118-158.)
        t = 1.0 - max_distance
        lp, rp = _rarity_prefix_tokens(
            lkeys, rkeys, lkey, rkey, q, lambda n: n - F.ceil(F.lit(t) * n) + 1
        )
        cand = lp.join(rp, "__fz_g").select(lkey, rkey).distinct()
        ln = lsets.select(lkey, F.size("__fz_gs").alias("__fz_nl"))
        rn = rsets.select(rkey, F.size("__fz_gs2").alias("__fz_nr"))
        pairs = (
            cand.join(ln, lkey)
            .join(rn, rkey)
            # size-bound prune: best-case distance 1 - min/max must be <= tau
            .filter(
                F.lit(1.0)
                - F.least("__fz_nl", "__fz_nr") / F.greatest("__fz_nl", "__fz_nr")
                <= max_distance
            )
            .select(lkey, rkey)
        )
        return pairs.unionByName(_empty_profile_pairs(lsets, rsets, lkey, rkey, q))

    lx = lsets.select(lkey, F.size("__fz_gs").alias("__fz_nl"), F.explode("__fz_gs").alias("__fz_g"))
    rx = rsets.select(rkey, F.size("__fz_gs2").alias("__fz_nr"), F.explode("__fz_gs2").alias("__fz_g"))
    pairs = lx.join(rx, "__fz_g").select(lkey, rkey, "__fz_nl", "__fz_nr").distinct()

    if method == "jaccard":
        # reached at tau >= 1 (every shared-gram pair matches; size bound
        # vacuous) or in 'simple' mode (small input: share-any-gram join)
        pairs = pairs.filter(
            F.lit(1.0)
            - F.least("__fz_nl", "__fz_nr") / F.greatest("__fz_nl", "__fz_nr")
            <= max_distance
        )
        extra = _empty_profile_pairs(lsets, rsets, lkey, rkey, q)
        return pairs.select(lkey, rkey).unionByName(extra)

    if method == "qgram":
        # total-count profiles (multiset sizes), not distinct sizes
        lc = lkeys.select(lkey, F.size(qgrams_col(lkey, q)).alias("__fz_tl"))
        rc = rkeys.select(rkey, F.size(qgrams_col(rkey, q)).alias("__fz_tr"))
        tau = max_distance
        # small-profile block: pairs whose profiles are small enough to match
        # with NO shared gram (dist = t1 + t2 <= tau). Joined on the
        # data-derived floor(t/(tau+1)) (identically 0 for them) so Catalyst
        # plans a hash join, not a BNLJ; the pair volume is the true result.
        zb = lambda c: F.floor(F.col(c) / F.lit(int(tau) + 1))  # noqa: E731
        small = (
            lc.filter(F.col("__fz_tl") <= tau)
            .withColumn("__fz_zb", zb("__fz_tl"))
            .join(
                rc.filter(F.col("__fz_tr") <= tau).withColumn("__fz_zb", zb("__fz_tr")),
                "__fz_zb",
            )
            .filter(F.col("__fz_tl") + F.col("__fz_tr") <= tau)
            .select(lkey, rkey)
        )
        if prefix_mode == "simple":
            cand = pairs.select(lkey, rkey)
        else:
            # PREFIX-FILTERED index: each distinct gram missing from the
            # other side contributes >= 1 to the qgram distance, so dist <=
            # tau bounds either side's distinct-set difference by tau —
            # rarity-ordered prefixes of length tau + 1 must intersect
            # (lossless; pairs with NO shared gram have dist T1 + T2,
            # covered by the `small` block).
            lp, rp = _rarity_prefix_tokens(
                lkeys, rkeys, lkey, rkey, q, lambda n: F.least(n, F.lit(int(tau) + 1))
            )
            cand = lp.join(rp, "__fz_g").select(lkey, rkey).distinct()
        # prune: qgram dist >= |t1 - t2|
        sized = (
            cand.join(lc, lkey)
            .join(rc, rkey)
            .filter(F.abs(F.col("__fz_tl") - F.col("__fz_tr")) <= tau)
            .select(lkey, rkey)
        )
        return sized.unionByName(small).distinct()

    # cosine (tau < 1)
    if prefix_mode == "simple":
        # small input: shared-gram pairs (the reference's index shape,
        # jaccard.rs:118-177 applied to cosine)
        return pairs.select(lkey, rkey)
    return _cosine_prefix_candidates(lkeys, rkeys, lkey, rkey, max_distance, q)


def _head_len(s_col, b_field: str, sq_field: str, t_eff: float, t_sq: float):
    """Count of positions in the sorted struct array whose RUNNING bound
    sums stay admissible: position i is counted iff cum(b)[0..i] < t_eff
    OR cum(sq)[0..i] < t_sq. One O(g) aggregate carrying (cum_b, cum_sq,
    count) — the previous form built two cumulative-sum ARRAYS by
    per-element concat, O(g²) copies per key (measured as a double-digit
    share of the cosine candidate stage at document gram counts). The
    additions run in the same element order, so the counted positions are
    bit-identical."""
    return F.aggregate(
        s_col,
        F.struct(
            F.lit(0.0).alias("cb"), F.lit(0.0).alias("cq"),
            F.lit(0).cast("int").alias("p"),
        ),
        lambda acc, x: F.struct(
            (acc["cb"] + x[b_field]).alias("cb"),
            (acc["cq"] + x[sq_field]).alias("cq"),
            (
                acc["p"]
                + F.when(
                    ((acc["cb"] + x[b_field]) < F.lit(t_eff))
                    | ((acc["cq"] + x[sq_field]) < F.lit(t_sq)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("int").alias("p"),
        ),
        lambda acc: acc["p"],
    )


def _popcount_cut(s_min, sig_words: int, suffix: str = "_2"):
    """Count-scaled Bloom AND+popcount pass predicate over carried
    signature words __fz_sig{i} / __fz_sig{i}<suffix>.

    A pair whose true match requires s_min shared DISTINCT grams must
    share >= max(floor(s_min/2)-2, 1) signature bits; s_min < 1 always
    passes. Same astronomically-safe collision analysis as the jaccard
    pairs-stage cut (s distinct grams collapsing into <= floor(s_min/2)-2
    of 512 bins: < 1e-12 at s_min=8, vanishing beyond; s_min <= 7 clamps
    to 1 shared bit, which one shared gram guarantees)."""
    shared = sum(
        F.bit_count(F.col(f"__fz_sig{i}").bitwiseAND(F.col(f"__fz_sig{i}{suffix}")))
        for i in range(sig_words)
    )
    return (s_min < 1) | (shared >= F.greatest(F.floor(s_min / 2) - 2, F.lit(1)))


def qgram_candidates_ids(
    prof: DataFrame,
    id_col: str,
    max_distance: float,
    prefix_mode: str = "prefix",
    sig_words: int = 0,
    max_gram_df: int | None = None,
) -> DataFrame:
    """SELF-join qgram-distance candidates over a precomputed profile frame,
    shuffling only fixed-width ids + grams — never key strings (the
    er_pipeline 100-TB path: document keys are kilobytes, ids 16 bytes).

    `prof` columns: `id_col` (orderable; er passes the 128-bit kid struct),
    `__fz_gs` (array of DISTINCT q-grams), `__fz_tc` (total multiset gram
    count). Same theorems as `ngram_candidates`'s qgram branch: each
    distinct gram missing from the other side contributes >= 1 to the
    distance, so dist <= tau forces the rarity-ordered tau+1 prefixes to
    intersect (lossless); no-shared-gram pairs (dist = tc1 + tc2) are
    covered by the small-profile block; |tc1 - tc2| <= tau prunes inline.

    sig_words > 0: `prof` also carries Bloom words __fz_sig0..N-1 (the
    pipeline's 512-bit gram signature); they ride the exploded token rows
    (the jaccard pairs-stage design — sequential shuffle bytes beat 2
    random broadcast probes per raw candidate) and the count-scaled
    popcount cut (`_popcount_cut`, s_min = ceil((n1 + n2 - tau)/2) from
    the per-missing-gram L1 cost) runs INSIDE the candidate join, before
    the pair stream hits the distinct's shuffle.

    Returns distinct (id_col, id_col+"2") pairs with id < id2.
    """
    tau = max_distance
    id2 = id_col + "2"
    sigw = [f"__fz_sig{i}" for i in range(sig_words)]
    counts = prof.select(id_col, F.col("__fz_tc"))
    zb = F.floor(F.col("__fz_tc") / F.lit(int(tau) + 1))
    small_side = counts.filter(F.col("__fz_tc") <= tau).select(
        id_col, "__fz_tc", zb.alias("__fz_zb")
    )
    small = (
        small_side.join(
            small_side.select(
                F.col(id_col).alias(id2), F.col("__fz_tc").alias("__fz_tc2"), "__fz_zb"
            ),
            "__fz_zb",
        )
        .filter((F.col(id_col) < F.col(id2)) & (F.col("__fz_tc") + F.col("__fz_tc2") <= tau))
        .select(id_col, id2)
    )
    carry = ["__fz_tc", F.size("__fz_gs").alias("__fz_n"), *sigw] if sig_words else []
    tok = prof.select(id_col, *carry, F.explode("__fz_gs").alias("__fz_g"))
    carry_names = ["__fz_tc", "__fz_n", *sigw] if sig_words else []
    if max_gram_df and prefix_mode == "simple":
        # hot-gram df cap (approximate valve — see cosine_candidates_ids);
        # __fz_n / __fz_tc / the Bloom words stay FULL-profile, so every
        # inline bound below remains valid for the true distance. The
        # prefix path applies the same cap as a free filter on its own
        # gram-df join below; only the simple path needs the keep list.
        keep = (
            tok.select("__fz_g")
            .groupBy("__fz_g")
            .agg(F.count(F.lit(1)).alias("__fz_df0"))
            .where(F.col("__fz_df0") <= max_gram_df)
            .select("__fz_g")
        )
        tok = tok.join(F.broadcast(keep), "__fz_g")
    if prefix_mode == "simple":
        lp = tok
    else:
        gram_df = tok.select(id_col, "__fz_g").groupBy("__fz_g").agg(
            F.count(F.lit(1)).alias("__fz_df")
        )
        ranked = tok.join(gram_df, "__fz_g")
        if max_gram_df:
            # free cap (see cosine_candidates_ids): surviving grams keep
            # the same df, every profile stat stays full-profile
            ranked = ranked.where(F.col("__fz_df") <= max_gram_df)
        agg = (
            ranked
            .groupBy(id_col)
            .agg(
                F.array_sort(F.collect_list(F.struct("__fz_df", "__fz_g"))).alias("__fz_s"),
                *[F.first(c).alias(c) for c in carry_names],
            )
        )
        plen = F.least(F.size("__fz_s"), F.lit(int(tau) + 1)).cast("int")
        lp = agg.select(
            id_col, *carry_names, F.explode(F.slice("__fz_s", 1, plen)).alias("__fz_e")
        ).select(id_col, *carry_names, F.col("__fz_e.__fz_g").alias("__fz_g"))
    if sig_words:
        ren = {id_col: id2, **{c: c + "_2" for c in carry_names}}
        rp = lp.select(
            [F.col(c).alias(ren.get(c, c)) for c in lp.columns]
        )
        s_min = F.ceil(
            (F.col("__fz_n") + F.col("__fz_n_2") - F.lit(float(tau))) / 2 - F.lit(1e-9)
        )
        return (
            lp.join(rp, "__fz_g")
            .where(
                (F.col(id_col) < F.col(id2))
                & (F.abs(F.col("__fz_tc") - F.col("__fz_tc_2")) <= tau)
                & _popcount_cut(s_min, sig_words)
            )
            .select(id_col, id2)
            .unionByName(small)
            .distinct()
        )
    cand = (
        lp.join(lp.select(F.col(id_col).alias(id2), "__fz_g"), "__fz_g")
        .where(F.col(id_col) < F.col(id2))
        .select(id_col, id2)
        .distinct()
    )
    sized = (
        cand.join(counts, id_col)
        .join(
            counts.select(F.col(id_col).alias(id2), F.col("__fz_tc").alias("__fz_tc2")),
            id2,
        )
        .filter(F.abs(F.col("__fz_tc") - F.col("__fz_tc2")) <= tau)
        .select(id_col, id2)
    )
    return sized.unionByName(small).distinct()


def cosine_candidates_ids(
    prof: DataFrame,
    id_col: str,
    max_distance: float,
    prefix_mode: str = "prefix",
    sig_words: int = 0,
    max_gram_df: int | None = None,
    bin_words: int = 0,
) -> DataFrame:
    """SELF-join multiset-cosine candidates over a precomputed profile
    frame — the id-keyed twin of `_cosine_prefix_candidates` (weighted
    AllPairs, Bayardo WWW'07); shuffles ids + grams, never key strings.

    `prof` columns: `id_col` (orderable), `__fz_cm` (map gram -> multiset
    count). prefix mode joins GLOBAL-ORDER PREFIX x PREFIX (see the inline
    derivation at the join below) — r6 change from the r5 all-tokens x
    greedy-suffix form: the shared total order lets the join keep one
    ordered direction (id < id2) and cuts the hot-gram join terms from
    df(g)·df_kept(g) to df_kept(g)², at the price of a head-constrained
    (instead of per-key greedy knapsack) unindex set. Empty profiles have
    no tokens and cosine dist 1.0 — unreachable at tau < 1 (callers
    refuse tau >= 1).

    sig_words > 0: `prof` also carries Bloom words __fz_sig0..N-1; they
    ride the token rows and the count-scaled popcount cut
    (`_popcount_cut`, s_min = ceil(t*nrm1*nrm2/(cmax1*cmax2)) from
    dot <= s*cmax1*cmax2) runs INSIDE the candidate join, before the
    pair stream hits the distinct's shuffle.

    bin_words > 0 (requires sig_words): the JOIN-TIME BIN BOUND — the
    edges stage's 128-bin gram-mass refine at reduced resolution, moved
    INSIDE the candidate join. Each key carries `bin_words` pre-sqrt'd
    per-bin L2 masses of its normalized gram weights (bin = xxhash64(g)
    mod bin_words, computed map-side per key, riding the token rows like
    the Bloom words), and per joined row

        dot(x̂, ŷ) = Σ_k Σ_{g in bin k} x̂_g ŷ_g <= Σ_k ‖x̂_k‖·‖ŷ_k‖

    (per-bin Cauchy-Schwarz) — rows with bound < t die inside the join.
    The bound is a PAIR property (same value on every duplicate row), so
    a pruned pair loses ALL its rows before the distinct's exchange: this
    attacks the candidate-distinct sort spill directly, unlike per-row
    positional bounds (measured r6: PPJoin-style positional prefix/suffix
    bounds pruned 6 of 3.64M candidate pairs on the er-cosine corpus and
    cost 3x pairs-stage wall from the probe-side agg they require —
    rejected; see BENCH/BASELINE.md negative results).

    Returns distinct (id_col, id_col+"2") pairs with id < id2.
    """
    if max_distance >= 1.0:
        raise ValueError("cosine_candidates_ids requires max_distance < 1")
    id2 = id_col + "2"
    t = 1.0 - float(max_distance)
    if bin_words and not sig_words:
        raise ValueError("bin_words requires sig_words (the er signature path)")
    sigw = [f"__fz_sig{i}" for i in range(sig_words)]
    binc = ["__fz_bins"] if bin_words else []
    stat_names = ["__fz_nrm", "__fz_cx", *sigw, *binc] if sig_words else []
    nrm = F.sqrt(
        F.aggregate(
            F.map_values("__fz_cm").cast("array<double>"),
            F.lit(0.0),
            lambda acc, c: acc + c * c,
        )
    )
    carry0 = (
        [F.array_max(F.map_values("__fz_cm")).cast("double").alias("__fz_cx"), *sigw]
        if sig_words
        else []
    )
    if bin_words:
        # pre-sqrt'd per-bin L2 masses of the key's NORMALIZED weights —
        # one O(bin_words * g) map-side expression per key; the division
        # by the norm distributes out of the per-bin sums
        bins = F.transform(
            F.sequence(F.lit(0), F.lit(bin_words - 1)),
            lambda k: F.sqrt(
                F.aggregate(
                    F.map_entries("__fz_cm"),
                    F.lit(0.0),
                    lambda acc, e: acc
                    + F.when(
                        F.pmod(F.xxhash64(e["key"]), F.lit(bin_words)) == k,
                        e["value"].cast("double") * e["value"].cast("double"),
                    ).otherwise(F.lit(0.0)),
                )
            )
            / nrm,
        )
        carry0 = [*carry0, bins.alias("__fz_bins")]
    # prefix mode ships only (id, gram, weight) through the stats join and
    # the prefix groupBy; the per-key stats (norm, cmax, Bloom words, bins)
    # re-attach ONCE per key after the aggregation — carrying ~100 B of
    # stat payload on every token row through two exchanges was measurable
    # against the whole builder wall. The simple path still carries them
    # (its candidate join reads stats straight off the token rows).
    tok = (
        prof.select(
            id_col,
            F.explode("__fz_cm").alias("__fz_g", "__fz_c"),
            nrm.alias("__fz_nrm"),
            *(carry0 if prefix_mode == "simple" else []),
        )
        .select(
            id_col,
            "__fz_g",
            (F.col("__fz_c") / F.col("__fz_nrm")).alias("__fz_w"),
            *(stat_names if prefix_mode == "simple" else []),
        )
    )
    if max_gram_df and prefix_mode == "simple":
        # hot-gram df cap (approximate valve, same contract as the
        # jaccard path): grams hotter than the cap are dropped from BOTH
        # the probe and index token streams — a pair whose entire overlap
        # was capped boilerplate is the caller's sorted-neighborhood
        # pass's job. The keep-list is bounded by the distinct-gram count
        # (for char q-grams, by alphabet^q), so the broadcast is safe at
        # any corpus size. Only the simple path needs this extra
        # groupBy + broadcast probe; the prefix path below already joins
        # per-gram stats carrying df and applies the cap as a free filter
        # (measured: the keep-join DOUBLED the capped builder's wall at
        # 50k keys to drop one gram).
        keep = (
            tok.groupBy("__fz_g")
            .agg(F.count(F.lit(1)).alias("__fz_df0"))
            .where(F.col("__fz_df0") <= max_gram_df)
            .select("__fz_g")
        )
        tok = tok.join(F.broadcast(keep), "__fz_g")
    if prefix_mode == "simple":
        indexed = tok.select(
            F.col(id_col).alias(id2),
            "__fz_g",
            *[F.col(c).alias(c + "_2") for c in stat_names],
        )
        joined = tok.select(id_col, "__fz_g", *stat_names).join(indexed, "__fz_g").where(
            F.col(id_col) != F.col(id2)
        )
    else:
        # GLOBAL-ORDER prefix x prefix self-join (Bayardo WWW'07 self-join
        # form; Vernica et al. SIGMOD'10 for the distributed shape): one
        # shared total order — hot grams FIRST, i.e. (-df, g) ascending —
        # and per key the maximal hot HEAD whose unindex bounds stay under
        # t (same two lossless budgets as before: running max-weight dot
        # Σ mw(g)·x̂_g < t, OR running L2 mass ‖x̂_head‖² < t²) is dropped;
        # the rare tail is the key's PREFIX. For a true pair, its rarest
        # common gram g* must sit in BOTH prefixes (if g* fell in either
        # key's hot head, every common gram would too — the order is
        # shared — and that head's own budget caps the similarity under
        # t), so prefix x prefix is a lossless candidate superset. vs the
        # r5 all-tokens x suffix join this cuts the raw joined-row volume
        # from Σ_g df(g)·df_kept(g) to Σ_g df_kept(g)² AND the per-pair
        # duplicate factor to the common-prefix gram count — the
        # join-time attack on the candidate-distinct sort spill (the 200k
        # er-cosine disk envelope).
        t_eff = (1.0 - float(max_distance)) - 1e-9
        t_sq = t_eff * t_eff
        stats = tok.groupBy("__fz_g").agg(
            F.max("__fz_w").alias("__fz_mw"), F.count(F.lit(1)).alias("__fz_df")
        )
        rj = tok.join(stats, "__fz_g")
        if max_gram_df:
            # the cap rides the stats join for free: dropping a capped
            # gram's rows HERE leaves every surviving gram's df/mw and
            # every key's norm/weights untouched, so the kept prefixes are
            # bit-identical to filtering the token stream up front — minus
            # the extra groupBy + broadcast probe that needed
            rj = rj.where(F.col("__fz_df") <= max_gram_df)
        rj = rj.select(
            id_col,
            "__fz_g",
            (F.col("__fz_w") * F.col("__fz_mw")).alias("__fz_b"),
            (F.col("__fz_w") * F.col("__fz_w")).alias("__fz_sq"),
            "__fz_df",
        )
        agg = rj.groupBy(id_col).agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("__fz_df")).alias("nd"),  # hot first
                        F.col("__fz_g").alias("g"),
                        F.col("__fz_b").alias("b"),
                        F.col("__fz_sq").alias("sq"),
                    )
                )
            ).alias("__fz_s"),
        )
        if stat_names:
            # per-key stats re-attach here, once per key (no broadcast
            # hint: the stat frame is one narrow row per key off the
            # caller's cached profile — AQE broadcasts it when small and
            # falls back to a bounded shuffle join at scale)
            statf = prof.select(
                id_col, nrm.alias("__fz_nrm"), *carry0
            )
            agg = agg.join(statf, id_col)

        p = _head_len(F.col("__fz_s"), "b", "sq", t_eff, t_sq)
        kept = agg.select(
            id_col,
            *stat_names,
            F.explode(
                F.slice("__fz_s", p + 1, F.greatest(F.size("__fz_s") - p, F.lit(0)))
            ).alias("__fz_e"),
        ).select(id_col, *stat_names, F.col("__fz_e.g").alias("__fz_g"))
        right = kept.select(
            F.col(id_col).alias(id2),
            *[F.col(c).alias(c + "_2") for c in stat_names],
            "__fz_g",
        )
        # id < id2, not id != id2: the symmetric kept x kept join finds
        # every pair at g* in BOTH directions, so keeping one ordered
        # direction is lossless and HALVES the pre-distinct row volume
        # (the r5 all-tokens x suffix join only guaranteed >= 1 direction
        # and had to keep both)
        joined = kept.join(right, "__fz_g").where(F.col(id_col) < F.col(id2))
    if sig_words:
        s_min = F.ceil(
            F.lit(t) * F.col("__fz_nrm") * F.col("__fz_nrm_2")
            / (F.col("__fz_cx") * F.col("__fz_cx_2"))
            - F.lit(1e-9)
        )
        joined = joined.where(_popcount_cut(s_min, sig_words))
    if bin_words:
        bin_dot = F.aggregate(
            F.zip_with("__fz_bins", "__fz_bins_2", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        joined = joined.where(bin_dot >= F.lit(t - 1e-9))
    return (
        joined.select(
            F.least(id_col, id2).alias(id_col), F.greatest(id_col, id2).alias(id2)
        )
        .distinct()
    )


def _cosine_prefix_candidates(
    lkeys: DataFrame,
    rkeys: DataFrame,
    lkey: str,
    rkey: str,
    max_distance: float,
    q: int,
) -> DataFrame:
    """Weighted AllPairs prefix filtering for multiset-cosine blocking
    (Bayardo, Ma & Srikant, WWW'07), asymmetric index formulation.

    Let x̂ = x/||x||₂ be a key's L2-normalized gram-count vector and
    mw(g) = max over LEFT keys of x̂_g. For each RIGHT key ŷ, partition its
    LEFT-PRESENT grams into UNINDEXED ∪ INDEXED such that

        Σ_{g ∈ U} mw(g) · ŷ_g < t   OR   ||ŷ_U||₂ < t      (t = 1 - tau).

    Either bound makes unindexing U lossless: if a pair (x, y) shares no
    INDEXED gram, its similarity is Σ_{g ∈ U} x̂_g ŷ_g, which is at most
    the max-weight sum (x̂_g <= mw(g)) and at most ||x̂||·||ŷ_U|| = ||ŷ_U||
    (Cauchy-Schwarz restricted to U) — both < t, so every true match must
    hit the index. Grams absent from the left side contribute nothing to
    any pair and are dropped outright (free unindexing). Joining ALL left
    tokens against only the right INDEXED tokens is therefore a lossless
    candidate superset. Gram choice for U is a knapsack (value = join cost
    avoided ≈ left df): greedy by cost ratio b/(df+1) ascending, which
    unindexes hot grams early — THE property that removes the last
    quadratic blocking path under power-law gram frequencies.

    Keys whose total bound stays under t can match nothing and index
    nothing. Empty profiles (len < q) have cosine dist 1.0, unreachable at
    tau < 1 (handled by the caller's cross-join branch at tau >= 1).
    """
    t_eff = (1.0 - float(max_distance)) - 1e-9
    t_sq = t_eff * t_eff

    def _norm_tokens(keys: DataFrame, key: str) -> DataFrame:
        """(key, gram, w) with w = multiset count / L2 norm, pure JVM."""
        cm = _count_map_col(key, q)
        nrm = F.sqrt(
            F.aggregate(
                F.map_values(cm).cast("array<double>"),
                F.lit(0.0),
                lambda acc, c: acc + c * c,
            )
        )
        return (
            keys.select(key, cm.alias("__fz_cm"), nrm.alias("__fz_nrm"))
            .select(key, F.explode("__fz_cm").alias("__fz_g", "__fz_c"), "__fz_nrm")
            .select(key, "__fz_g", (F.col("__fz_c") / F.col("__fz_nrm")).alias("__fz_w"))
        )

    ltok = _norm_tokens(lkeys, lkey)
    rtok = _norm_tokens(rkeys, rkey)
    # per-gram stats over the LEFT side (the probing side): max normalized
    # weight bounds any x̂_g; df drives the greedy unindex order
    stats = ltok.groupBy("__fz_g").agg(
        F.max("__fz_w").alias("__fz_mw"), F.count(F.lit(1)).alias("__fz_df")
    )
    # inner join: left-absent grams can't contribute to any pair — dropped
    # from the index AND from the unindex budgets for free
    rj = rtok.join(stats, "__fz_g").select(
        rkey,
        "__fz_g",
        (F.col("__fz_w") * F.col("__fz_mw")).alias("__fz_b"),
        (F.col("__fz_w") * F.col("__fz_w")).alias("__fz_sq"),
        "__fz_df",
    )
    # sort by greedy cost ratio (cheap-to-unindex first), build the running
    # bounds, index the suffix past the last position where EITHER bound
    # still admits the whole head as unindexed
    agg = rj.groupBy(rkey).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (F.col("__fz_b") / (F.col("__fz_df") + 1)).alias("r"),
                    F.col("__fz_b").alias("b"),
                    F.col("__fz_sq").alias("sq"),
                    F.col("__fz_g").alias("g"),
                )
            )
        ).alias("__fz_s")
    )

    p = _head_len(F.col("__fz_s"), "b", "sq", t_eff, t_sq)
    indexed = agg.select(
        rkey,
        F.explode(F.slice("__fz_s", p + 1, F.greatest(F.size("__fz_s") - p, F.lit(0)))).alias(
            "__fz_e"
        ),
    ).select(rkey, F.col("__fz_e.g").alias("__fz_g"))
    return (
        ltok.select(lkey, "__fz_g")
        .join(indexed, "__fz_g")
        .select(lkey, rkey)
        .distinct()
    )


def _empty_profile_pairs(lsets, rsets, lkey: str, rkey: str, q: int):
    """All (l, r) pairs where BOTH gram profiles are empty (keys shorter
    than q). The pair set is a true cross product — the OUTPUT is quadratic
    in the empty-key count by definition (jaccard dist 0 for all of them) —
    but joining on the data-derived floor(len/q) (identically 0) lets
    Catalyst plan a hash join instead of a BroadcastNestedLoopJoin."""
    el = lsets.filter(F.size("__fz_gs") == 0).select(
        lkey, F.floor(F.length(lkey) / q).alias("__fz_zb")
    )
    er = rsets.filter(F.size("__fz_gs2") == 0).select(
        rkey, F.floor(F.length(rkey) / q).alias("__fz_zb")
    )
    return el.join(er, "__fz_zb").select(lkey, rkey)


def cross_candidates(lkeys: DataFrame, rkeys: DataFrame, lkey: str, rkey: str) -> DataFrame:
    """Full cross product of distinct keys — jaro/jw (the reference also has
    no pruning for jw, jaro_winkler.rs:98-133). Keep inputs deduped!"""
    return lkeys.select(lkey).crossJoin(rkeys.select(rkey))


def char_occurrence_tokens(col: str):
    """(char, occurrence) token ARRAY for a string column, one pure-JVM
    projection: 'aab' -> ['a#1', 'a#2', 'b#1'] (order irrelevant — the
    multiset of chars becomes a SET of tokens, so downstream prefix joins
    stay equi-joins). The map-side twin of `jaro_candidates._tokens`, used
    by the id-keyed jw blocking path so tokenization happens ONCE on the
    cached profile frame and no key string ever enters a blocking shuffle."""
    cm = _count_map_col(col, 1)
    return F.flatten(
        F.transform(
            F.map_entries(cm),
            lambda e: F.transform(
                F.sequence(F.lit(1), e["value"]),
                lambda k: F.concat(e["key"], F.lit("#"), k.cast("string")),
            ),
        )
    )


def jaro_candidates_ids(
    prof: DataFrame,
    id_col: str,
    max_distance: float,
    prefix_weight: float = 0.0,
    max_token_df: int | None = None,
) -> DataFrame:
    """SELF-join jaro/jw candidates over a precomputed profile frame — the
    id-keyed twin of `jaro_candidates` (same (char, occurrence)-token
    prefix theorem and jaro count bound; see that docstring for the
    derivation). Shuffles only fixed-width ids + short char tokens +
    lengths, never key strings — the er_pipeline 100-TB path (VERDICT r5
    'what's wrong' #1: kilobyte document keys in a blocking shuffle carry
    10-50x the bytes of a 16-byte kid).

    `prof` columns: `id_col` (orderable; er passes the 128-bit kid struct),
    `__fz_kn` (int key length), `__fz_ts` (array of (char,occurrence)
    tokens from `char_occurrence_tokens` — multiset -> set). The prefix is
    built agg+slice (no window): token -> global df join, per-id
    rarity-sorted token array, slice of length n - alpha + 1.

    Self-join semantics: probe side == index side, one shared (df, token)
    total order, so the prefix-intersection theorem applies to every pair
    direction. Only valid in the provable regime (s = 1 - tau > 1/3 and
    prefix_weight >= 0 under the reference's ADDITIVE jw quirk) — raises
    outside it, because an id-keyed cross join is never the right fallback.

    Returns distinct (id_col, id_col+"2") pairs with id < id2, including
    the both-empty block (jaro dist 0).
    """
    s = 1.0 - float(max_distance)
    if s <= 1.0 / 3.0 or prefix_weight < 0:
        raise ValueError(
            "jaro_candidates_ids requires the provable regime "
            f"(1 - max_distance > 1/3 and prefix_weight >= 0); got s={s}, "
            f"prefix_weight={prefix_weight}"
        )
    id2 = id_col + "2"
    tok = prof.select(id_col, "__fz_kn", F.explode("__fz_ts").alias("__fz_t"))
    # global token rarity (single side IS the shared order for a self-join);
    # the token-df table is tiny: |alphabet| x max per-key multiplicity
    tok_df = tok.groupBy("__fz_t").agg(F.count(F.lit(1)).alias("__fz_df"))
    tj = tok.join(F.broadcast(tok_df), "__fz_t")
    if max_token_df:
        # hot-TOKEN df cap (r7; the jw twin of the qgram/cosine hot-gram
        # valve): on uniform-character corpora occurrence-1 tokens carry
        # df ~ 0.4n, making the prefix join ~n^2 REGARDLESS of ordering
        # (r6 negative result #3) — capped tokens drop out of the index
        # here, the per-key prefix widens over the SURVIVING rarest
        # tokens (a superset over survivors; plen still derives from the
        # full key length), and the caller's sorted-neighborhood pass +
        # exact verifier own the recall for capped-overlap pairs.
        # APPROXIMATE by design, like every max_gram_df valve.
        tj = tj.where(F.col("__fz_df") <= max_token_df)
    agg = (
        tj
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("__fz_df", "__fz_t"))).alias("__fz_s"),
            F.first("__fz_kn").alias("__fz_kn"),
        )
    )
    n = F.col("__fz_kn")
    # weakest admissible partner length (from min >= max*(3s-2)), then the
    # pairwise count bound alpha at that weakest partner; prefix = the
    # n - alpha + 1 globally rarest tokens
    lb_min = F.greatest(F.lit(1), F.ceil(n * F.lit(3 * s - 2)))
    alpha = F.greatest(
        F.lit(1),
        F.ceil(F.lit(3 * s - 1) * n * lb_min / (n + lb_min) - F.lit(1e-9)),
    )
    plen = F.greatest(n - alpha + 1, F.lit(1)).cast("int")
    lp = agg.select(
        id_col, "__fz_kn", F.explode(F.slice("__fz_s", 1, plen)).alias("__fz_e")
    ).select(id_col, "__fz_kn", F.col("__fz_e.__fz_t").alias("__fz_t"))
    rp = lp.select(
        F.col(id_col).alias(id2), F.col("__fz_kn").alias("__fz_kn2"), "__fz_t"
    )
    pairs = (
        lp.join(rp, "__fz_t")
        .where(F.col(id_col) < F.col(id2))
        .select(id_col, id2, "__fz_kn", "__fz_kn2")
        .distinct()
        .where(
            F.least("__fz_kn", "__fz_kn2")
            >= F.ceil(
                F.lit(3 * s - 1)
                * F.col("__fz_kn")
                * F.col("__fz_kn2")
                / (F.col("__fz_kn") + F.col("__fz_kn2"))
                - F.lit(1e-9)
            )
        )
        .select(id_col, id2)
    )
    # both-empty pairs: jaro dist 0, no tokens — equi-join on the (all-0)
    # length column so Catalyst plans a hash join, not a BNLJ
    el = prof.where(F.col("__fz_kn") == 0).select(id_col, "__fz_kn")
    empties = (
        el.join(el.select(F.col(id_col).alias(id2), "__fz_kn"), "__fz_kn")
        .where(F.col(id_col) < F.col(id2))
        .select(id_col, id2)
    )
    return pairs.unionByName(empties).distinct()


def jaro_candidates(
    lkeys: DataFrame,
    rkeys: DataFrame,
    lkey: str,
    rkey: str,
    max_distance: float,
    prefix_weight: float = 0.0,
) -> DataFrame:
    """Sound candidate pruning for jaro / jaro-winkler (replaces the cross
    join the reference uses, jaro_winkler.rs:98-133).

    Derivation: jaro_sim = (m/|a| + m/|b| + (m-t)/m)/3 with m = matched
    chars, and (m-t)/m <= 1, so jaro_sim >= s (s = 1 - max_distance) forces
        m >= (3s-1) * |a||b| / (|a|+|b|)                        (count bound)
    and m is at most the multiset char overlap sum_c min(cnt_a, cnt_b).
    The fozziejoin jw quirk ADDS the prefix term (d' = d + l*w*(1-d),
    jaro_winkler.rs:66-76), so for w >= 0 the jaro bound transfers to jw.

    Blocking = PPJoin-style prefix filtering on (char, occurrence) tokens:
    multiset overlap >= alpha implies the (globally rarity-ordered) prefixes
    of length n - alpha + 1 intersect, so a token equi-join over prefixes is
    a strict candidate superset; a per-pair count-bound filter prunes after.
    Used only when s > 1/3 (bound vacuous otherwise) and w >= 0 — the caller
    falls back to the cross join outside that regime.

    Both-empty pairs (jaro_sim = 1, dist 0) have no tokens: dedicated block.
    One-side-empty pairs have jaro_sim 0, unreachable when s > 1/3.
    """
    from pyspark.sql import Window

    s = 1.0 - float(max_distance)
    if s <= 1.0 / 3.0 or prefix_weight < 0:
        return cross_candidates(lkeys, rkeys, lkey, rkey)

    def _tokens(keys: DataFrame, key: str) -> DataFrame:
        # (key, token) with token = char + '#' + occurrence (multiset -> set)
        counts = (
            keys.select(key, F.explode(qgrams_col(key, 1)).alias("__fz_ch"))
            .groupBy(key, "__fz_ch")
            .agg(F.count(F.lit(1)).alias("__fz_c"))
        )
        return counts.select(
            key,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__fz_c")),
                    lambda k: F.concat(F.col("__fz_ch"), F.lit("#"), k.cast("string")),
                )
            ).alias("__fz_t"),
        )

    lt, rt = _tokens(lkeys, lkey), _tokens(rkeys, rkey)
    # global token rarity over BOTH sides (prefix theorem needs one shared
    # total order); the token-df table is tiny (alphabet x max multiplicity)
    tok_df = (
        lt.select("__fz_t")
        .unionByName(rt.select("__fz_t"))
        .groupBy("__fz_t")
        .agg(F.count(F.lit(1)).alias("__fz_df"))
    )

    def _prefix(toks: DataFrame, key: str) -> DataFrame:
        n = F.length(key)
        # weakest admissible partner length (from min >= max*(3s-2))
        lb_min = F.greatest(F.lit(1), F.ceil(n * F.lit(3 * s - 2)))
        alpha = F.greatest(
            F.lit(1),
            F.ceil(F.lit(3 * s - 1) * n * lb_min / (n + lb_min) - F.lit(1e-9)),
        )
        plen = F.greatest(n - alpha + 1, F.lit(1))
        w = Window.partitionBy(key).orderBy(F.col("__fz_df").asc(), F.col("__fz_t").asc())
        return (
            toks.join(F.broadcast(tok_df), "__fz_t")
            .withColumn("__fz_rn", F.row_number().over(w))
            .where(F.col("__fz_rn") <= plen)
            .select(key, "__fz_t")
        )

    pairs = (
        _prefix(lt, lkey)
        .join(_prefix(rt, rkey), "__fz_t")
        .select(lkey, rkey)
        .distinct()
        .withColumn("__fz_ll", F.length(lkey))
        .withColumn("__fz_rl", F.length(rkey))
        .where(
            F.least("__fz_ll", "__fz_rl")
            >= F.ceil(
                F.lit(3 * s - 1)
                * F.col("__fz_ll")
                * F.col("__fz_rl")
                / (F.col("__fz_ll") + F.col("__fz_rl"))
                - F.lit(1e-9)
            )
        )
        .select(lkey, rkey)
    )
    empties = (
        lkeys.select(lkey)
        .where(F.length(lkey) == 0)
        .join(
            rkeys.select(rkey).where(F.length(rkey) == 0),
            F.length(lkey) == F.length(rkey),  # both 0 — equi-join, not BNLJ
        )
        .select(lkey, rkey)
    )
    return pairs.unionByName(empties)


def band_candidates(
    lkeys: DataFrame, rkeys: DataFrame, lkey: str, rkey: str, max_distance: float
) -> DataFrame:
    """1-D numeric banding: bucket = floor(x/tau); left probes {b-1,b,b+1}.

    Mirrors difference/mod.rs:19-43; O(n+m+candidates), no cross join.
    """
    if max_distance <= 0:
        return lkeys.select(lkey).join(rkeys.select(rkey), F.col(lkey) == F.col(rkey))
    tau = float(max_distance)
    l = lkeys.select(lkey).withColumn(
        "__fz_b",
        F.explode(
            F.array(
                F.floor(F.col(lkey) / tau) - 1,
                F.floor(F.col(lkey) / tau),
                F.floor(F.col(lkey) / tau) + 1,
            )
        ),
    )
    r = rkeys.select(rkey).withColumn("__fz_rb", F.floor(F.col(rkey) / tau))
    return l.join(r, F.col("__fz_b") == F.col("__fz_rb")).select(lkey, rkey)


def grid_candidates(
    lkeys: DataFrame,
    rkeys: DataFrame,
    lcols: list[str],
    rcols: list[str],
    max_distance: float,
) -> DataFrame:
    """k-D grid-cell blocking for distance joins: any pair with
    L1/L2 distance <= tau satisfies |x_i - y_i| <= tau per dimension, so
    cell-join on floor(x/tau) with +-1 probes per dim is a sound superset.
    Replaces the reference's O(n*m) nested loop (distance/mod.rs:94-129).
    """
    if max_distance <= 0:
        cond = [F.col(lc) == F.col(rc) for lc, rc in zip(lcols, rcols)]
        return lkeys.join(rkeys, cond).select(*lcols, *rcols)
    tau = float(max_distance)
    l = lkeys.select(*lcols)
    for i, lc in enumerate(lcols):
        cell = F.floor(F.col(lc) / tau)
        l = l.withColumn(f"__fz_c{i}", F.explode(F.array(cell - 1, cell, cell + 1)))
    r = rkeys.select(*rcols)
    cond = [F.col(f"__fz_c{i}") == F.floor(F.col(rc) / tau) for i, rc in enumerate(rcols)]
    return l.join(r, cond).select(*lcols, *rcols)


def sorted_neighborhood_candidates(
    keys: DataFrame,
    key_col: str,
    window: int = 10,
    sort_expr=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking: pair every key with its `window`
    successors in sort order. Approximate-recall blocking (classic SN,
    Hernandez & Stolfo SIGMOD'95) that complements q-gram indexing — it
    catches pairs whose shared grams were all capped/hot.

    Scalable global ranking WITHOUT a single-partition sort: bucket each
    key by DETERMINISTIC sort-range boundaries (sampled quantiles of the
    sort key, collected once and baked into the plan as literals), rank
    within each bucket, then add per-bucket offsets (a tiny cumulative
    sum). The neighbor join is a band equi-join on floor(rank/window) +-1
    probes — no self cross join, no global window operator.

    Why literal boundaries instead of repartitionByRange +
    spark_partition_id: the bucket id feeds TWO consumers (bucket counts
    and ranked rows), and Spark compiles each into its own range exchange
    whose RangePartitioner samples boundaries with an RDD-id-dependent
    seed — at large inputs the two branches can see DIFFERENT partition
    boundaries, silently corrupting the global ranks. A literal-boundary
    bucket expression evaluates identically in every branch by
    construction, with the same quantile-sampling quality.

    Returns (key_col, key_col+"2") pairs with rank distance in [1, window].
    """
    from pyspark.sql import Window

    sort_col = sort_expr if sort_expr is not None else F.col(key_col)
    n_parts = num_partitions or max(keys.sparkSession.sparkContext.defaultParallelism, 2)
    src = keys.select(key_col, sort_col.alias("__fz_sort"))
    n = src.count()
    frac = min(1.0, (n_parts * 20.0) / max(n, 1))
    sampled = sorted(
        r["__fz_sort"]
        for r in src.select("__fz_sort").sample(frac, seed=7).collect()
        if r["__fz_sort"] is not None
    )
    # n_parts - 1 evenly spaced boundary values (deduped; fewer buckets for
    # tiny/duplicate-heavy inputs is fine — one bucket = one sorted window)
    step = max(1, len(sampled) // n_parts)
    bounds = sorted({sampled[i] for i in range(step, len(sampled), step)})[: n_parts - 1]
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < F.col("__fz_sort")))
    else:
        pid = F.lit(0)
    parts = src.withColumn("__fz_pid", pid)
    # partition offsets as a lazy cumulative sum over the (tiny) partition
    # counts — broadcast-joined back; no driver-side collect
    counts = parts.groupBy("__fz_pid").agg(F.count(F.lit(1)).alias("__fz_n"))
    off_w = Window.orderBy("__fz_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = counts.select(
        "__fz_pid", F.coalesce(F.sum("__fz_n").over(off_w), F.lit(0)).alias("__fz_off")
    )
    w = Window.partitionBy("__fz_pid").orderBy("__fz_sort", key_col)
    ranked = (
        parts.withColumn("__fz_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "__fz_pid")
        .select(key_col, (F.col("__fz_rn") + F.col("__fz_off")).alias("__fz_rank"))
    )
    bucket = F.floor(F.col("__fz_rank") / window)
    left = ranked.withColumn("__fz_b", F.explode(F.array(bucket, bucket + 1)))
    right = ranked.select(
        F.col(key_col).alias(key_col + "2"),
        F.col("__fz_rank").alias("__fz_rank2"),
        F.floor(F.col("__fz_rank") / window).alias("__fz_b"),
    )
    return (
        left.join(right, "__fz_b")
        .where(
            (F.col("__fz_rank2") > F.col("__fz_rank"))
            & (F.col("__fz_rank2") - F.col("__fz_rank") <= window)
        )
        .select(key_col, key_col + "2")
        .distinct()
    )


def interval_bin_candidates(
    lints: DataFrame,
    rints: DataFrame,
    lcols: tuple[str, str],
    rcols: tuple[str, str],
    maxgap: float,
    bin_width: float,
) -> DataFrame:
    """Overlap-bin blocking for interval joins (replaces the reference's
    interval tree, interval/real.rs:68-90): each interval maps to the bins
    it covers; the probe (left) side is widened by maxgap + 1 so every pair
    satisfying the gap predicate shares a bin. Equi-join on bin, distinct.
    """
    ls, le_ = lcols
    rs, re_ = rcols
    g = float(max(maxgap, 0)) + 1.0  # +1 covers integer-mode gap semantics
    w = float(bin_width)
    l = lints.select(ls, le_).withColumn(
        "__fz_bin",
        F.explode(
            F.sequence(
                F.floor((F.col(ls) - g) / w).cast("long"),
                F.floor((F.col(le_) + g) / w).cast("long"),
            )
        ),
    )
    r = rints.select(rs, re_).withColumn(
        "__fz_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(rs) / w).cast("long"),
                F.floor(F.col(re_) / w).cast("long"),
            )
        ),
    )
    return l.join(r, "__fz_bin").select(ls, le_, rs, re_).distinct()
