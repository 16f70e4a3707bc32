"""NumPy-vectorized batch string-distance kernels.

The north rule mandates "batched NumPy inner loops, never per-row Python"
for pairwise scoring. These kernels run each DP over the WHOLE Arrow batch
at once: the Python-level loop is over string positions (<= max length per
batch), and every iteration is a handful of NumPy ops across all pairs —
~30-100x less interpreter overhead than the per-pair DPs in
fozzie_spark.distances, which remain as the unit-test oracle (hypothesis
property tests in tests/ pin elementwise equality between the two).

Batch protocol (applied by `batch()`):
 1. nulls -> +inf without scoring;
 2. (a, b) pairs deduped across the batch — each distinct pair scored once;
 3. a == b pairs short-circuit to 0.0 (matches the reference's equality
    fast path, jaro_winkler.rs:104-109, which SKIPS the jw prefix term);
 4. pairs with a string longer than _MAX_VEC_LEN (padding waste / memory)
    fall back to the per-pair pure-Python scorer — a rare tail;
 5. everything else goes through the vectorized kernel.

Column-scan trick making the row DP vectorizable: with
t[j] = min(non-insertion candidates for cell j) the insertion recurrence
cur[j] = min(t[j], cur[j-1] + 1) unrolls to cur[j] = j + min_{k<=j}(t[k]-k),
i.e. one np.minimum.accumulate per row (classic parallel-prefix form).

Damerau-Levenshtein (unrestricted, with the last-occurrence table) is NOT
vectorized — its d[k][l] gather is data-dependent per cell; it stays on the
pure scorer (dedup + cache still apply through `batch()`).
"""

from __future__ import annotations

import numpy as np

from fozzie_spark import distances as _pure

INF = float("inf")
_MAX_VEC_LEN = 512


def _encode(strs: list[str], pad: int) -> tuple[np.ndarray, np.ndarray]:
    """list[str] -> (codepoint matrix (P, Lmax) padded with `pad`, lengths)."""
    p = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=p)
    lmax = int(lens.max()) if p else 0
    out = np.full((p, lmax), pad, dtype=np.int32)
    for i, s in enumerate(strs):
        if s:
            out[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int32
            )
    return out, lens


def _lev_osa_kernel(a_strs, b_strs, cutoff: int, transpose: bool) -> np.ndarray:
    """Batched Levenshtein (transpose=False) / OSA (True)."""
    A, la = _encode(a_strs, -1)
    B, lb = _encode(b_strs, -2)
    p, lmax_a = A.shape
    lmax_b = B.shape[1]
    out = np.full(p, INF, dtype=np.float64)
    band_ok = np.abs(la - lb) <= cutoff

    ar = np.arange(lmax_b + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (p, lmax_b + 1)).astype(np.int32)
    prev2 = None
    fin0 = la == 0
    out[fin0] = lb[fin0]
    tf = np.empty((p, lmax_b + 1), dtype=np.int32)
    for i in range(1, lmax_a + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int32)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        if transpose and i >= 2 and lmax_b >= 2:
            cond = (A[:, i - 1 : i] == B[:, :-1]) & (A[:, i - 2 : i - 1] == B[:, 1:])
            tv = prev2[:, : lmax_b - 1] + 1
            t[:, 1:] = np.where(cond, np.minimum(t[:, 1:], tv), t[:, 1:])
        tf[:, 0] = i
        tf[:, 1:] = t
        cur = np.minimum.accumulate(tf - ar, axis=1) + ar
        fin = la == i
        if fin.any():
            out[fin] = cur[fin, lb[fin]]
        prev2 = prev
        prev = cur.copy()
    out[~band_ok] = INF
    out[out > cutoff] = INF
    return out


def _lcs_kernel(a_strs, b_strs, cutoff: int) -> np.ndarray:
    """Batched LCS distance = |a| + |b| - 2*LCS(a, b)."""
    A, la = _encode(a_strs, -1)
    B, lb = _encode(b_strs, -2)
    p, lmax_a = A.shape
    lmax_b = B.shape[1]
    lcs = np.zeros(p, dtype=np.int64)
    prev = np.zeros((p, lmax_b + 1), dtype=np.int32)
    tf = np.empty((p, lmax_b + 1), dtype=np.int32)
    for i in range(1, lmax_a + 1):
        eq = A[:, i - 1 : i] == B
        t = np.maximum(prev[:, 1:], np.where(eq, prev[:, :-1] + 1, 0))
        tf[:, 0] = 0
        tf[:, 1:] = t
        cur = np.maximum.accumulate(tf, axis=1)
        fin = la == i
        if fin.any():
            lcs[fin] = cur[fin, lb[fin]]
        prev = cur.copy()
    out = (la + lb - 2 * lcs).astype(np.float64)
    out[np.abs(la - lb) > cutoff] = INF
    out[out > cutoff] = INF
    return out


def _hamming_kernel(a_strs, b_strs, cutoff: int) -> np.ndarray:
    A, la = _encode(a_strs, -1)
    B, lb = _encode(b_strs, -2)
    width = min(A.shape[1], B.shape[1])
    cols = np.arange(width)
    diff = ((A[:, :width] != B[:, :width]) & (cols < la[:, None])).sum(axis=1).astype(np.float64)
    out = np.where(la == lb, diff, INF)
    out[out > cutoff] = INF
    return out


def _jw_pairloop_kernel(a_strs, b_strs, cutoff, prefix_weight, max_prefix) -> np.ndarray:
    """Jaro/JW is NOT numpy-vectorized: a full batched formulation was built
    and measured 1.4-3x SLOWER than the greedy per-pair matcher (the
    in-window argmax needs a (P, |b|) boolean temporary per character — the
    memory traffic swamps the interpreter saving, and the greedy loop's
    early break has no vector analog). The batch wrapper still supplies
    null handling, cross-batch pair dedup, and the equality fast path."""
    out = np.empty(len(a_strs), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_strs, b_strs)):
        out[i] = _pure._jw_pair(a, b, cutoff, prefix_weight, max_prefix)
    return out


def _batch(kernel, pure_pair_fn, left, right, *args, band_cutoff: int | None = None) -> np.ndarray:
    """Null handling + cross-batch pair dedup + equality fast path + length-
    band prefilter + long-string fallback, then ONE vectorized kernel call
    over the survivors. `band_cutoff`: edit-family length bound — pairs with
    abs(len diff) > cutoff are +inf without any DP (the same early exit the
    pure scorers take; crucial when the caller didn't pre-block)."""
    n = len(left)
    out = np.empty(n, dtype=np.float64)
    pair_index: dict[tuple[str, str], int] = {}
    uniq: list[tuple[str, str]] = []
    inv = np.empty(n, dtype=np.int64)
    for i in range(n):
        a, b = left[i], right[i]
        if a is None or b is None:
            inv[i] = -1
            continue
        key = (a, b)
        j = pair_index.get(key)
        if j is None:
            j = len(uniq)
            pair_index[key] = j
            uniq.append(key)
        inv[i] = j

    vals = np.empty(len(uniq), dtype=np.float64)
    vec_idx: list[int] = []
    for j, (a, b) in enumerate(uniq):
        if a == b:
            vals[j] = 0.0
        elif band_cutoff is not None and abs(len(a) - len(b)) > band_cutoff:
            vals[j] = INF
        elif len(a) > _MAX_VEC_LEN or len(b) > _MAX_VEC_LEN:
            vals[j] = pure_pair_fn(a, b, *args)
        else:
            vec_idx.append(j)
    if vec_idx:
        a_strs = [uniq[j][0] for j in vec_idx]
        b_strs = [uniq[j][1] for j in vec_idx]
        vals[np.asarray(vec_idx, dtype=np.int64)] = kernel(a_strs, b_strs, *args)

    null_mask = inv < 0
    out[null_mask] = INF
    out[~null_mask] = vals[inv[~null_mask]]
    return out


# -- public entry points (same signatures as fozzie_spark.distances) ---------


def levenshtein(left, right, max_distance=2.0, **kw):
    c = int(max_distance)
    return _batch(
        lambda a, b, _c: _lev_osa_kernel(a, b, _c, False),
        _pure._lev_pair, left, right, c, band_cutoff=c,
    )


def osa(left, right, max_distance=2.0, **kw):
    c = int(max_distance)
    return _batch(
        lambda a, b, _c: _lev_osa_kernel(a, b, _c, True),
        _pure._osa_pair, left, right, c, band_cutoff=c,
    )


def lcs(left, right, max_distance=2.0, **kw):
    c = int(max_distance)
    return _batch(_lcs_kernel, _pure._lcs_pair, left, right, c, band_cutoff=c)


def hamming(left, right, max_distance=2.0, **kw):
    c = int(max_distance)
    return _batch(_hamming_kernel, _pure._hamming_pair, left, right, c, band_cutoff=0)


def jaro_winkler(left, right, max_distance=1.0, prefix_weight=0.0, max_prefix=0, **kw):
    return _batch(
        _jw_pairloop_kernel,
        _pure._jw_pair,
        left,
        right,
        float(max_distance),
        float(prefix_weight),
        int(max_prefix),
    )


# -- ngram family: profiles as SORTED gram arrays + NumPy set intersection --
#
# The per-pair cost of the pure scorers is a Python dict walk over ~g grams;
# on document-sized keys (g ~ 10^3) at 10^6-7 candidate pairs that walk IS
# the er_pipeline edges stage. Here each distinct KEY is tokenized once per
# batch into (sorted unique gram array, count array) via np.unique, and each
# pair's intersection runs in C (np.intersect1d on the sorted arrays).
# Gram arrays keep the actual strings (fixed-width U<q> dtype) — exact, no
# hash-collision caveat. Float semantics match the pure scorers bit-for-bit
# (integer-valued float64 products/sums are exact below 2^53; same
# operation order in the final expression).


def _ngram_profile_cache(q: int):
    """Per-batch profile cache: distinct key -> (sorted int64 gram-code
    array, aligned float64 counts, L2 norm, total count). Grams are mapped
    to integer codes through a batch-shared vocabulary dict (exact string
    identity — no hashing), so the per-pair set intersection runs on int64
    arrays in C instead of comparing unicode."""
    cache: dict[str, tuple] = {}
    vocab: dict[str, int] = {}

    def prof(s: str):
        p = cache.get(s)
        if p is None:
            n = len(s)
            if n < q:
                u = np.empty(0, dtype=np.int64)
                c = np.empty(0, dtype=np.float64)
            else:
                counts: dict[str, int] = {}
                for i in range(n - q + 1):
                    g = s[i : i + q]
                    counts[g] = counts.get(g, 0) + 1
                codes = np.empty(len(counts), dtype=np.int64)
                cvals = np.empty(len(counts), dtype=np.float64)
                for j, (g, cnt) in enumerate(counts.items()):
                    code = vocab.get(g)
                    if code is None:
                        code = len(vocab)
                        vocab[g] = code
                    codes[j] = code
                    cvals[j] = cnt
                order = np.argsort(codes)
                u, c = codes[order], cvals[order]
            # ** 0.5, not np.sqrt: libm pow and sqrt can differ by 1 ulp —
            # the pure scorer uses ** 0.5 and equality is pinned bit-exact
            p = (u, c, float((c * c).sum()) ** 0.5, float(c.sum()))
            cache[s] = p
        return p

    prof.vocab_size = lambda: len(vocab)
    return prof


def _batch_ngram_np(left, right, q: int, method: str) -> np.ndarray:
    """Grouped-gather evaluation: unique pairs are grouped by LEFT key; per
    group the left profile is scattered into one dense float64 vector over
    the batch vocabulary, every right profile's codes gather from it in one
    concatenated numpy pass, and np.add.reduceat folds per-pair sums — a
    handful of numpy calls per left-key GROUP instead of per pair. Integer-
    valued float64 arithmetic keeps every sum exact (< 2^53), so results
    are bit-identical to the pure dict scorers (pinned by tests)."""
    prof = _ngram_profile_cache(q)
    n = len(left)
    out = np.empty(n, dtype=np.float64)
    pair_index: dict[tuple[str, str], int] = {}
    inv = np.empty(n, dtype=np.int64)
    groups: dict[str, list[str]] = {}
    order: list[tuple[str, str]] = []
    for i in range(n):
        a, b = left[i], right[i]
        if a is None or b is None:
            inv[i] = -1
            continue
        key = (a, b)
        j = pair_index.get(key)
        if j is None:
            j = len(order)
            pair_index[key] = j
            order.append(key)
            groups.setdefault(a, []).append(b)
        inv[i] = j
    for a, bs in groups.items():
        for b in bs:
            prof(b)
        prof(a)
    vals = np.empty(len(order), dtype=np.float64)
    vocab_size = prof.vocab_size()
    dense = np.zeros(max(vocab_size, 1), dtype=np.float64)
    for a, bs in groups.items():
        ua, ca, na, ta = prof(a)
        # empty-profile rights (and an empty left) short-circuit without
        # touching the gather path — also keeps reduceat offsets strictly
        # increasing (zero-length segments would corrupt/crash it)
        full_b: list[tuple] = []
        full_idx: list[int] = []
        for b in bs:
            j = pair_index[(a, b)]
            pb = prof(b)
            if ua.size == 0 or pb[0].size == 0:
                if method == "cosine":
                    vals[j] = 1.0  # empty profile => dist 1.0
                elif method == "qgram":
                    vals[j] = ta + pb[3]  # disjoint: sum of totals
                else:  # jaccard: both empty => 0.0, one empty => 1.0
                    vals[j] = 0.0 if ua.size == 0 and pb[0].size == 0 else 1.0
            else:
                full_b.append(pb)
                full_idx.append(j)
        if not full_b:
            continue
        dense[ua] = ca
        cat_codes = np.concatenate([p[0] for p in full_b])
        cat_counts = np.concatenate([p[1] for p in full_b])
        sizes = np.fromiter((p[0].size for p in full_b), dtype=np.int64, count=len(full_b))
        offsets = np.zeros(len(full_b), dtype=np.int64)
        if len(full_b) > 1:
            np.cumsum(sizes[:-1], out=offsets[1:])
        da = dense[cat_codes]
        if method == "cosine":
            seg = np.add.reduceat(da * cat_counts, offsets)
            for k, ((ub, cb, nb, tb), j) in enumerate(zip(full_b, full_idx)):
                vals[j] = 1.0 - float(seg[k]) / (na * nb)
        elif method == "qgram":
            # sum|ca-cb| = ta + tb - 2*sum(min); exact for integer counts
            seg = np.add.reduceat(np.minimum(da, cat_counts), offsets)
            for k, ((ub, cb, nb, tb), j) in enumerate(zip(full_b, full_idx)):
                vals[j] = (ta + tb) - 2.0 * float(seg[k])
        else:  # jaccard (distinct sets)
            seg = np.add.reduceat((da > 0).astype(np.float64), offsets)
            for k, ((ub, cb, nb, tb), j) in enumerate(zip(full_b, full_idx)):
                inter = int(seg[k])
                union = ua.size + ub.size - inter
                vals[j] = 1.0 - inter / union
        dense[ua] = 0.0
    null_mask = inv < 0
    out[null_mask] = INF
    out[~null_mask] = vals[inv[~null_mask]]
    return out


def qgram(left, right, q=2, **kw):
    return _batch_ngram_np(left, right, q, "qgram")


def cosine(left, right, q=2, **kw):
    return _batch_ngram_np(left, right, q, "cosine")


def jaccard(left, right, q=2, **kw):
    return _batch_ngram_np(left, right, q, "jaccard")


#: vectorized method registry — score_batch() dispatches here for large
#: batches; missing methods (dl, soundex) use the pure path
METHODS = {
    "levenshtein": levenshtein,
    "lv": levenshtein,
    "osa": osa,
    "lcs": lcs,
    "hamming": hamming,
    "jaro_winkler": jaro_winkler,
    "jw": jaro_winkler,
    "jaro": jaro_winkler,
    # ngram family (qgram/cosine/jaccard) deliberately NOT registered: in
    # pipeline-shaped batches (10k pairs, mostly-distinct keys) the cost is
    # TOKENIZATION, not pair arithmetic — measured er-cosine edges walls:
    # pure 45-50 s vs grouped-gather 70-124 s at 20k entities. The grouped
    # kernels below win only when left keys repeat heavily within a batch
    # (2.4-2.6x in that regime) and remain available for direct use; the
    # per-batch dict walk stays the default dispatch.
}
