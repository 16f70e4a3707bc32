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


#: vectorized method registry — score_batch() dispatches here for large
#: batches; missing methods (dl, ngram family, soundex) use the pure path
METHODS = {
    "levenshtein": levenshtein,
    "lv": levenshtein,
    "osa": osa,
    "lcs": lcs,
    "hamming": hamming,
    "jaro_winkler": jaro_winkler,
    "jw": jaro_winkler,
    "jaro": jaro_winkler,
}
