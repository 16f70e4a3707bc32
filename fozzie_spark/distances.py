"""Batch string-distance scorers with fozziejoin semantics.

Pure Python/NumPy — no Spark imports — so they are unit-testable and
usable both inside pandas UDFs (Arrow-batched) and as a local oracle.

Semantics mirror the reference implementation (cited per function from
/root/reference), re-derived from published algorithm definitions:

- NA/None on either side never matches (callers drop nulls before scoring;
  scorers treat None defensively as +inf distance).
  ref: src/rust/src/string/edit/levenshtein.rs:23-25, README.md:214
- q-gram extraction: sliding char windows of q chars; strings shorter than
  q yield an EMPTY profile. ref: src/rust/src/utils.rs:81-99
- jaro_winkler quirk: d' = d + min(prefix_len, max_prefix) * prefix_weight
  * (1 - d), i.e. the prefix term INCREASES distance; defaults
  (max_prefix=0, prefix_weight=0) make it pure Jaro.
  ref: src/rust/src/string/jaro_winkler.rs:66-76
- hamming: unequal lengths never match (distance +inf here).
  ref: src/rust/src/string/edit/hamming.rs:26-31
- lcs distance = m + n - 2*LCS. ref: src/rust/src/string/edit/lcs.rs:10-27
- soundex: National-Archives variant with dual (primary, alt-prefix)
  encoding; distance is always 0.0 for matches.
  ref: src/rust/src/string/soundex.rs:101-226

Every public scorer has signature
    scorer(left: Sequence[str], right: Sequence[str], **params) -> np.ndarray[float64]
computing elementwise distances for aligned pairs. Batch-level caching of
per-string structures (q-gram profiles, soundex codes) keeps the hot loop
cheap; the Spark layer additionally dedupes on unique key values so each
distinct pair is scored once.
"""

from __future__ import annotations

import numpy as np

INF = float("inf")

# --------------------------------------------------------------------------
# edit-distance family (banded DP with early exit at cutoff)
# --------------------------------------------------------------------------


def _lev_pair(a: str, b: str, cutoff: int) -> float:
    """Standard Levenshtein with Ukkonen band early-exit; +inf if > cutoff."""
    if a == b:
        return 0.0
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return INF
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # band of width 2*cutoff+1 around the diagonal
    prev = list(range(lb + 1))
    cur = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur[0] = i
        lo = max(1, i - cutoff)
        hi = min(lb, i + cutoff)
        if lo > 1:
            cur[lo - 1] = cutoff + 1
        row_min = cur[0] if lo == 1 else cutoff + 1
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = v
            if v < row_min:
                row_min = v
        if hi < lb:
            cur[hi + 1 :] = [cutoff + 1] * (lb - hi)
        if row_min > cutoff:
            return INF
        prev, cur = cur, prev
    d = prev[lb]
    return float(d) if d <= cutoff else INF


def _osa_pair(a: str, b: str, cutoff: int) -> float:
    """Optimal string alignment (adjacent transposition, no reuse)."""
    if a == b:
        return 0.0
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return INF
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and ca == b[j - 2] and a[i - 2] == b[j - 1]:
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min > cutoff:
            return INF
        prev2, prev = prev, cur
    d = prev[lb]
    return float(d) if d <= cutoff else INF


def _dl_pair(a: str, b: str, cutoff: int) -> float:
    """Full Damerau-Levenshtein (unrestricted, with substring reuse)."""
    if a == b:
        return 0.0
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return INF
    maxdist = la + lb
    da: dict[str, int] = {}
    # classic DL with 'da' last-occurrence table; matrix padded by 1
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        ca = a[i - 1]
        row_min = maxdist
        for j in range(1, lb + 1):
            cb = b[j - 1]
            k = da.get(cb, 0)
            l = db
            if ca == cb:
                cost = 0
                db = j
            else:
                cost = 1
            v = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
            d[i + 1][j + 1] = v
            if v < row_min:
                row_min = v
        da[ca] = i
        if row_min > cutoff:
            return INF
    v = d[la + 1][lb + 1]
    return float(v) if v <= cutoff else INF


def _hamming_pair(a: str, b: str, cutoff: int) -> float:
    if len(a) != len(b):
        return INF  # ref: hamming.rs:26-31 — unequal lengths never match
    d = 0
    for x, y in zip(a, b):
        if x != y:
            d += 1
            if d > cutoff:
                return INF
    return float(d)


def _lcs_len(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return prev[lb]


def _lcs_pair(a: str, b: str, cutoff: int) -> float:
    if a == b:
        return 0.0
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return INF
    d = la + lb - 2 * _lcs_len(a, b)
    return float(d) if d <= cutoff else INF


# --------------------------------------------------------------------------
# q-gram family
# --------------------------------------------------------------------------


def qgram_profile(s: str, q: int) -> dict[str, int]:
    """Char-window q-grams with counts; len(s) < q => empty profile.

    ref: src/rust/src/utils.rs:81-99 (ASCII-scoped; we use char windows).
    """
    n = len(s)
    prof: dict[str, int] = {}
    if n < q:
        return prof
    for i in range(n - q + 1):
        g = s[i : i + q]
        prof[g] = prof.get(g, 0) + 1
    return prof


def qgram_set(s: str, q: int) -> frozenset[str]:
    n = len(s)
    if n < q:
        return frozenset()
    return frozenset(s[i : i + q] for i in range(n - q + 1))


def _qgram_dist(p1: dict[str, int], p2: dict[str, int]) -> float:
    # sum over union of |c1 - c2|   (ref: string/ngram/qgram.rs:11-32)
    d = 0
    for g, c in p1.items():
        d += abs(c - p2.get(g, 0))
    for g, c in p2.items():
        if g not in p1:
            d += c
    return float(d)


def _cosine_dist(p1: dict[str, int], p2: dict[str, int]) -> float:
    # 1 - dot/(||a||*||b||); empty profile => 1.0
    # ref: string/ngram/cosine.rs:11-40
    if not p1 or not p2:
        return 1.0
    dot = 0
    if len(p1) > len(p2):
        p1, p2 = p2, p1
    for g, c in p1.items():
        c2 = p2.get(g)
        if c2:
            dot += c * c2
    n1 = sum(c * c for c in p1.values()) ** 0.5
    n2 = sum(c * c for c in p2.values()) ** 0.5
    return 1.0 - dot / (n1 * n2)


def _jaccard_dist(s1: frozenset, s2: frozenset) -> float:
    # set Jaccard distance; BOTH empty => 0.0
    # ref: string/ngram/jaccard.rs:67-105 (fuzzy_indices/compare_pairs path)
    if not s1 and not s2:
        return 0.0
    inter = len(s1 & s2)
    union = len(s1) + len(s2) - inter
    return 1.0 - inter / union


# --------------------------------------------------------------------------
# Jaro / Jaro-Winkler
# --------------------------------------------------------------------------


def _jaro_sim(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i in range(la):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        ca = a[i]
        for j in range(lo, hi):
            if not b_match[j] and b[j] == ca:
                a_match[i] = True
                b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jw_pair(a: str, b: str, cutoff: float, prefix_weight: float, max_prefix: int) -> float:
    """fozziejoin jw: jaro distance, then d' = d + cap_prefix*w*(1-d).

    NOTE the prefix term increases distance (reference quirk,
    jaro_winkler.rs:66-76). Defaults w=0, max_prefix=0 => pure Jaro.
    Exact-equality fast path emits 0.0 (jaro_winkler.rs:104-109).
    """
    if a == b:
        return 0.0
    d = 1.0 - _jaro_sim(a, b)
    if max_prefix > 0 and prefix_weight != 0.0:
        pl = 0
        for ca, cb in zip(a, b):
            if ca != cb:
                break
            pl += 1
            if pl >= max_prefix:
                break
        d = d + pl * prefix_weight * (1.0 - d)
    return d if d <= cutoff else INF


# --------------------------------------------------------------------------
# Soundex (National Archives variant with dual prefix encoding)
# --------------------------------------------------------------------------

_SOUNDEX_CODE = {
    **{c: "1" for c in "BFPV"},
    **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"},
    "L": "4",
    **{c: "5" for c in "MN"},
    "R": "6",
}

_SURNAME_PREFIXES = frozenset(
    ["DE", "LA", "LE", "VAN", "VON", "DI", "O", "CON", "BIN", "ABU", "AL", "SAN", "SANTA"]
)


def soundex_na(s: str) -> str:
    """National-Archives soundex: H/W skipped (break letter-runs), 4 chars.

    ref: src/rust/src/string/soundex.rs:101-151 (re-derived, not copied).
    """
    letters = [c.upper() for c in s if c.isascii() and c.isalpha()]
    if not letters:
        return "0000"
    first = letters[0]
    out = [first]
    last_digit = _SOUNDEX_CODE.get(first, "0")
    last_ignored = False
    for c in letters[1:]:
        digit = _SOUNDEX_CODE.get(c, "0")
        if digit == "0":
            last_ignored = True
            continue
        if digit != last_digit or last_ignored:
            out.append(digit)
            last_digit = digit
        last_ignored = False
        if len(out) >= 4:
            break
    return ("".join(out) + "0000")[:4]


def _split_double_capitals(s: str) -> list[str]:
    """Split camel-case ("VanDeusen" -> ["Van","Deusen"]); runs of capitals stay."""
    tokens = []
    start = 0
    for i in range(1, len(s)):
        if s[i - 1].isupper() and s[i].isupper():
            continue
        if s[i].isupper() and s[i - 1].islower():
            tokens.append(s[start:i])
            start = i
    tokens.append(s[start:])
    return tokens


def soundex_dual(name: str) -> tuple[str, str | None]:
    """(primary, alt) codes: primary = soundex of root token (first token
    that is not a surname prefix); alt = soundex of the prefix tokens, when
    any. ref: src/rust/src/string/soundex.rs:153-206.
    """
    cleaned = "".join(c for c in name if (c.isascii() and c.isalpha()) or c.isspace())
    tokens = [
        t.upper()
        for part in cleaned.split()
        for t in _split_double_capitals(part)
        if t and all(c.isascii() and c.isalpha() for c in t)
    ]
    prefix_parts: list[str] = []
    root: str | None = None
    for tok in tokens:
        if root is None and tok in _SURNAME_PREFIXES:
            prefix_parts.append(tok)
        elif root is None:
            root = tok
    primary = soundex_na(root if root is not None else name.upper())
    alt = soundex_na(" ".join(prefix_parts)) if prefix_parts else None
    return primary, alt


def soundex_match(a: str, b: str) -> bool:
    """Match iff any of the 4 (primary|alt) code combinations agree.

    ref: src/rust/src/string/soundex.rs:49-53,85-89.
    """
    pa, aa = soundex_dual(a)
    pb, ab = soundex_dual(b)
    return (
        pa == pb
        or (aa is not None and aa == pb)
        or (ab is not None and ab == pa)
        or (aa is not None and ab is not None and aa == ab)
    )


# --------------------------------------------------------------------------
# batch entry points
# --------------------------------------------------------------------------


def _batch_edit(pair_fn, left, right, max_distance: float, **_):
    cutoff = int(max_distance)
    out = np.empty(len(left), dtype=np.float64)
    cache: dict[tuple[str, str], float] = {}
    for i, (a, b) in enumerate(zip(left, right)):
        if a is None or b is None:
            out[i] = INF
            continue
        key = (a, b)
        v = cache.get(key)
        if v is None:
            v = pair_fn(a, b, cutoff)
            cache[key] = v
        out[i] = v
    return out


def levenshtein(left, right, max_distance=2.0, **kw):
    return _batch_edit(_lev_pair, left, right, max_distance)


def osa(left, right, max_distance=2.0, **kw):
    return _batch_edit(_osa_pair, left, right, max_distance)


def damerau_levenshtein(left, right, max_distance=2.0, **kw):
    return _batch_edit(_dl_pair, left, right, max_distance)


def hamming(left, right, max_distance=2.0, **kw):
    return _batch_edit(_hamming_pair, left, right, max_distance)


def lcs(left, right, max_distance=2.0, **kw):
    return _batch_edit(_lcs_pair, left, right, max_distance)


def _batch_ngram(dist_fn, prof_fn, left, right, q: int):
    out = np.empty(len(left), dtype=np.float64)
    profs: dict[str, object] = {}

    def prof(s):
        p = profs.get(s)
        if p is None:
            p = prof_fn(s, q)
            profs[s] = p
        return p

    for i, (a, b) in enumerate(zip(left, right)):
        if a is None or b is None:
            out[i] = INF
        else:
            out[i] = dist_fn(prof(a), prof(b))
    return out


def qgram(left, right, q=2, **kw):
    return _batch_ngram(_qgram_dist, qgram_profile, left, right, q)


def cosine(left, right, q=2, **kw):
    return _batch_ngram(_cosine_dist, qgram_profile, left, right, q)


def jaccard(left, right, q=2, **kw):
    return _batch_ngram(_jaccard_dist, qgram_set, left, right, q)


def jaro_winkler(left, right, max_distance=1.0, prefix_weight=0.0, max_prefix=0, **kw):
    out = np.empty(len(left), dtype=np.float64)
    cache: dict[tuple[str, str], float] = {}
    for i, (a, b) in enumerate(zip(left, right)):
        if a is None or b is None:
            out[i] = INF
            continue
        key = (a, b)
        v = cache.get(key)
        if v is None:
            v = _jw_pair(a, b, max_distance, prefix_weight, max_prefix)
            cache[key] = v
        out[i] = v
    return out


def soundex_distance(left, right, **kw):
    """0.0 when soundex codes match, +inf otherwise (max_distance ignored —
    ref: soundex.rs:55,91-93 and README.md:228-230)."""
    out = np.empty(len(left), dtype=np.float64)
    codes: dict[str, tuple[str, str | None]] = {}

    def dual(s):
        c = codes.get(s)
        if c is None:
            c = soundex_dual(s)
            codes[s] = c
        return c

    for i, (a, b) in enumerate(zip(left, right)):
        if a is None or b is None:
            out[i] = INF
            continue
        pa, aa = dual(a)
        pb, ab = dual(b)
        ok = (
            pa == pb
            or (aa is not None and aa == pb)
            or (ab is not None and ab == pa)
            or (aa is not None and ab is not None and aa == ab)
        )
        out[i] = 0.0 if ok else INF
    return out


#: method-name registry (reference aliases included:
#: R/fozzie_string_join.R method arg; joinmethod.rs:147-182)
METHODS = {
    "levenshtein": levenshtein,
    "lv": levenshtein,
    "osa": osa,
    "damerau_levenshtein": damerau_levenshtein,
    "dl": damerau_levenshtein,
    "hamming": hamming,
    "lcs": lcs,
    "qgram": qgram,
    "cosine": cosine,
    "jaccard": jaccard,
    "jaro_winkler": jaro_winkler,
    "jw": jaro_winkler,
    "jaro": jaro_winkler,
    "soundex": soundex_distance,
}

#: methods whose candidate pruning can use length-band blocking
EDIT_METHODS = frozenset(["levenshtein", "lv", "osa", "damerau_levenshtein", "dl", "hamming", "lcs"])
NGRAM_METHODS = frozenset(["qgram", "cosine", "jaccard"])


#: batches at least this large route to the NumPy-vectorized kernels
#: (below it the padding/setup overhead beats the per-pair loop)
VEC_MIN_BATCH = 32


def score_batch(method: str, left, right, use_vectorized: bool | None = None, **params) -> np.ndarray:
    """Batch scorer dispatch: NumPy-vectorized kernels (distances_vec) for
    big batches of the DP methods, the per-pair pure scorers otherwise.
    Both paths are elementwise-identical (pinned by property tests)."""
    if use_vectorized is None:
        use_vectorized = len(left) >= VEC_MIN_BATCH
    if use_vectorized:
        from fozzie_spark import distances_vec

        vfn = distances_vec.METHODS.get(method)
        if vfn is not None:
            return vfn(left, right, **params)
    fn = METHODS.get(method)
    if fn is None:
        raise ValueError(f"unknown string-distance method: {method!r}")
    return fn(left, right, **params)
