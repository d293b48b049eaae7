"""Pure-numpy suffix array, LCP, LCS, and winnowing fingerprints.

The computational kernel behind the D3 exact-substring detector
(detectors/suffix.py).  Everything here is deterministic integer
arithmetic over numpy arrays — no Python ``hash()``, no randomness —
so results are identical across workers/versions (SURVEY.md §4
hard-part (a)).

Algorithms (all classic, public):
  * suffix_array — prefix-doubling (Manber–Myers) with ``np.lexsort``
    as the radix step: O(n log^2 n), fully vectorized.
  * lcp_array — Kasai et al. linear-time LCP from the suffix array.
  * longest_common_substring_len — SA+LCP over the two strings joined
    with distinct sentinels; the answer is the max LCP between
    adjacent suffixes originating from different strings.
  * winnow — Schleimer/Wilkerson/Aiken "Winnowing: Local Algorithms
    for Document Fingerprinting" (SIGMOD'03): rolling g-gram hashes,
    minimum per sliding window of w grams.  GUARANTEE: two strings
    sharing a substring of length >= w + g - 1 share at least one
    selected fingerprint — this is what makes substring candidate
    generation a plain groupBy at any scale.
"""

from __future__ import annotations

import numpy as np

_POLY_B = np.uint64(1099511628211)  # FNV-64 prime (same base as D1/D2)


def _codes(text: str) -> np.ndarray:
    """Unicode code points as uint32 — the integer alphabet."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (prefix doubling).

    Returns sa with sa[i] = start index of the i-th smallest suffix.
    """
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    k = 1
    order = np.argsort(rank, kind="stable")
    while rank[order[-1]] != n - 1:  # ranks not yet all-distinct
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r1, r2 = rank[order], second[order]
        bump = np.empty(n, dtype=np.int64)
        bump[0] = 0
        bump[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(bump)
        rank = new_rank
        k *= 2
    return order.astype(np.int64)


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i+1]); len n-1."""
    n = len(codes)
    if n < 2:
        return np.empty(0, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n - 1, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest substring occurring in both a and b."""
    if not a or not b:
        return 0
    ca = _codes(a).astype(np.int64) + 2  # shift to make room for sentinels
    cb = _codes(b).astype(np.int64) + 2
    joined = np.concatenate([ca, np.array([0], dtype=np.int64), cb])
    sa = suffix_array(joined)
    lcp = lcp_array(joined, sa)
    from_a = sa < len(ca)  # suffixes starting in a (sentinel idx counts as b-side)
    cross = from_a[:-1] != from_a[1:]
    return int(lcp[cross].max()) if cross.any() else 0


def has_common_substring(a: str, b: str, min_len: int) -> bool:
    """EXACT decision 'do a and b share a substring of length >= L?'.

    Equivalent to longest_common_substring_len(a, b) >= L because a
    shared substring of length >= L contains a shared exact L-gram.
    O(|a|+|b|) set intersection of raw L-gram strings (no hashing, no
    collision risk) — the reference implementation; the verify join
    uses the vectorized hashed variant below.
    """
    if min_len <= 0:
        return True
    if a is None or b is None or len(a) < min_len or len(b) < min_len:
        return False
    grams_a = {a[i : i + min_len] for i in range(len(a) - min_len + 1)}
    return any(
        b[i : i + min_len] in grams_a for i in range(len(b) - min_len + 1)
    )


def has_common_substring_hashed(a: str, b: str, min_len: int) -> bool:
    """Vectorized variant of has_common_substring: rolling-hash all
    L-grams of both strings (numpy) and intersect the hash sets.
    Exact up to 64-bit collisions (~|a||b|/2^64 per pair — immaterial);
    property-tested equal to the exact version."""
    if min_len <= 0:
        return True
    if a is None or b is None or len(a) < min_len or len(b) < min_len:
        return False
    ha = gram_hashes(a, min_len)
    hb = gram_hashes(b, min_len)
    return np.intersect1d(ha, hb).size > 0


def gram_hashes(text: str, g: int) -> np.ndarray:
    """Rolling polynomial hashes of all g-grams (uint64 wraparound)."""
    cp = _codes(text).astype(np.uint64)
    n = len(cp)
    if n < g:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(cp, g)
    pows = np.empty(g, dtype=np.uint64)
    pows[0] = 1
    with np.errstate(over="ignore"):
        for j in range(1, g):
            pows[j] = pows[j - 1] * _POLY_B
        return (win * pows[::-1]).sum(axis=1, dtype=np.uint64)


def winnow(text: str, min_match_len: int, g: int = 8) -> np.ndarray:
    """Distinct winnowed fingerprints of `text`.

    Window size w = min_match_len - g + 1, so any common substring of
    length >= min_match_len yields a shared fingerprint (the paper's
    guarantee threshold t = w + g - 1 = min_match_len).
    """
    w = min_match_len - g + 1
    if w < 1:
        raise ValueError("min_match_len must be >= gram size")
    h = gram_hashes(text, g)
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    if h.size <= w:
        return np.unique(h.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    return np.unique(mins)
