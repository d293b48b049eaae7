"""D3 exact-substring: suffix-array kernel correctness, winnowing
guarantee, and end-to-end recall on the planted `substring` population.
"""

from __future__ import annotations

import numpy as np
import pytest

from dude_spark.config import SuffixConfig
from dude_spark.detectors.suffix import (
    suffix_buckets,
    suffix_signatures,
    verify_substring,
)
from dude_spark.fixtures import expected_pairs
from dude_spark.operators.candidates import pairs_from_buckets
from dude_spark.operators.components import connected_components
from dude_spark.suffixarray import (
    has_common_substring,
    lcp_array,
    longest_common_substring_len,
    suffix_array,
    winnow,
)

CFG = SuffixConfig()

# populations guaranteed to share a >= min_match_len substring:
# `substring` (planted 65-char core), identical-caption kinds
SUBSTR_KINDS = {"substring", "exact", "same_caption", "hot"}


def _naive_sa(s: str) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def _naive_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_suffix_array_matches_naive():
    rs = np.random.RandomState(7)
    for n in [1, 2, 5, 17, 64, 200]:
        s = "".join(rs.choice(list("abcd"), size=n))
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        assert suffix_array(codes).tolist() == _naive_sa(s), s


def test_lcp_array_correct():
    s = "banana"
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    for i in range(len(sa) - 1):
        x, y = s[sa[i] :], s[sa[i + 1] :]
        k = 0
        while k < min(len(x), len(y)) and x[k] == y[k]:
            k += 1
        assert lcp[i] == k


def test_lcs_matches_naive():
    rs = np.random.RandomState(11)
    for _ in range(30):
        a = "".join(rs.choice(list("abc"), size=int(rs.randint(0, 40))))
        b = "".join(rs.choice(list("abc"), size=int(rs.randint(0, 40))))
        assert longest_common_substring_len(a, b) == _naive_lcs(a, b), (a, b)


def test_has_common_substring_equals_lcs_threshold():
    # the O(n+m) verify decision must equal "suffix-array LCS >= L"
    rs = np.random.RandomState(17)
    for _ in range(60):
        a = "".join(rs.choice(list("abcd"), size=int(rs.randint(0, 50))))
        b = "".join(rs.choice(list("abcd"), size=int(rs.randint(0, 50))))
        for L in (1, 3, 8):
            want = longest_common_substring_len(a, b) >= L
            assert has_common_substring(a, b, L) == want, (a, b, L)


def test_winnowing_guarantee():
    # any pair sharing a substring of length >= L shares a fingerprint
    rs = np.random.RandomState(13)
    L = CFG.min_match_len
    for trial in range(50):
        core = "".join(rs.choice(list("abcdefgh"), size=L))
        pre_a = "".join(rs.choice(list("uvwxyz"), size=int(rs.randint(0, 30))))
        suf_a = "".join(rs.choice(list("uvwxyz"), size=int(rs.randint(0, 30))))
        pre_b = "".join(rs.choice(list("klmnop"), size=int(rs.randint(0, 30))))
        suf_b = "".join(rs.choice(list("klmnop"), size=int(rs.randint(0, 30))))
        fa = set(winnow(pre_a + core + suf_a, L).tolist())
        fb = set(winnow(pre_b + core + suf_b, L).tolist())
        assert fa & fb, trial


@pytest.fixture(scope="module")
def verified(spark, images_df):
    sigs = suffix_signatures(images_df, CFG)
    pairs, _ = pairs_from_buckets(suffix_buckets(sigs), bucket_cap=64)
    return verify_substring(pairs, images_df, CFG).localCheckpoint(eager=True)


def test_suffix_recall(verified, truth_pdf):
    want = expected_pairs(truth_pdf, SUBSTR_KINDS)
    got = {tuple(sorted((r["a"], r["b"]))) for r in verified.collect()}
    missed = want - got
    recall = 1 - len(missed) / len(want)
    assert recall >= 0.99, f"recall {recall:.4f}, missed {sorted(missed)[:5]}"


def test_suffix_verify_is_exact(verified, fixture_pdf):
    caps = dict(zip(fixture_pdf.image_id, fixture_pdf.caption))
    rows = verified.collect()
    assert rows
    for r in rows:
        true_lcs = longest_common_substring_len(caps[r["a"]], caps[r["b"]])
        assert true_lcs >= CFG.min_match_len, (r["a"], r["b"], true_lcs)


def test_suffix_components_group_substring_kind(verified, truth_pdf):
    assigns = connected_components(verified.select("a", "b"))
    label = {r["image_id"]: r["cluster_id"] for r in assigns.collect()}
    sub = truth_pdf[truth_pdf.truth_kind == "substring"]
    # all substring rows share the same planted core → one component
    labels = {label.get(i) for i in sub.image_id}
    assert len(labels) == 1 and None not in labels


def test_hashed_substring_equals_exact():
    from dude_spark.suffixarray import has_common_substring_hashed

    rs = np.random.RandomState(23)
    for _ in range(80):
        a = "".join(rs.choice(list("abcd"), size=int(rs.randint(0, 60))))
        b = "".join(rs.choice(list("abcd"), size=int(rs.randint(0, 60))))
        for L in (2, 5, 9):
            assert has_common_substring_hashed(a, b, L) == has_common_substring(
                a, b, L
            ), (a, b, L)


def test_batch_shares_equals_scalar():
    """The whole-batch verify kernel (unique-caption dedup + sorted-set
    probes) must agree with the scalar per-pair reference on every
    pair, including short/None sides and repeated captions."""
    from dude_spark.detectors.suffix import _batch_shares_substring
    from dude_spark.suffixarray import has_common_substring_hashed

    rs = np.random.RandomState(7)
    texts = [
        "".join(rs.choice(list("abcde "), size=int(rs.randint(0, 90))))
        for _ in range(40)
    ]
    shared_core = "the quick brown fox jumps over it"
    texts += [t + shared_core for t in texts[:6]]  # planted true matches
    ca, cb = [], []
    for _ in range(400):
        ca.append(texts[rs.randint(len(texts))])
        cb.append(texts[rs.randint(len(texts))])
    ca += [None, "", "short", texts[0]]
    cb += [texts[0], texts[1], "short", None]
    for L in (8, 16, 33):
        got = _batch_shares_substring(ca, cb, L)
        for i, (x, y) in enumerate(zip(ca, cb)):
            assert got[i] == has_common_substring_hashed(x, y, L), (i, L)
