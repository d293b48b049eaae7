"""Property-based tests (hypothesis) over the deterministic kernels.

These cover the algebraic contracts the pipeline's correctness rests
on, with adversarial inputs beyond the fixture corpus: suffix-array
ordering, winnowing guarantee, LCS/L-gram equivalence, codec
round-trip, shingle/verify agreement.
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from dude_spark.config import MinHashConfig
from dude_spark.detectors.minhash import _band_hashes, _params, _shingle_hashes
from dude_spark.imagecodec import decode, encode, psnr
from dude_spark.operators.verify import shingle_set
from dude_spark.suffixarray import (
    _codes,
    has_common_substring,
    has_common_substring_hashed,
    longest_common_substring_len,
    suffix_array,
    winnow,
)

text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=120,
)
small_text = st.text(alphabet="abcdef ", max_size=60)


@settings(max_examples=60, deadline=None)
@given(s=small_text)
def test_suffix_array_is_sorted_permutation(s):
    sa = suffix_array(_codes(s))
    assert sorted(sa.tolist()) == list(range(len(s)))
    suffixes = [s[i:] for i in sa]
    assert suffixes == sorted(suffixes)


@settings(max_examples=60, deadline=None)
@given(a=small_text, b=small_text, L=st.integers(1, 12))
def test_substring_decisions_agree(a, b, L):
    want = longest_common_substring_len(a, b) >= L
    assert has_common_substring(a, b, L) == want
    assert has_common_substring_hashed(a, b, L) == want


@settings(max_examples=40, deadline=None)
@given(
    core=st.text(alphabet="xyz", min_size=16, max_size=16),
    pre_a=st.text(alphabet="abc", max_size=25),
    suf_a=st.text(alphabet="abc", max_size=25),
    pre_b=st.text(alphabet="def", max_size=25),
    suf_b=st.text(alphabet="def", max_size=25),
)
def test_winnow_guarantee_property(core, pre_a, suf_a, pre_b, suf_b):
    L = 16
    fa = set(winnow(pre_a + core + suf_a, L, 8).tolist())
    fb = set(winnow(pre_b + core + suf_b, L, 8).tolist())
    assert fa & fb  # shared >=L substring ⇒ shared fingerprint


@settings(max_examples=60, deadline=None)
@given(t=text, k=st.integers(2, 8))
def test_shingle_hash_count_matches_string_shingles(t, k):
    # signature-side hashed shingles agree with verify-side string sets
    # (up to 64-bit collisions, which hypothesis will never find)
    assert _shingle_hashes(t, k).size == len(shingle_set(t, k))


@settings(max_examples=30, deadline=None)
@given(t=text)
def test_band_hashes_deterministic(t):
    cfg = MinHashConfig()
    a, b = _params(cfg)
    s = _shingle_hashes(t, cfg.shingle_k)
    h1 = _band_hashes(s, a, b, cfg.num_hashes, cfg.bands, cfg.rows_per_band)
    h2 = _band_hashes(s, a, b, cfg.num_hashes, cfg.bands, cfg.rows_per_band)
    if h1 is None:
        assert h2 is None and len(t) == 0
    else:
        assert (h1 == h2).all() and len(h1) == cfg.bands


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["png", "jpeg", "gif"]),
)
def test_codec_roundtrip_property(h, w, seed, fmt):
    pix = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    out, got_fmt = decode(encode(pix, fmt))
    assert got_fmt == fmt and out.shape == pix.shape
    if fmt == "png":
        assert (out == pix).all()
    else:
        assert psnr(pix, out) >= 40.0  # BASELINE.json per-row invariant


@settings(max_examples=200, deadline=None)
@given(
    totals=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10**12),
        min_size=2,
        max_size=4,
    ),
    raw_w=st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=2,
        max_size=4,
    ),
    max_repeat=st.integers(min_value=1, max_value=8),
)
def test_mix_plan_invariants(totals, raw_w, max_repeat):
    """mix_plan for ANY mass/weights/max_repeat: repeats in
    [1, max_repeat], fractions in (0, 1], realized mixture exactly
    proportional to the weights, binding stratum at full retention,
    and never below the downsample-only (max_repeat=1) output mass."""
    from dude_spark.functions.splits import mix_fractions, mix_plan

    strata = sorted(totals)
    w = {d: raw_w[i % len(raw_w)] for i, d in enumerate(strata)}
    s = sum(w[d] for d in strata)
    weights = {d: w[d] / s for d in strata}
    # renormalized floats can miss the 1e-6 sum gate by accumulation —
    # assume() (not a bare return) so hypothesis tracks and regenerates
    # filtered examples instead of silently passing them
    assume(abs(sum(weights.values()) - 1.0) <= 1e-7)
    plan = mix_plan(totals, weights, max_repeat=max_repeat)
    assert set(plan) == set(strata)
    mass = {}
    for d, (rep, frac) in plan.items():
        assert 1 <= rep <= max_repeat
        assert 0.0 < frac <= 1.0
        mass[d] = totals[d] * rep * frac
    n = sum(mass.values())
    for d in strata:
        assert abs(mass[d] / n - weights[d]) < 1e-9, (d, plan)
    # the binding stratum runs at max_repeat with (near-)full retention
    assert any(
        rep == max_repeat and f > 1.0 - 1e-9 for _, (rep, f) in plan.items()
    ), plan
    # allowing upsampling never shrinks the corpus
    down = mix_fractions(totals, weights)
    n_down = sum(totals[d] * down[d] for d in strata)
    assert n >= n_down - 1e-6 * n
