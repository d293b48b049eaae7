"""D2 SimHash: pigeonhole-bucket recall + exact Hamming verification.

Targets in the fixture: `near_image` (identical pixels re-encoded →
identical phash, different captions — phash channel), and
`exact`/`same_caption`/`hot` (identical captions → caption-simhash
distance 0).  BASELINE.json: dup-pair recall >= 0.99.
"""

from __future__ import annotations

import numpy as np
import pytest

from dude_spark.config import ConfigError, SimHashConfig
from dude_spark.detectors.simhash import (
    _batch_simhash,
    _token_hashes,
    segment_subsets,
    simhash64,
    simhash_buckets,
    simhash_pairs_verified,
    simhash_signatures,
)
from dude_spark.fixtures import expected_pairs
from dude_spark.operators.candidates import pairs_from_buckets
from dude_spark.operators.components import connected_components

CFG = SimHashConfig()

SIMHASH_KINDS = {"near_image", "exact", "same_caption", "hot"}


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_segment_subsets_pigeonhole_guarantee():
    # any radius-r error pattern leaves at least one subset untouched
    m, r = CFG.segments, CFG.hamming_radius
    subs = segment_subsets(m, r)
    assert len(subs) == 56  # C(8,3)
    import itertools

    for errs in itertools.combinations(range(m), r):
        assert any(not (set(s) & set(errs)) for s in subs)


def test_simhash64_properties():
    h1 = simhash64(_token_hashes("the quick brown fox jumps high"))
    h1x = simhash64(_token_hashes("the quick brown fox jumps high"))
    h2 = simhash64(_token_hashes("quick the brown fox jumps high"))  # bag-of-tokens
    h3 = simhash64(_token_hashes("zebra quartz lattice onyx prism cobalt"))
    assert h1 == h1x == h2                      # deterministic, order-free
    assert _hamming(h1, h3) > CFG.hamming_radius  # unrelated far apart
    assert simhash64(np.empty(0, np.uint64)) is None


def test_batch_simhash_equals_scalar_reference():
    """The vectorized batch kernel (the UDF hot path) must produce
    bit-identical signatures to the scalar per-char reference."""
    import random
    import string

    rng = random.Random(7)
    caps: list = [None, "", "   ", "a", "the quick brown fox", "Ω λ中文  mixed"]
    for _ in range(300):
        n = rng.randint(0, 12)
        caps.append(
            " ".join(
                "".join(
                    rng.choice(string.printable[:70])
                    for _ in range(rng.randint(1, 25))
                )
                for _ in range(n)
            )
        )
    got = _batch_simhash(caps)
    want = [None if c is None else simhash64(_token_hashes(c)) for c in caps]
    assert got == want


def test_config_validation():
    with pytest.raises(ConfigError):
        SimHashConfig(segments=7)
    with pytest.raises(ConfigError):
        SimHashConfig(segments=4, hamming_radius=4)


@pytest.fixture(scope="module")
def verified(spark, images_df):
    sigs = simhash_signatures(images_df, CFG)
    sigs.persist().count()
    buckets = simhash_buckets(sigs, CFG)
    pairs, _ = pairs_from_buckets(buckets, bucket_cap=64)
    # materialize the stage boundary before the CC loop re-reads it —
    # mirrors the pipeline's per-stage checkpointing (SURVEY.md §7.7)
    out = simhash_pairs_verified(pairs, sigs, CFG).localCheckpoint(eager=True)
    return out, sigs


def test_simhash_recall(verified, truth_pdf):
    pairs_df, _ = verified
    want = expected_pairs(truth_pdf, SIMHASH_KINDS)
    got = {tuple(sorted((r["a"], r["b"]))) for r in pairs_df.collect()}
    missed = want - got
    recall = 1 - len(missed) / len(want)
    assert recall >= 0.99, f"recall {recall:.4f}, missed {sorted(missed)[:5]}"


def test_simhash_verify_is_exact(verified):
    pairs_df, sigs = verified
    sig_map: dict[tuple[str, str], int] = {
        (r["image_id"], r["channel"]): r["sig"] for r in sigs.collect()
    }
    for r in pairs_df.collect():
        ok = any(
            (r["a"], ch) in sig_map
            and (r["b"], ch) in sig_map
            and _hamming(sig_map[(r["a"], ch)], sig_map[(r["b"], ch)])
            <= CFG.hamming_radius
            for ch in ("phash", "caption")
        )
        assert ok, (r["a"], r["b"])


def test_simhash_components(verified, truth_pdf):
    pairs_df, _ = verified
    assigns = connected_components(pairs_df)
    label = {r["image_id"]: r["cluster_id"] for r in assigns.collect()}
    ni = truth_pdf[truth_pdf.truth_kind == "near_image"]
    for _, grp in ni.groupby("truth_group_id"):
        labels = {label.get(i) for i in grp.image_id}
        assert len(labels) == 1 and None not in labels
