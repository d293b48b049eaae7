"""D1 MinHash-LSH: recall vs planted near-dup captions + plan hygiene.

Recall target from BASELINE.json: dup-pair recall >= 0.99 at the
reference shingle/signature configuration.  Caption-similarity targets
in the fixture: `near_caption` (perturbed captions), `exact` /
`same_caption` / `hot` (identical captions → Jaccard 1.0).
"""

from __future__ import annotations

import numpy as np
import pytest

from dude_spark.config import MinHashConfig
from dude_spark.detectors.minhash import (
    _band_hashes,
    _params,
    _shingle_hashes,
    minhash_buckets,
    minhash_signatures,
)
from dude_spark.fixtures import IMAGES_COLUMNS, expected_pairs
from dude_spark.operators.candidates import pairs_from_buckets
from dude_spark.operators.components import connected_components
from dude_spark.operators.verify import (
    prefilter_minhash,
    shingle_set,
    verify_jaccard,
)

CFG = MinHashConfig()

CAPTION_KINDS = {"exact", "near_caption", "hot", "same_caption"}


def test_shingle_hashes_match_shingle_set():
    # the signature UDF and the verify stage must agree on shingling
    for text in ["hello world shingles", "αβγδε ζηθ", "ab", "", "exactly5"]:
        want = len(shingle_set(text, 5))
        got = _shingle_hashes(text, 5).size
        assert got == want, text


def test_band_hashes_deterministic_and_similarity_sensitive():
    a, b = _params(CFG)
    args = (a, b, CFG.num_hashes, CFG.bands, CFG.rows_per_band)
    s1 = _shingle_hashes("the quick brown fox jumps over the lazy dog", CFG.shingle_k)
    s2 = _shingle_hashes("the quick brown fox jumped over the lazy dog", CFG.shingle_k)
    s3 = _shingle_hashes("completely unrelated caption text here", CFG.shingle_k)
    b1 = _band_hashes(s1, *args)
    b1x = _band_hashes(s1, *args)
    b2 = _band_hashes(s2, *args)
    b3 = _band_hashes(s3, *args)
    assert (b1 == b1x).all()                      # deterministic
    assert (b1 == b2).any()                       # near-dup shares >=1 band
    assert not (b1 == b3).any()                   # unrelated shares none
    assert _band_hashes(np.empty(0, np.uint64), *args) is None


@pytest.fixture(scope="module")
def verified_pairs(spark, images_df):
    sigs = minhash_signatures(images_df, CFG)
    buckets = minhash_buckets(sigs)
    pairs, _overcap = pairs_from_buckets(buckets, bucket_cap=64)
    return verify_jaccard(
        pairs, images_df, CFG.shingle_k, CFG.jaccard_threshold
    ).select("a", "b")


def test_minhash_recall(verified_pairs, truth_pdf):
    want = expected_pairs(truth_pdf, CAPTION_KINDS)
    got = {(r["a"], r["b"]) for r in verified_pairs.collect()}
    got = {tuple(sorted(p)) for p in got}
    missed = want - got
    recall = 1 - len(missed) / len(want)
    assert recall >= 0.99, f"recall {recall:.4f}, missed {sorted(missed)[:5]}"


def test_minhash_verify_kills_false_positives(verified_pairs, fixture_pdf):
    # every surviving pair really is Jaccard >= threshold on raw captions
    caps = dict(zip(fixture_pdf.image_id, fixture_pdf.caption))
    for r in verified_pairs.collect():
        sa = shingle_set(caps[r["a"]], CFG.shingle_k)
        sb = shingle_set(caps[r["b"]], CFG.shingle_k)
        j = len(sa & sb) / len(sa | sb)
        assert j >= CFG.jaccard_threshold - 1e-9


def test_minhash_components_group_near_dups(verified_pairs, truth_pdf):
    assigns = connected_components(verified_pairs)
    rows = assigns.collect()
    label = {r["image_id"]: r["cluster_id"] for r in rows}
    # all near_caption group members end up with one shared cluster id
    nc = truth_pdf[truth_pdf.truth_kind == "near_caption"]
    for _, grp in nc.groupby("truth_group_id"):
        labels = {label.get(i) for i in grp.image_id}
        assert len(labels) == 1 and None not in labels


def test_minhash_scan_prunes_bytes(spark, fixture_pdf, tmp_path_factory):
    # Catalyst column pruning: the signature scan must not read `bytes`
    # (SURVEY.md §4 — the single biggest I/O lever at 10^12 rows).
    path = str(tmp_path_factory.mktemp("prune") / "images.parquet")
    spark.createDataFrame(fixture_pdf[IMAGES_COLUMNS]).write.parquet(path)
    sigs = minhash_signatures(spark.read.parquet(path), CFG)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "bytes" not in read_schema
    assert "caption" in read_schema


def test_batch_minhash_equals_scalar_reference():
    """The whole-batch kernel (UDF hot path since round 3) must produce
    bit-identical band hashes to the scalar per-caption reference
    (rolling-hash prefix trick + reduceat vs window matrix + unique)."""
    import random
    import string

    from dude_spark.detectors.minhash import _batch_band_hashes, _params

    cfg = MinHashConfig()
    a, b = _params(cfg)
    k, nh, bands, rpb = cfg.shingle_k, cfg.num_hashes, cfg.bands, cfg.rows_per_band
    rng = random.Random(13)
    caps: list = [None, "", "a", "ab", "a" * (k - 1), "a" * k, "Ωλ中文 mixed ascii"]
    for _ in range(300):
        n = rng.randint(0, 120)
        caps.append(
            "".join(rng.choice(string.printable[:75]) for _ in range(n))
        )
    # near-dup structure too: shared prefixes across captions
    caps += [caps[10] + " tail", " head " + (caps[20] or "x")]
    got = _batch_band_hashes(caps, a, b, nh, bands, rpb, k)
    for c, g in zip(caps, got):
        want = (
            None
            if c is None
            else _band_hashes(_shingle_hashes(c, k), a, b, nh, bands, rpb)
        )
        if want is None:
            assert g is None, repr(c)
        else:
            assert g is not None and np.array_equal(g, want), repr(c)


def test_batch_minhash_pathological_caption_sliced_path():
    """A single caption wider than the shingle chunk cap takes the
    running-min sliced path — must still be bit-identical."""
    import dude_spark.detectors.minhash as mh

    cfg = MinHashConfig()
    a, b = mh._params(cfg)
    k, nh, bands, rpb = cfg.shingle_k, cfg.num_hashes, cfg.bands, cfg.rows_per_band
    big = "abcdefghij" * 400  # 4000 chars
    old = mh._CHUNK_SHINGLES
    mh._CHUNK_SHINGLES = 256  # force slicing without a 512k-char caption
    try:
        got = mh._batch_band_hashes(["tiny", big], a, b, nh, bands, rpb, k)
    finally:
        mh._CHUNK_SHINGLES = old
    want = mh._band_hashes(mh._shingle_hashes(big, k), a, b, nh, bands, rpb)
    assert np.array_equal(got[1], want)


def test_prefilter_minhash_unit(spark):
    """Agreement semantics: identical sigs kept, disjoint sigs dropped,
    null sig kept (error→assume-equal contract)."""
    nh = CFG.num_hashes
    s1 = list(range(nh))
    s2 = list(range(nh))            # identical → est 1.0
    s3 = [v + nh for v in range(nh)]  # disjoint → est 0.0
    sigs = spark.createDataFrame(
        [("x", s1), ("y", s2), ("z", s3), ("w", None)],
        "image_id string, sig array<int>",
    )
    pairs = spark.createDataFrame(
        [("x", "y"), ("x", "z"), ("x", "w")], "a string, b string"
    )
    kept = {
        (r["a"], r["b"])
        for r in prefilter_minhash(
            pairs, sigs, CFG.jaccard_threshold, nh, CFG.prefilter_margin_sigmas
        ).collect()
    }
    assert ("x", "y") in kept       # est 1.0 >= cut
    assert ("x", "z") not in kept   # est 0.0 < cut
    assert ("x", "w") in kept       # null sig → kept


def test_prefilter_preserves_verified_output(spark, images_df):
    """The sketch cut must not change the exact-verify output on the
    fixture corpus (it may only drop pairs the verify rejects)."""
    sigs = minhash_signatures(images_df, CFG).localCheckpoint(eager=True)
    pairs, _ = pairs_from_buckets(minhash_buckets(sigs), bucket_cap=64)
    base = {
        tuple(sorted((r["a"], r["b"])))
        for r in verify_jaccard(
            pairs, images_df, CFG.shingle_k, CFG.jaccard_threshold
        ).select("a", "b").collect()
    }
    pf = prefilter_minhash(
        pairs, sigs, CFG.jaccard_threshold, CFG.num_hashes,
        CFG.prefilter_margin_sigmas,
    )
    got = {
        tuple(sorted((r["a"], r["b"])))
        for r in verify_jaccard(
            pf, images_df, CFG.shingle_k, CFG.jaccard_threshold
        ).select("a", "b").collect()
    }
    assert got == base


def test_batch_jaccard_equals_scalar_reference():
    """The whole-batch Jaccard (verify hot path since round 3) must be
    value-identical to the per-pair scalar: shingle sets via
    _shingle_hashes + intersect1d."""
    import random
    import string

    from dude_spark.detectors.minhash import _shingle_hashes
    from dude_spark.operators.verify import _batch_jaccard

    k = 6
    rng = random.Random(5)

    def cap():
        n = rng.randint(0, 60)
        return "".join(rng.choice("abcde ") for _ in range(n))

    ca: list = [None, "", "abc", "identical caption", cap()]
    cb: list = ["", None, "abd", "identical caption", cap()]
    for _ in range(300):
        x = cap()
        # mix: unrelated, near-dup (shared prefix), exact
        r = rng.random()
        y = x if r < 0.2 else (x + cap() if r < 0.6 else cap())
        ca.append(x)
        cb.append(y)
    got = _batch_jaccard(ca, cb, k)
    for i, (x, y) in enumerate(zip(ca, cb)):
        sx = _shingle_hashes(x or "", k)
        sy = _shingle_hashes(y or "", k)
        if sx.size == 0 and sy.size == 0:
            want = 1.0
        else:
            inter = np.intersect1d(sx, sy, assume_unique=True).size
            u = sx.size + sy.size - inter
            want = inter / u if u else 0.0
        assert got[i] == want, (i, repr(x), repr(y), got[i], want)
