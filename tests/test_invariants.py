"""Per-row payload invariants (BASELINE.json input_hint) + skew guards.

  * decoded pixels stay allclose: lossless formats bit-exact, lossy
    formats PSNR >= 40 dB vs the source pixels;
  * captions remain byte-equal end-to-end — the pipeline never mutates
    payloads (reference analogue: DuDe only ever reads file content,
    internal/processing/hashing.go:316);
  * the hot-bucket star fallback keeps candidate volume linear in
    bucket size (the 10^12-scale skew defense, SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dude_spark.fixtures import build_row, generate_pdf
from dude_spark.imagecodec import decode, encode, phash64, psnr
from dude_spark.operators.candidates import pairs_from_buckets


def test_codec_roundtrip_psnr():
    rs = np.random.RandomState(3)
    for fmt in ("png", "jpeg", "gif"):
        pix = rs.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        out, got_fmt = decode(encode(pix, fmt))
        assert got_fmt == fmt
        if fmt == "png":
            assert (out == pix).all()  # lossless bit-exact
        else:
            assert psnr(pix, out) >= 40.0, fmt  # input_hint invariant


def test_fixture_rows_decode_within_psnr(fixture_pdf):
    ok = fixture_pdf[~fixture_pdf.truth_kind.eq("degenerate")]
    for r in ok.head(100).itertuples():
        pix, fmt = decode(bytes(r.bytes))
        assert fmt == r.fmt
        assert pix.shape == (r.h, r.w, 3)
    # decoded-vs-source PSNR for lossy rows: regenerate source pixels
    # deterministically and compare (allclose contract)
    from dude_spark.fixtures import _pixels, _rs

    lossy = fixture_pdf[fixture_pdf.fmt.isin(["jpeg", "gif"]) & fixture_pdf.truth_kind.eq("exact")]
    for r in lossy.head(20).itertuples():
        group = int(r.image_id.split("_")[2])
        src = _pixels(_rs(42, "exact", group), 32, 32)
        got, _ = decode(bytes(r.bytes))
        assert psnr(src, got) >= 40.0


def test_pipeline_never_mutates_payloads(spark, fixture_pdf, tmp_path_factory):
    """Round-trip through the engine's stage materialization: captions
    byte-equal, bytes byte-equal."""
    from dude_spark.fixtures import IMAGES_COLUMNS

    d = tmp_path_factory.mktemp("inv")
    path = str(d / "images.parquet")
    spark.createDataFrame(fixture_pdf[IMAGES_COLUMNS]).write.parquet(path)
    back = spark.read.parquet(path).toPandas().set_index("image_id")
    src = fixture_pdf.set_index("image_id")
    for image_id in src.index[:200]:
        assert back.loc[image_id, "caption"] == src.loc[image_id, "caption"]
        assert bytes(back.loc[image_id, "bytes"] or b"") == bytes(
            src.loc[image_id, "bytes"] or b""
        )


def test_phash_deterministic():
    rs = np.random.RandomState(5)
    pix = rs.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    assert phash64(pix) == phash64(pix.copy())
    row_a = build_row(3, 600)
    row_b = build_row(3, 600)
    assert row_a["phash"] == row_b["phash"]
    assert row_a["bytes"] == row_b["bytes"]


def test_star_fallback_is_linear_not_quadratic(spark):
    """A 5,000-row hot bucket yields 4,999 star edges, not 12.5M pairs
    — the property that keeps one 10^8-row bucket survivable at scale."""
    n = 5000
    pdf = pd.DataFrame(
        {"image_id": [f"id_{i:05d}" for i in range(n)], "bucket": ["HOT"] * n}
    )
    buckets = spark.createDataFrame(pdf)
    pairs, overcap = pairs_from_buckets(buckets, bucket_cap=64)
    assert pairs.count() == n - 1
    rep = pairs.agg(F.min("a")).collect()[0][0]
    assert rep == "id_00000"  # all edges anchored at the bucket min
    oc = overcap.collect()
    assert len(oc) == 1 and oc[0]["bucket_size"] == n
