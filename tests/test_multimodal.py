"""Multimodal operators: decode/features/resize plumbing + stub contracts."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import PythonException
from pyspark.sql import functions as F

from dude_spark.fixtures import IMAGES_COLUMNS
from dude_spark.imagecodec import decode
from dude_spark.operators.multimodal import (
    AUDIO_FEATURES_SCHEMA,
    decode_images,
    extract_audio_features,
    extract_features,
    resize_images,
    sample_video_frames,
)


def test_decode_images_skip_and_count(spark, images_df, fixture_pdf):
    out = decode_images(images_df).toPandas().set_index("image_id")
    bad = fixture_pdf[fixture_pdf.truth_kind == "degenerate"]
    # undecodable/empty-bytes degenerate rows: ok=false with an error,
    # run does NOT fail (files.go:59-70 contract)
    def _undecodable(b) -> bool:
        try:
            decode(bytes(b or b""))
            return False
        except Exception:
            return True

    bad_ids = [r.image_id for r in bad.itertuples() if _undecodable(r.bytes)]
    assert bad_ids
    for i in bad_ids:
        assert not out.loc[i, "ok"] and out.loc[i, "err"]
    good = out[out.ok]
    assert len(good) == len(out) - len(bad_ids)
    # decoded dims match the metadata columns for healthy rows
    src = fixture_pdf.set_index("image_id")
    for i in good.index[:50]:
        assert int(good.loc[i, "w"]) == int(src.loc[i, "w"])
        assert int(good.loc[i, "h"]) == int(src.loc[i, "h"])


def test_extract_features_matches_phash_column(spark, images_df, fixture_pdf):
    feat = extract_features(images_df)
    # filter Spark-side: a pandas int64 column with NaNs silently
    # becomes float64 and corrupts 64-bit phash values in the test
    ok = feat.where(F.col("ok")).toPandas().set_index("image_id")
    src = fixture_pdf.set_index("image_id")
    assert len(ok) > 500
    for i in ok.index[:100]:
        # phash recomputed from decoded pixels must equal the input
        # column for lossless rows (png); lossy rows may differ slightly
        if src.loc[i, "fmt"] == "png":
            assert int(ok.loc[i, "phash"]) == int(src.loc[i, "phash"]), i
        assert 0.0 <= ok.loc[i, "brightness"] <= 255.0


def test_resize_images(spark, images_df):
    out = resize_images(images_df, 16, 16).toPandas()
    ok = out[out.ok]
    assert len(ok) > 500
    row = ok.iloc[0]
    pix, fmt = decode(bytes(row["bytes"]))
    assert pix.shape == (16, 16, 3)
    assert fmt == row["fmt"]


def test_audio_video_stubs_raise_cleanly(spark, images_df):
    clips = images_df.select(
        F.col("image_id").alias("clip_id"), F.col("bytes")
    )
    stub = extract_audio_features(clips)
    # schema/plumbing real even though the body is stubbed
    assert [f.name for f in stub.schema.fields] == [
        "clip_id", "ok", "duration_s", "rms", "zero_crossings"
    ]
    with pytest.raises(PythonException) as exc:
        stub.limit(1).collect()
    assert "NotImplementedError" in str(exc.value)

    vids = images_df.select(F.col("image_id").alias("video_id"), F.col("bytes"))
    with pytest.raises(PythonException) as exc:
        sample_video_frames(vids).limit(1).collect()
    assert "NotImplementedError" in str(exc.value)
