"""Paranoid verification join — kill false-positive candidate pairs.

Reference: ParanoidMode byte-compares every group member against the
representative in 4096-byte chunks and removes unequal members
(/root/reference/internal/processing/hashing.go:135-287); on a compare
*error* the pair is KEPT (assumed equal, hashing.go:219-222) — we keep
that error contract.

Spark-first: one join of the (small) pairs DataFrame against the images
table on each side, projecting ONLY the columns the predicate needs —
`bytes` never rides a shuffle except here (SURVEY.md §7 hard-part (e):
"project early, join late by image_id").  Exact verification is a pure
JVM predicate (length precheck + binary equality — Catalyst orders the
cheap conjunct first); Jaccard verification is a vectorized pandas UDF
over caption pairs; Hamming verification is JVM `bit_count(xor)`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attach(pairs: DataFrame, images: DataFrame, col: str) -> DataFrame:
    """pairs(a,b) ⨝ images twice → (a, b, <col>_a, <col>_b).

    The payload projection is first SEMI-JOINED down to rows that
    actually appear in a pair: candidate pairs touch a small fraction
    of the corpus, and the distinct pair-member key set is narrow, so
    AQE turns the semi-join into a broadcast and the full-width
    payload column (`bytes` is KB-scale per row) is never shuffled at
    table width — only the reduced ~|pairs| slice moves.  When pairs
    ARE huge, AQE falls back to a shuffle semi-join, which is then the
    honest minimum.  (SURVEY.md §7 hard-part (e): keep `bytes` out of
    every shuffle except the verify join — and even there, only the
    verified slice.)
    """
    proj = images.select("image_id", col)
    keys = (
        pairs.select(F.col("a").alias("image_id"))
        .unionByName(pairs.select(F.col("b").alias("image_id")))
        .distinct()
    )
    proj = proj.join(keys, "image_id", "leftsemi")
    return (
        pairs.join(
            proj.select(
                F.col("image_id").alias("a"), F.col(col).alias(f"{col}_a")
            ),
            "a",
        )
        .join(
            proj.select(
                F.col("image_id").alias("b"), F.col(col).alias(f"{col}_b")
            ),
            "b",
        )
    )


def verify_exact(pairs: DataFrame, images: DataFrame) -> DataFrame:
    """Keep pairs whose `bytes` are byte-equal (ParanoidMode for D0).

    Null bytes on either side → kept (error→assume-equal contract,
    hashing.go:219-222).
    """
    j = _attach(pairs, images, "bytes")
    keep = (
        F.col("bytes_a").isNull()
        | F.col("bytes_b").isNull()
        | (
            (F.length("bytes_a") == F.length("bytes_b"))
            & (F.col("bytes_a") == F.col("bytes_b"))
        )
    )
    return j.where(keep).select("a", "b")


def shingle_set(text: str, k: int) -> set:
    if text is None:
        return set()
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def verify_jaccard(
    pairs: DataFrame, images: DataFrame, k: int, threshold: float
) -> DataFrame:
    """Keep pairs whose caption k-shingle Jaccard >= threshold — the
    exact-similarity recheck that kills MinHash-LSH false positives
    (SURVEY.md §2.1 O8 generalization).

    Computed over 64-bit hashed shingle sets (the same vectorized
    rolling-hash as the D1 signature) with np.intersect1d — ~20×
    faster than Python string-set intersection per pair, and exact up
    to 64-bit hash collisions (probability ~|A||B|/2^64 per pair —
    immaterial even at 10^12 pairs).  tests/test_minhash.py re-checks
    survivors against raw string shingle sets.
    """
    import numpy as np

    from ..detectors.minhash import _shingle_hashes

    @F.pandas_udf("double")
    def jac(ca: pd.Series, cb: pd.Series) -> pd.Series:
        out = np.empty(len(ca), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ca, cb)):
            sx = _shingle_hashes(x or "", k)
            sy = _shingle_hashes(y or "", k)
            if sx.size == 0 and sy.size == 0:
                out[i] = 1.0  # two empty captions are identical
                continue
            inter = np.intersect1d(sx, sy, assume_unique=True).size
            u = sx.size + sy.size - inter
            out[i] = inter / u if u else 0.0
        return pd.Series(out)

    j = _attach(pairs, images, "caption")
    return (
        j.withColumn("score", jac("caption_a", "caption_b"))
        .where(F.col("score") >= F.lit(threshold))
        .select("a", "b", "score")
    )


def verify_hamming(pairs: DataFrame, signatures: DataFrame, radius: int) -> DataFrame:
    """Keep pairs whose 64-bit signature Hamming distance <= radius.

    `signatures` is (image_id, sig long); the distance is JVM-side
    `bit_count(sig_a ^ sig_b)` — no Python in the hot path.
    """
    j = _attach(pairs, signatures, "sig")
    dist = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        j.withColumn("hamming", dist)
        .where(F.col("hamming") <= F.lit(radius))
        .select("a", "b", "hamming")
    )
