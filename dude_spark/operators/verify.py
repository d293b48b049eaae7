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
    """pairs(a,b) ⨝ images twice → (a, b, <col>_a, <col>_b)."""
    proj = images.select("image_id", col)
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
    (SURVEY.md §2.1 O8 generalization)."""

    @F.pandas_udf("double")
    def jac(ca: pd.Series, cb: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(ca, cb):
            sx, sy = shingle_set(x, k), shingle_set(y, k)
            if not sx and not sy:
                out.append(1.0)  # two empty captions are identical
            else:
                u = len(sx | sy)
                out.append(len(sx & sy) / u if u else 0.0)
        return pd.Series(out, dtype="float64")

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
