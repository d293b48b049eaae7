"""Bucket → candidate-pair generation with skew-safe capping.

The generalization of DuDe's group-by-hash (O7,
/root/reference/internal/processing/hashing.go:321-382): rows sharing a
bucket key become candidate pairs.  Naive within-bucket pairing is
O(b²) per bucket — fatal for the hot-key skew block (one bucket holding
10^8 rows at scale).  Strategy, per bucket size s:

  s <= cap      full pair set {(a,b): a<b}  — self-join on the bucket
                key; AQE skew-join splits any residual imbalance.
  s > cap       STAR edges to the bucket's min image_id — computed with
                a map-side-combinable min aggregation + one equi-join,
                so no single task ever materializes the bucket.  Star
                edges preserve connectivity exactly (same connected
                components), and pair verification against the minimum
                member IS the reference's semantics: ParanoidMode
                byte-compares every group member to the representative
                (hashing.go:135-239).

Over-cap buckets are never silently truncated: they are counted and
returned for the lineage table (SURVEY.md §2.2 — "cap bucket size with
a documented counter ... absence of silent truncation is our rule").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairs_from_buckets(
    buckets: DataFrame, bucket_cap: int = 64, persist_sizes: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(image_id, bucket) → ((a, b) with a < b distinct, overcap stats).

    Returns ``(pairs, overcap)`` where ``overcap`` is
    ``(bucket, bucket_size)`` for every bucket that fell back to star
    edges — feed it to the lineage sink.

    ``persist_sizes=True`` caches the bucket-size aggregate
    (MEMORY_AND_DISK) so materializing `pairs` and `overcap` as two
    separate actions computes the bucket groupBy once, not twice; the
    caller owns unpersisting (pipeline does, after the stage writes).
    """
    b = buckets.where(F.col("bucket").isNotNull())

    sizes = b.groupBy("bucket").agg(
        F.count("*").alias("bucket_size"),
        F.min("image_id").alias("bucket_min"),
    )
    if persist_sizes:
        sizes = sizes.persist()
    # singleton buckets can never pair — drop before the join
    # (≅ singleton-group drop, hashing.go:366-368)
    sized = b.join(
        F.broadcast(sizes.where(F.col("bucket_size") > 1))
        if _small_enough(sizes)
        else sizes.where(F.col("bucket_size") > 1),
        "bucket",
    )

    small = sized.where(F.col("bucket_size") <= bucket_cap)
    big = sized.where(F.col("bucket_size") > bucket_cap)

    left = small.select("bucket", F.col("image_id").alias("a"))
    right = small.select("bucket", F.col("image_id").alias("b"))
    full_pairs = left.join(right, "bucket").where(F.col("a") < F.col("b"))

    star_pairs = big.where(F.col("image_id") != F.col("bucket_min")).select(
        F.col("bucket_min").alias("a"), F.col("image_id").alias("b")
    )

    pairs = (
        full_pairs.select("a", "b")
        .unionByName(star_pairs.select("a", "b"))
        .distinct()
    )
    overcap = sizes.where(F.col("bucket_size") > bucket_cap).select(
        "bucket", "bucket_size"
    )
    if persist_sizes:
        overcap.sizes_df = sizes  # type: ignore[attr-defined]  # unpersist handle
    return pairs, overcap


def _small_enough(sizes: DataFrame) -> bool:
    # Catalyst/AQE pick broadcast automatically from statistics; we do
    # not force it (sizes can be huge at scale). Kept as a hook.
    return False


def salt_buckets(buckets: DataFrame, salt: int) -> DataFrame:
    """Pre-aggregation salting for *grouping* hot bucket keys.

    Splits each bucket into ``salt`` sub-buckets by a hash of the row
    id: ``bucket#s``.  Used by two-stage aggregations over bucket keys
    (e.g. bucket-size histograms) so one hot key cannot pin a single
    reducer; the final stage re-aggregates over the unsalted key.
    NOT used for pair generation (pairing must see the whole bucket —
    the star-edge fallback above is the pairing-side skew defense).
    """
    return buckets.withColumn(
        "bucket_salted",
        F.concat_ws("#", F.col("bucket"), (F.pmod(F.xxhash64("image_id"), F.lit(salt))).cast("string")),
    )
