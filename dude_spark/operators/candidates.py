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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairs_from_buckets(
    buckets: DataFrame, bucket_cap: int = 64
) -> tuple[DataFrame, DataFrame]:
    """(image_id, bucket) → ((a, b) with a < b distinct, overcap stats).

    Returns ``(pairs, overcap)`` where ``overcap`` is
    ``(bucket, bucket_size)`` for every bucket that fell back to star
    edges — feed it to the lineage sink.  Materializing the two as
    separate actions is fine: the overcap aggregate is map-side
    combinable, so its recompute cost is one combined row per map
    partition per hot bucket.
    """
    b = buckets.where(F.col("bucket").isNotNull())

    # ONE shuffle of the fat bucket table: a partitionBy(bucket) window
    # annotates every row with its bucket's size and min in place — no
    # fat-fat equi-join (the naive b ⋈ sizes shape shuffles the
    # exploded table twice and dominated candidate-stage wall).
    # Singleton buckets — the overwhelming majority in LSH tables —
    # are then dropped BEFORE the pairing self-join (≅ singleton-group
    # drop, hashing.go:366-368), so the self-join shuffles only rows
    # that can actually pair.
    #
    # Mega-bucket skew note: a window colocates each bucket on one
    # reducer (as any bucket-keyed operator must to enumerate the
    # bucket), but its per-row state is O(1) — a 10^8-row hot bucket
    # streams through one task; its output is capped to star edges
    # below, never materializing O(s^2) pairs.
    w = Window.partitionBy("bucket")
    sized = b.select(
        "bucket",
        "image_id",
        F.count("*").over(w).alias("bucket_size"),
        F.min("image_id").over(w).alias("bucket_min"),
    )

    small = sized.where(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= bucket_cap)
    )
    left = small.select("bucket", F.col("image_id").alias("a"))
    right = small.select("bucket", F.col("image_id").alias("b"))
    full_pairs = left.join(right, "bucket").where(F.col("a") < F.col("b"))

    star_pairs = (
        sized.where(
            (F.col("bucket_size") > bucket_cap)
            & (F.col("image_id") != F.col("bucket_min"))
        )
        .select(F.col("bucket_min").alias("a"), F.col("image_id").alias("b"))
    )

    pairs = (
        full_pairs.select("a", "b")
        .unionByName(star_pairs.select("a", "b"))
        .distinct()
    )
    # overcap record: separate map-side-combinable aggregation (its
    # shuffle volume is one combined row per map partition per hot
    # bucket — noise), so no persist is needed across the two actions.
    overcap_out = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > bucket_cap)
    )
    return pairs, overcap_out


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
        F.concat_ws(
            "#",
            F.col("bucket").cast("string"),  # bucket keys are long for LSH detectors
            F.pmod(F.xxhash64("image_id"), F.lit(salt)).cast("string"),
        ),
    )
