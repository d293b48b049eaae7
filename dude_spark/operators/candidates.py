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

    # Hot buckets are handled WITHOUT ever colocating them: a map-side-
    # combinable (count, min) aggregation finds the over-cap keys (a
    # hot key costs each map partition one combined row), those few
    # keys broadcast back, and star edges are emitted by a broadcast
    # join — the 10^8-row hot bucket never streams through one reducer
    # task (round-1 VERDICT "what's wrong" #7: the old
    # Window.partitionBy put the whole hot bucket through a single
    # WindowExec task).  The broadcast assumes over-cap keys are FEW —
    # true by construction: the cap exists to defuse a handful of
    # pathological keys (empty captions, constant phash); a corpus
    # where a large share of buckets overflows needs a larger cap,
    # and the overcap record makes that visible, never silent.
    sizes = b.groupBy("bucket").agg(
        F.count("*").alias("bucket_size"),
        F.min("image_id").alias("bucket_min"),
    )
    overcap = sizes.where(F.col("bucket_size") > bucket_cap)
    star_pairs = (
        b.join(F.broadcast(overcap.select("bucket", "bucket_min")), "bucket")
        .where(F.col("image_id") != F.col("bucket_min"))
        .select(F.col("bucket_min").alias("a"), F.col("image_id").alias("b"))
    )

    # Under-cap rows (hot keys removed map-side by a broadcast
    # anti-join) take the single-fat-shuffle window path: every
    # remaining bucket has <= cap rows, so no window group can
    # straggle.  Singleton buckets — the overwhelming majority in LSH
    # tables — are dropped BEFORE the pairing self-join (≅ singleton-
    # group drop, hashing.go:366-368), so the self-join shuffles only
    # rows that can actually pair.
    small_rows = b.join(
        F.broadcast(overcap.select("bucket")), "bucket", "left_anti"
    )
    w = Window.partitionBy("bucket")
    pairing = small_rows.select(
        "bucket", "image_id", F.count("*").over(w).alias("bucket_size")
    ).where(F.col("bucket_size") > 1)
    left = pairing.select("bucket", F.col("image_id").alias("a"))
    right = pairing.select("bucket", F.col("image_id").alias("b"))
    full_pairs = left.join(right, "bucket").where(F.col("a") < F.col("b"))

    pairs = (
        full_pairs.select("a", "b")
        .unionByName(star_pairs.select("a", "b"))
        .distinct()
    )
    overcap_out = overcap.select("bucket", "bucket_size")
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
