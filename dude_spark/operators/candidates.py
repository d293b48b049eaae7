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


def overcap_stats(buckets: DataFrame, bucket_cap: int) -> DataFrame:
    """(bucket, bucket_size, bucket_min) for every over-cap bucket —
    the skew-detection aggregate.  Map-side combinable (two-stage
    HashAggregate): a hot key costs each map partition one combined
    row, so detection itself can never straggle."""
    return (
        buckets.groupBy("bucket")
        .agg(
            F.count("*").alias("bucket_size"),
            F.min("image_id").alias("bucket_min"),
        )
        .where(F.col("bucket_size") > bucket_cap)
    )


# Refuse exhaustive over-cap jobs above this many candidate pairs — a
# universal bucket at corpus scale is an impossible job, not a slow one.
_MAX_EXHAUSTIVE_PAIRS = 1_000_000_000

# Over-cap buckets collect to the driver only up to this many rows
# (the skew plan wants them broadcast anyway); above it — a corpus
# where a large share of ALL buckets overflows, i.e. the cap/detector
# selectivity mismatches the data — the plan falls back to deriving
# hot-key frames DISTRIBUTEDLY (plain joins, no driver
# materialization), so the driver never holds an unbounded row list.
_MAX_COLLECTED_OVERCAP = 100_000


def pairs_from_buckets(
    buckets: DataFrame, bucket_cap: int = 64, overcap_mode: str = "star"
) -> tuple[DataFrame, DataFrame]:
    """(image_id, bucket) → ((a, b) with a < b distinct, overcap stats).

    Returns ``(pairs, overcap)`` where ``overcap`` is
    ``(bucket, bucket_size)`` for every bucket larger than the cap —
    feed it to the lineage sink.

    ``overcap_mode`` picks the skew fallback by the CALLER's semantics:

    - ``"star"`` (default) — over-cap buckets degrade to star edges
      around the bucket min.  Right for ASSIGNMENT semantics: the
      connected-components stage restores the component through the
      star center, so cluster membership is preserved at O(b) edges.
    - ``"exhaustive"`` — over-cap buckets emit EVERY in-bucket pair
      through a salted block grid: each member gets a hash salt in
      [0, ceil(b/cap)); grid cell (i ≤ j) joins salt-i members against
      salt-j members, so no task ever sees more than ~2·cap rows and
      the b²/2 pairs spread over b²/(2·cap²) cells.  Required for PAIR
      semantics (an exact-oracle pair query, a recall-guaranteed LSH
      pairs operator): a verify stage downstream decides per pair, so
      a dropped candidate is a silently lost result — the ADVICE-r2
      cosine_dup_pairs finding, observed live as 9 missing
      substring_pairs at sf0.1.  The quadratic candidate count is
      intrinsic to exact pair semantics; this mode distributes it
      instead of dropping it (and ``overcap`` still records which
      buckets paid it).

    EAGER: calling this runs one Spark action (the map-side-combinable
    over-cap detection aggregate, collected — tiny by construction),
    which then selects between two static plans: the no-skew fast path
    (one window shuffle, measured ~2× faster end-to-end than the
    always-broadcast shape at n=600k because the fat exploded bucket
    table is scanned once, not three times) and the skewed path
    (broadcast star edges or the salted grid for the collected hot
    keys, window for the rest).  ``overcap`` is built from the
    collected rows — reading it costs nothing.
    """
    if overcap_mode not in ("star", "exhaustive"):
        raise ValueError(f"unknown overcap_mode: {overcap_mode!r}")
    b = buckets.where(F.col("bucket").isNotNull())
    spark = buckets.sparkSession

    # ADAPTIVE skew handling, zero extra passes when there is no skew.
    # The over-cap detection is the (count, min) aggregation the
    # durable overcap record needs anyway — map-side combinable, so a
    # hot key costs each map partition one combined row — collected
    # EAGERLY here (tiny by construction: the cap exists to defuse a
    # handful of pathological keys; a corpus where a large share of
    # buckets overflows needs a larger cap, and the record makes that
    # visible, never silent).
    hot_stats = overcap_stats(b, bucket_cap)
    overcap_rows = hot_stats.limit(_MAX_COLLECTED_OVERCAP + 1).collect()
    few_hot = len(overcap_rows) <= _MAX_COLLECTED_OVERCAP
    if few_hot:
        overcap_out = spark.createDataFrame(
            [(r["bucket"], r["bucket_size"]) for r in overcap_rows],
            schema=b.select(
                "bucket", F.lit(0).cast("long").alias("bucket_size")
            ).schema,
        )
        # (bucket, bucket_size, bucket_min) for the skew plan — tiny,
        # broadcast (the normal skew regime: a handful of hot keys)
        hot_df = F.broadcast(
            spark.createDataFrame(
                [
                    (r["bucket"], r["bucket_size"], r["bucket_min"])
                    for r in overcap_rows
                ],
                schema=hot_stats.schema,
            )
        ) if overcap_rows else None
    else:
        # Pathological regime: >100k over-cap buckets means the cap /
        # detector selectivity mismatches the corpus — still a
        # computable job for star semantics, so dedupe it
        # distributedly: hot-key frames stay DataFrames (plain joins,
        # no broadcast, nothing materialized on the driver).
        overcap_out = hot_stats.select("bucket", "bucket_size")
        hot_df = hot_stats

    if hot_df is not None:
        # Skewed input: hot rows leave the window path through a
        # broadcast join of the collected keys — the 10^8-row hot
        # bucket never streams through a single WindowExec task
        # (round-1 VERDICT "what's wrong" #7) — and are removed
        # map-side before the window.  Only actually-skewed inputs
        # pay these extra scans.
        if overcap_mode == "exhaustive":
            # Cost guard: exhaustive pair semantics is intrinsically
            # quadratic, and a universal bucket (boilerplate text
            # shared by 10^8 docs) means 10^15+ pairs — a job that
            # should be REFUSED loudly, not launched.  With few hot
            # keys the rows are already on the driver (bound is
            # free); in the pathological many-hot-keys regime it is
            # one 1-row aggregate action.
            if few_hot:
                grid_pairs = sum(
                    r["bucket_size"] * (r["bucket_size"] - 1) // 2
                    for r in overcap_rows
                )
                worst_size = max(r["bucket_size"] for r in overcap_rows)
            else:
                agg = hot_stats.agg(
                    F.sum(
                        F.col("bucket_size") * (F.col("bucket_size") - 1) / 2
                    ).alias("p"),
                    F.max("bucket_size").alias("w"),
                ).collect()[0]
                grid_pairs, worst_size = int(agg["p"]), agg["w"]
            if grid_pairs > _MAX_EXHAUSTIVE_PAIRS:
                raise ValueError(
                    f"exhaustive over-cap pairing would emit "
                    f"{grid_pairs:,} candidate pairs "
                    f"(largest bucket: {worst_size:,} members) — "
                    f"above the {_MAX_EXHAUSTIVE_PAIRS:,} safety bound. "
                    f"Raise bucket_cap selectivity (more bands/longer "
                    f"grams), drop the degenerate keys, or use "
                    f"overcap_mode='star' (assignment semantics)."
                )
            nb = hot_df.select(
                "bucket",
                F.ceil(F.col("bucket_size") / F.lit(bucket_cap))
                .cast("int")
                .alias("nb"),
            )
            salted = b.join(nb, "bucket").withColumn(
                "s", F.pmod(F.xxhash64("image_id"), F.col("nb")).cast("int")
            )
            # grid cell (gi <= gj): salt-gi members (role A) × salt-gj
            # members (role B).  A member with salt s plays role A in
            # cells (s, j>=s) and role B in cells (i<=s, s); the
            # diagonal cell emits both orders and least/greatest +
            # the final distinct() canonicalize.
            a_side = salted.select(
                "bucket",
                F.col("image_id").alias("pa"),
                F.col("s").alias("gi"),
                F.explode(
                    F.sequence(F.col("s"), F.col("nb") - F.lit(1))
                ).alias("gj"),
            )
            b_side = salted.select(
                "bucket",
                F.col("image_id").alias("pb"),
                F.explode(F.sequence(F.lit(0), F.col("s"))).alias("gi"),
                F.col("s").alias("gj"),
            )
            hot_pairs = (
                a_side.join(b_side, ["bucket", "gi", "gj"])
                .where(F.col("pa") != F.col("pb"))
                .select(
                    F.least("pa", "pb").alias("a"),
                    F.greatest("pa", "pb").alias("b"),
                )
            )
            hot_keys = nb.select("bucket")
        else:
            hot = hot_df.select("bucket", "bucket_min")
            hot_pairs = (
                b.join(hot, "bucket")
                .where(F.col("image_id") != F.col("bucket_min"))
                .select(
                    F.col("bucket_min").alias("a"), F.col("image_id").alias("b")
                )
            )
            hot_keys = hot.select("bucket")
        pairing_input = b.join(hot_keys, "bucket", "left_anti")
    else:
        hot_pairs = None
        pairing_input = b

    # Single fat shuffle for the pairing path: a partitionBy(bucket)
    # window annotates every row with its bucket size in place (no
    # fat-fat sizes join); every bucket here is <= cap rows, so no
    # window group can straggle.  Singleton buckets — the overwhelming
    # majority in LSH tables — are dropped BEFORE the pairing
    # self-join (≅ singleton-group drop, hashing.go:366-368), so the
    # self-join shuffles only rows that can actually pair.
    w = Window.partitionBy("bucket")
    pairing = pairing_input.select(
        "bucket", "image_id", F.count("*").over(w).alias("bucket_size")
    ).where(F.col("bucket_size") > 1)
    left = pairing.select("bucket", F.col("image_id").alias("a"))
    right = pairing.select("bucket", F.col("image_id").alias("b"))
    pairs = (
        left.join(right, "bucket").where(F.col("a") < F.col("b")).select("a", "b")
    )
    if hot_pairs is not None:
        pairs = pairs.unionByName(hot_pairs.select("a", "b"))
    return pairs.distinct(), overcap_out


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


def pairs_vs_known(
    new_buckets: DataFrame,
    known_buckets: DataFrame,
    bucket_cap: int = 64,
    context: str = "cross-corpus join",
) -> tuple[DataFrame, list]:
    """(a=known_id, b=new_id) bucket-equi pairs of a NEW batch against
    an already-processed KNOWN corpus — the incremental-dedup join the
    streaming path runs every micro-batch, exposed for batch callers.

    Both inputs are (image_id, bucket) frames.  Within-known pairs are
    never emitted (the known side is already deduplicated by contract);
    the caller adds within-new pairs via :func:`pairs_from_buckets`, or
    uses :func:`cross_corpus_pairs` for the standard composition.

    Skew contract for the KNOWN side, which grows without bound as a
    corpus accumulates (a boilerplate-caption bucket collects members
    forever): a bucket whose known membership exceeds ``bucket_cap``
    joins through its MIN known id only — O(new batch) output rows
    instead of O(batch x corpus) — computed with the map-side
    combinable ``overcap_stats`` aggregate, so one pathological bucket
    never owns a single fat task.  Connectivity is preserved (every
    new member still pairs with the known component's anchor).  The
    cut is RECORDED, never silent: returns ``(pairs, overcap_rows)``
    with one collected Row(bucket, bucket_size, bucket_min) per capped
    bucket for the caller's lineage sink.  More than
    ``_MAX_COLLECTED_OVERCAP`` capped buckets means the cap/detector
    selectivity mismatches the corpus and EVERY batch would pay it —
    refused loudly rather than OOMing the driver.

    Scale shape: the known side is first restricted to the batch's
    distinct buckets (broadcast of O(batch) keys at typical sizes,
    AQE picks the side), so the multi-TB known table is probed, never
    fully paired; the skew aggregate is collected eagerly so the pairs
    action scans the known table ONCE, not once per lazy reference.
    """
    spark = new_buckets.sparkSession
    known = known_buckets.select(
        F.col("image_id").alias("known_id"), "bucket"
    )
    batch_bkts = new_buckets.select("bucket").distinct()
    known_hit = known.join(batch_bkts, "bucket")
    overcap_rows = (
        overcap_stats(
            known_hit.select(F.col("known_id").alias("image_id"), "bucket"),
            bucket_cap,
        )
        .limit(_MAX_COLLECTED_OVERCAP + 1)
        .collect()
    )
    if len(overcap_rows) > _MAX_COLLECTED_OVERCAP:
        raise ValueError(
            f"{context} touches over {_MAX_COLLECTED_OVERCAP:,} over-cap "
            "KNOWN buckets — bucket_cap / detector selectivity mismatches "
            "this corpus; raise bucket_cap or use a more selective "
            "detector config"
        )
    if overcap_rows:
        hot_reps = F.broadcast(
            spark.createDataFrame(
                [(r["bucket"], r["bucket_min"]) for r in overcap_rows],
                schema=known_hit.select("bucket", "known_id").schema,
            )
        )
        join_side = known_hit.join(
            hot_reps.select("bucket"), "bucket", "left_anti"
        ).unionByName(hot_reps.select("bucket", "known_id"))
    else:
        join_side = known_hit
    pairs = (
        new_buckets.select(F.col("image_id").alias("new_id"), "bucket")
        .join(join_side, "bucket")
        .where(F.col("known_id") != F.col("new_id"))
        .select(F.col("known_id").alias("a"), F.col("new_id").alias("b"))
    )
    return pairs, overcap_rows


def cross_corpus_pairs(
    known_buckets: DataFrame,
    new_buckets: DataFrame,
    bucket_cap: int = 64,
    overcap_mode: str = "star",
) -> tuple[DataFrame, DataFrame]:
    """Incremental BATCH dedup: candidate pairs for a new batch against
    an existing corpus — within-new pairs plus new-vs-known pairs,
    never within-known ("dedupe this month's crawl against everything
    already ingested, without re-pairing the old side").

    The batch twin of the streaming micro-batch join (streaming/
    ingest._batch_pairs shares :func:`pairs_vs_known`), for users whose
    increments arrive as whole tables rather than a stream.  Both
    inputs are (image_id, bucket) frames from any detector's bucket
    stage.  Returns ``(pairs, overcap)`` where overcap carries
    (bucket, bucket_size, side∈{batch,known}) for the lineage sink —
    both cap mechanisms record, never silently truncate.  Pair
    orientation: within-new pairs are (a<b); cross pairs are
    (a=known, b=new); callers needing one namespace normalize with
    least/greatest.
    """
    vs_known, known_rows = pairs_vs_known(
        new_buckets, known_buckets, bucket_cap
    )
    vs_new, overcap_batch = pairs_from_buckets(
        new_buckets, bucket_cap, overcap_mode
    )
    overcap = overcap_batch.select(
        "bucket", "bucket_size", F.lit("batch").alias("side")
    )
    if known_rows:
        spark = new_buckets.sparkSession
        overcap = overcap.unionByName(
            spark.createDataFrame(
                [(r["bucket"], r["bucket_size"], "known") for r in known_rows],
                schema=overcap.schema,
            )
        )
    return vs_new.unionByName(vs_known).distinct(), overcap
