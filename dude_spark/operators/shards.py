"""Training-shard writer: size-bounded, reproducible, verifiable.

The last step of an LLM training-data pipeline — after dedup,
decontamination, quality filtering, and splitting, the surviving corpus
must land on disk as fixed-size shards a data loader can stream.  The
reference's analogue is its CSV report sink (the one file it writes,
internal/processing/results.go); this generalizes it to the sink a
10^12-row corpus needs:

- **Size-bounded**: every shard holds <= ``rows_per_shard`` rows,
  EXACTLY (not in expectation) — shard index is derived from the
  distributed global rank (functions/ranking.with_global_rank: range
  partition + per-partition offsets; no single-partition window at any
  size), so shard ``k`` is full before shard ``k+1`` opens.
- **Reproducible**: assignment is a pure function of (id order, split,
  rows_per_shard).  Re-running the writer over the same corpus yields
  byte-identical shard membership — the property that makes a training
  run resumable and an ablation comparable.
- **One file per shard**: rows are repartitioned on the shard key
  before a ``partitionBy(split, shard)`` write, so each shard directory
  receives exactly one parquet file whose task held all its rows.
- **Verifiable**: a manifest row per shard (rows, id bounds, an
  order-insensitive ``bit_xor(xxhash64(id))`` fingerprint) is written
  AFTER the data — the pipeline's manifest-after-data contract
  (storage.py; reference cache semantics hashing.go:73-116) — and
  ``verify_shards`` recomputes it from the written files, returning the
  mismatching shards (empty = intact).

Fingerprints use ``bit_xor``, not ``sum``: Spark 4 runs ANSI mode and a
sum over 2^63-scale hashes overflows; xor is associative, commutative,
and overflow-free, so the check is order- and partitioning-independent.

Append contract (deliberate asymmetry with functions/splits): shard
membership is a function of the WHOLE corpus's id order — an appended
row re-ranks everything after its insertion point, so sharding is a
final full-corpus materialization step, re-run per training snapshot.
Identity-stable assignment under appends belongs to the SPLIT layer
(hash_split / deterministic_sample), which is append-stable by
construction and feeds this writer its ``split_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ranking import with_global_rank

MANIFEST_DIR = "_shard_manifest"


def shard_assignment(
    df: DataFrame,
    rows_per_shard: int,
    id_col: str = "image_id",
    split_col: str | None = None,
    out_col: str = "shard",
) -> DataFrame:
    """Append ``out_col`` = 0-based shard index: exactly
    ``rows_per_shard`` consecutive ids per shard (the last shard of
    each split may be short), numbered independently within each split
    when ``split_col`` is given.

    Equals ``(row_number() OVER (PARTITION BY split ORDER BY id) - 1)
    DIV rows_per_shard`` — computed without any single-partition
    window: one range-partitioned rank pass, then (with splits) a
    broadcast join against the per-split minimum rank, since ranks
    under ORDER BY (split, id) are contiguous per split.
    """
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    order = ([split_col] if split_col else []) + [id_col]
    ranked = with_global_rank(df, order, out_col="__rn")
    if split_col:
        offsets = ranked.groupBy(split_col).agg(F.min("__rn").alias("__off"))
        ranked = ranked.join(F.broadcast(offsets), split_col)
        local = F.col("__rn") - F.col("__off")
    else:
        local = F.col("__rn")
    return (
        ranked.withColumn("__local", local)
        # integer DIV, not float /: at 10^12 ranks a float64 quotient
        # can land 1 ulp under the integer and mis-shard a boundary row
        .withColumn(out_col, F.expr(f"__local DIV {int(rows_per_shard)}"))
        .drop("__rn", "__off", "__local")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    rows_per_shard: int,
    id_col: str = "image_id",
    split_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as one parquet file per (split, shard), plus a
    per-shard manifest; returns the manifest DataFrame.

    Layout: ``out_dir/split=train/shard=0/part-*.parquet`` (or just
    ``shard=N`` without a split column) and
    ``out_dir/_shard_manifest/`` holding
    ``(split?, shard, n_rows, min_id, max_id, fingerprint)``.
    The manifest is written strictly after the data so a reader that
    sees a manifest row can trust the shard it describes (the same
    manifest-after-data ordering the stage store uses).
    """
    assigned = shard_assignment(
        df, rows_per_shard, id_col=id_col, split_col=split_col
    )
    keys = ([split_col] if split_col else []) + ["shard"]
    # every shard's rows in ONE task -> exactly one file per shard dir;
    # task size is bounded by rows_per_shard, so no skew risk
    (
        assigned.repartition(*[F.col(k) for k in keys])
        .write.mode("overwrite")
        .partitionBy(*keys)
        .parquet(out_dir)
    )
    manifest = _shard_stats(assigned, keys, id_col)
    manifest.write.mode("overwrite").parquet(f"{out_dir}/{MANIFEST_DIR}")
    return manifest


def _shard_stats(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.min(id_col).cast("string").alias("min_id"),
        F.max(id_col).cast("string").alias("max_id"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("fingerprint"),
    )


def verify_shards(
    spark: SparkSession,
    out_dir: str,
    id_col: str = "image_id",
    split_col: str | None = None,
) -> DataFrame:
    """Recompute every shard's stats from the written files and return
    the shards whose manifest row is missing or disagrees (plus
    manifest rows whose shard data is gone).  Empty result = intact.

    One scan of the shard tree + one broadcast-size join against the
    manifest — cheap enough to run before every training job.
    """
    keys = ([split_col] if split_col else []) + ["shard"]
    # the _-prefixed manifest dir is invisible to this scan: Spark's
    # file index treats _*/.* entries as hidden (same rule that hides
    # _SUCCESS), which is exactly why MANIFEST_DIR lives where it does
    written = spark.read.parquet(out_dir)
    got = _shard_stats(written, keys, id_col)
    want = spark.read.parquet(f"{out_dir}/{MANIFEST_DIR}")
    cmp_cols = ["n_rows", "min_id", "max_id", "fingerprint"]
    g = got.select(*keys, *[F.col(c).alias(f"got_{c}") for c in cmp_cols])
    w = want.select(*keys, *[F.col(c).alias(f"want_{c}") for c in cmp_cols])
    joined = g.join(w, keys, "full_outer")
    bad = [
        F.col(f"got_{c}").isNull()
        | F.col(f"want_{c}").isNull()
        | (F.col(f"got_{c}") != F.col(f"want_{c}"))
        for c in cmp_cols
    ]
    cond = bad[0]
    for b in bad[1:]:
        cond = cond | b
    return joined.where(cond)
