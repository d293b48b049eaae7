"""Structured-Streaming incremental dedup at ingest.

The streaming analogue of the reference's incremental cache semantics
(fileNeedsReHashing / cache upsert, /root/reference/internal/
processing/hashing.go:73-116): new rows arriving in an input directory
are fingerprinted once, compared against the durable signature state,
and every NEW duplicate pair (new-vs-known and new-vs-new) is appended
to a durable pairs table — so dedup keeps up with ingest instead of
re-scanning the corpus.

Shape: ``readStream`` (file source, exactly-once via the streaming
checkpoint) → ``foreachBatch``.  foreachBatch is the right tool here —
each micro-batch reuses the BATCH operators (detector signature
projection, bucket join) unchanged, and state lives in the same
parquet/Iceberg stage-store layout the batch pipeline uses, not in
executor state stores: the signature table at 10^12 rows belongs in a
table, not in per-executor HDFSBackedStateStores.  (For small keyed
state — e.g. per-bucket counters — ``applyInPandasWithState`` would be
the fit; for a multi-TB signature index it is not.)

Scale notes: the per-batch join is bucket-equi against the known-sigs
table (broadcast when the batch is small — AQE decides).  State writes
go to per-epoch partition directories with overwrite semantics, so a
replay after a mid-batch crash rewrites its own epoch exactly —
idempotent without transactions — and the known-sigs read filters the
current epoch out so a half-written attempt can't echo the batch back
at itself.  The streaming checkpoint and state_dir are a UNIT: wiping
the checkpoint but keeping state re-keys batch ids against stale
epochs — start a fresh state_dir with a fresh checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..detectors.exact import exact_buckets


def _batch_pairs(
    spark: SparkSession, sigs: DataFrame, state_sigs_path: str, batch_id: int
) -> DataFrame:
    """New duplicate pairs from one micro-batch's signatures:
    new-vs-known (bucket join against state) + new-vs-new (within
    batch), oriented (existing, newcomer).  Rows this same epoch wrote
    on a previous failed attempt are excluded from `known` via the
    epoch partition column — a replay must not see its own output."""
    new = sigs.select(
        F.col("image_id").alias("new_id"), F.col("bucket")
    )
    try:
        known = (
            spark.read.parquet(state_sigs_path)
            .where(F.col("epoch") != F.lit(batch_id))
            .select(F.col("image_id").alias("known_id"), F.col("bucket"))
        )
        vs_known = (
            new.join(known, "bucket")
            .where(F.col("known_id") != F.col("new_id"))
            .select(
                F.col("known_id").alias("a"), F.col("new_id").alias("b")
            )
        )
    except Exception:  # first batch — no state yet
        vs_known = None
    left = new.select("bucket", F.col("new_id").alias("a"))
    right = new.select("bucket", F.col("new_id").alias("b"))
    vs_new = left.join(right, "bucket").where(F.col("a") < F.col("b")).select("a", "b")
    out = vs_new if vs_known is None else vs_new.unionByName(vs_known)
    return out.distinct()


def start_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    schema,
    trigger_available_now: bool = True,
):
    """Start the ingest-dedup stream; returns the StreamingQuery.

    ``input_dir``: directory the producer appends parquet files to.
    ``state_dir``: holds ``sigs`` (durable signature table), ``pairs``
    (append-only duplicate pairs found so far), and ``checkpoint``
    (Spark's streaming offsets/commit log — exactly-once file-source
    tracking).  ``schema``: the images schema (file streams require an
    explicit schema).  With ``trigger_available_now`` the query drains
    everything currently available and stops — the batch-friendly test
    and catch-up mode; pass False for a continuous micro-batch stream.
    """
    sigs_path = os.path.join(state_dir, "sigs")
    pairs_path = os.path.join(state_dir, "pairs")
    epochs_path = os.path.join(state_dir, "epochs")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # Replay idempotency WITHOUT transactions: every epoch writes
        # its own partition directory with mode('overwrite'), so a
        # crash anywhere mid-batch leaves a replay that simply
        # overwrites the same epoch=N dirs — no duplicate rows — and
        # _batch_pairs filters epoch == batch_id out of `known` so a
        # half-written sigs dir can't echo the batch back at itself.
        # The marker only short-circuits fully-committed epochs (with
        # Iceberg this is one atomic multi-table commit instead).
        marker = os.path.join(epochs_path, f"epoch_{batch_id}")
        if os.path.exists(marker):
            return
        sigs = exact_buckets(batch_df).select("image_id", "bucket")
        pairs = _batch_pairs(spark, sigs, sigs_path, batch_id)
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"epoch={batch_id}")
        )
        sigs.write.mode("overwrite").parquet(
            os.path.join(sigs_path, f"epoch={batch_id}")
        )
        os.makedirs(epochs_path, exist_ok=True)
        with open(marker, "w") as f:
            f.write("done")

    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
