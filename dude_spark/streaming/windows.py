"""Watermarked event-time aggregation over streams.

The streaming twins of ``functions/events.py``'s batch shapes — the
same tumbling-window and gap-session semantics, run as a real
Structured-Streaming query (readStream → withWatermark → groupBy →
append-mode parquet sink) instead of foreachBatch:

  start_windowed_stats    window(ts) per key under a watermark; a
                          window row is emitted exactly once, when the
                          watermark passes its end, and events arriving
                          later than the watermark are DROPPED — the
                          late-data contract the batch twin cannot
                          express.
  start_session_stats     session_window(ts, gap) per user under a
                          watermark: gap-based sessions (the streaming
                          twin of ``sessionize``) that merge as events
                          arrive and finalize once the watermark passes
                          session end + gap.

Design notes, scale-first:

- State size is bounded by the watermark: every open window/session
  older than (max event time − delay) is finalized and evicted, so
  executor state is O(keys × windows inside the delay horizon), not
  O(history).  That is the property that lets this run forever on an
  unbounded stream — the foreachBatch ingest path (ingest.py) instead
  keeps unbounded state in TABLES because a 10^12-row signature index
  doesn't belong in state stores; bounded windowed state does.
- ``n_users`` is ``approx_count_distinct`` here (HLL++): exact
  distinct aggregation is not supported on streaming DataFrames, and
  at stream scale an exact per-window distinct would hold every user
  id in state anyway.  The batch twin keeps the exact count (it is
  oracle-gated); the column is named ``n_users_approx`` so the two
  surfaces can't be confused.
- Append output mode + parquet sink: exactly-once per window row via
  the streaming checkpoint; downstream consumers read a plain table.
- The aggregation expressions are shared with the batch module
  (``value_x100``) so integerized sums hash identically across the
  batch oracle and the streaming sink.

Reference parity: the reference is batch-only (SURVEY §2.3 — no
streaming/watermarks); this surface comes from the north-star
LLM-pipeline scope, not DuDe.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.events import value_x100


def _stream(spark: SparkSession, input_dir: str, schema: str):
    return spark.readStream.schema(schema).parquet(input_dir)


def _start_append_sink(agg, out_dir: str, checkpoint_dir: str) -> StreamingQuery:
    """Shared sink contract for both window shapes: finalized-append
    to parquet, exactly-once per row via the streaming checkpoint,
    availableNow trigger (drain-everything-then-stop semantics)."""
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_windowed_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "ts timestamp, user_id long, event_type string, value double",
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> StreamingQuery:
    """Tumbling-window stats under a watermark, finalized-append to
    parquet.  Output schema: (win_start long, key, n_events long,
    n_users_approx long, sum_value_x100 long) — ``win_start`` as epoch
    seconds like the batch twin.

    Late rows (event time older than the watermark at batch start) are
    dropped by the engine before they reach the aggregate; a window is
    emitted exactly once, when the watermark passes its end.
    """
    events = _stream(spark, input_dir, schema).withWatermark(ts_col, watermark)
    agg = (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("win"), F.col(key_col)
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.approx_count_distinct("user_id").cast("long").alias("n_users_approx"),
            F.sum(value_x100(F.col("value"))).cast("long").alias("sum_value_x100"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("win_start"),
            key_col,
            "n_events",
            "n_users_approx",
            "sum_value_x100",
        )
    )
    return _start_append_sink(agg, out_dir, checkpoint_dir)


def start_session_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "ts timestamp, user_id long, event_type string, value double",
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> StreamingQuery:
    """Gap-based sessions per user via ``session_window`` under a
    watermark — the streaming twin of ``functions/events.sessionize``
    (same gap semantics: events of one user ≤ gap apart merge into one
    session).  Output schema: (user_id, session_start long, n_events
    long, sum_value_x100 long), one row per FINALIZED session — a
    session closes when the watermark passes its last event + gap.

    Session state per user is a handful of open windows inside the
    watermark horizon; the shuffle key is the user id, exactly like the
    batch twin's per-user window partitioning.
    """
    events = _stream(spark, input_dir, schema).withWatermark(ts_col, watermark)
    agg = (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col)
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_x100(F.col("value"))).cast("long").alias("sum_value_x100"),
        )
        .select(
            F.col(user_col),
            F.unix_timestamp(F.col("sess.start")).cast("long").alias("session_start"),
            "n_events",
            "sum_value_x100",
        )
    )
    return _start_append_sink(agg, out_dir, checkpoint_dir)
