"""Event-stream aggregation surface: tumbling windows + sessionization.

The shapes a training-data/telemetry pipeline runs over timestamped
event tables (the driver's `events` table), built scale-first:

  tumbling_window_stats   groupBy(window(ts), key) — a plain hash
                          aggregate with map-side combine; the batch
                          twin of a Structured-Streaming windowed agg
                          (readStream + same expression + watermark).
  sessionize              gap-based session assignment via
                          lag/cumsum windows PARTITIONED BY USER —
                          each user's event sequence is one partition,
                          so there is no global-order window anywhere
                          (the length_deciles lesson); skew is bounded
                          by the hottest single user, and the session
                          id is deterministic (first event's epoch).

Outputs are integers (epoch seconds, counts, value sums pre-rounded
per event to ×100 longs) so the DuckDB oracle twins hash exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_x100(value: Column) -> Column:
    """Per-EVENT integerization of a 2-decimal double (×100, round,
    long) — rounding before the sum keeps cross-engine float summation
    order out of the result entirely."""
    return F.round(value * 100).cast("long")


def _window_stats(
    events: DataFrame, w: Column, key_col: str, user_col: str, value_col: str
) -> DataFrame:
    """The shared (window, key) hash aggregate behind tumbling and
    sliding stats — partial map-side combine, no window functions."""
    return (
        events.groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct(user_col).cast("long").alias("n_users"),
            F.sum(value_x100(F.col(value_col))).cast("long").alias("sum_value_x100"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("win_start"),
            key_col,
            "n_events",
            "n_users",
            "sum_value_x100",
        )
    )


def tumbling_window_stats(
    events: DataFrame,
    window: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per (tumbling window, key): event count, distinct users, and
    per-event-rounded value sum.  One hash aggregate — partial
    map-side combine, no window functions; identical expression works
    under readStream with a watermark."""
    return _window_stats(
        events, F.window(F.col(ts_col), window), key_col, user_col, value_col
    )


def sliding_window_stats(
    events: DataFrame,
    window: str = "1 day",
    slide: str = "6 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per (sliding window, key) stats: each event lands in every
    epoch-aligned window of length ``window`` starting at a multiple
    of ``slide`` that covers it.  Spark's window generator replicates
    the event MAP-SIDE into its window/slide overlapping windows, then
    the same single hash aggregate as tumbling runs — so the scale
    cost is exactly the overlap factor (4 at 1 day / 6 hours), chosen
    explicitly by the caller, never a hidden blowup."""
    return _window_stats(
        events,
        F.window(F.col(ts_col), window, slide),
        key_col,
        user_col,
        value_col,
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    to the previous event of the SAME user exceeds ``gap_minutes``.
    Returns one row per session: (user, session_start epoch seconds,
    n_events, sum_value_x100).

    lag + running-sum windows partitioned by user — per-user task
    locality, no SinglePartition exchange; at 10^12 events the shuffle
    key is the user id and the cost profile is an ordinary keyed
    window."""
    ts = F.col(ts_col).cast("timestamp")
    # order by the CAST column: ordering and gap arithmetic must see
    # the same chronology (a raw string ts_col would sort
    # lexicographically — '2024-9…' > '2024-10…' — and lag() would
    # pick the wrong previous event)
    per_user = Window.partitionBy(user_col).orderBy(ts)
    # full-precision timestamp comparison (microseconds): second-
    # truncating epoch arithmetic here would disagree with any oracle
    # (or any other engine) at sub-second boundaries
    prev = F.lag(ts).over(per_user)
    new_sess = F.when(
        prev.isNull()
        | (ts > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = events.withColumn("_new", new_sess).withColumn(
        "_sess",
        F.sum("_new").over(
            per_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy(user_col, "_sess")
        .agg(
            F.unix_timestamp(F.min(ts)).cast("long").alias("session_start"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_x100(F.col(value_col))).cast("long").alias("sum_value_x100"),
        )
        .select(
            F.col(user_col).cast("long").alias(user_col),
            "session_start",
            "n_events",
            "sum_value_x100",
        )
    )
