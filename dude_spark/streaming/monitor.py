"""Live hot-bucket monitor: small keyed state done the state-store way.

The ingest pipeline (streaming/ingest.py) keeps its multi-TB signature
index in TABLES — per its own docstring, executor state stores are the
wrong home for state that grows with the corpus.  This module is the
complement it names as the right fit: per-BUCKET running counters,
state that grows with the number of distinct buckets a detector emits
(bounded, small, keyed) — implemented as a real custom stateful
operator with ``applyInPandasWithState``.

What it does: watch the (image_id, bucket) stream a detector produces
and raise an alert the moment any bucket's CUMULATIVE membership
crosses ``threshold`` — i.e. detect a boilerplate caption / degenerate
signature / skew key while it is accumulating, epochs before a batch
job would trip over the hot bucket.  Each alert fires exactly once per
threshold crossing (the state remembers it fired), and subsequent
growth reports are emitted every ``report_every`` further members so
operators can watch a hot key keep heating.

Scale contract: state per key is three longs — count, alerted flag,
last reported count — so 10^9 distinct buckets cost ~tens of GB across
ALL executors' state stores, and the state store only ever sees keys
the stream actually touched.  The counting itself is pre-aggregated
per micro-batch by the vectorized pandas path (one state update per
touched key per batch, not per row).

Reference analogue: none — DuDe's progress counters
(/root/reference/internal/processing/progress.go) count files hashed,
not key skew; this operator exists because at 10^12 rows the skew IS
the operational risk (SURVEY §9).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("members", LongType()),
        StructField("kind", StringType()),  # 'alert' | 'growth'
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("count", LongType()),
        StructField("alerted", LongType()),
        StructField("last_reported", LongType()),
    ]
)


def hot_bucket_alerts(
    buckets: DataFrame,
    threshold: int,
    report_every: int = 0,
    bucket_col: str = "bucket",
    id_col: str = "image_id",
) -> DataFrame:
    """Streaming (bucket, members, kind) alerts from an (id, bucket)
    stream: ``kind='alert'`` exactly once when a bucket's cumulative
    count first reaches ``threshold``; ``kind='growth'`` at most once
    per micro-batch when the count has grown ≥ ``report_every`` since
    the last report (0 = no growth reports) — growth is deliberately
    coalesced per batch: a key gaining 100 members in one batch emits
    ONE report at the new count, not ten interval rows.

    Members are distinct ``id_col`` values WITHIN each batch (a
    detector emitting (id, bucket) twice in one batch counts once);
    cross-batch redeliveries DO re-count — remembering every seen id
    per bucket would grow state with the corpus, which is exactly what
    this operator's three-longs-per-key contract exists to avoid.
    Exactly-once delivery therefore comes from the ingest layer's
    idempotent epochs (streaming/ingest.py), not from the monitor.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    if report_every < 0:
        raise ValueError(f"report_every must be >= 0, got {report_every}")

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        yield from _update_groups(
            key, pdfs, state, threshold, report_every
        )

    return (
        buckets.select(
            F.col(bucket_col).cast("string").alias("bucket"),
            F.col(id_col).cast("string").alias("member_id"),
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            update,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _update_groups(key, pdfs, state, threshold, report_every):
    """The state-transition kernel, separated so tests can drive it
    with a fake GroupState: old (count, alerted, last_reported) + this
    batch's rows -> new state + emitted alert rows.  Counts distinct
    member_id per batch when the column is present (plain row count
    otherwise, for kernel-level tests)."""
    bucket = key[0]
    seen: set = set()
    batch_n = 0
    for pdf in pdfs:
        if "member_id" in pdf.columns:
            seen.update(pdf["member_id"])
        else:
            batch_n += len(pdf)
    batch_n += len(seen)
    if state.exists:
        count, alerted, last_reported = state.get
    else:
        count, alerted, last_reported = 0, 0, 0
    count += batch_n
    out = []
    if not alerted and count >= threshold:
        alerted = 1
        last_reported = count
        out.append((bucket, count, "alert"))
    elif alerted and report_every and count - last_reported >= report_every:
        last_reported = count
        out.append((bucket, count, "growth"))
    state.update((count, alerted, last_reported))
    if out:
        yield pd.DataFrame(out, columns=["bucket", "members", "kind"])
