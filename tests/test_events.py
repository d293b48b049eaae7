"""functions/events.py — tumbling windows + sessionization gates.

Value-level equivalence vs the DuckDB twins is covered end-to-end by
test_entry_oracle (event_window_stats / user_sessions); here: session
semantics on a hand-built timeline, and the scale contract that
sessionize plans NO SinglePartition exchange (its windows are
partitioned by user — the length_deciles lesson, test_ranking.py:60).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from dude_spark.functions.events import sessionize, tumbling_window_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    pdf = pd.DataFrame(
        [
            {
                "event_id": i,
                "ts": T0 + dt.timedelta(seconds=s),
                "user_id": u,
                "event_type": et,
                "value": v,
            }
            for i, (u, s, et, v) in enumerate(rows)
        ]
    )
    return spark.createDataFrame(pdf).repartition(5)


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: two events 29m59s apart (one session), then a gap of
        # exactly 30m (same session — strictly-greater contract), then
        # 30m + 1us (new session)
        (1, 0, "a", 1.0),
        (1, 1799, "a", 1.0),
        (1, 1799 + 1800, "a", 1.0),
        (1, 1799 + 1800 + 1800.000001, "a", 1.0),
        # user 2: single event
        (2, 50, "b", 2.5),
    ]
    out = sessionize(_events(spark, rows), gap_minutes=30).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2
    sizes = sorted(r["n_events"] for r in per_user[1])
    assert sizes == [1, 3]
    assert len(per_user[2]) == 1
    assert per_user[2][0]["sum_value_x100"] == 250


def test_sessionize_plans_no_single_partition(spark):
    df = _events(spark, [(u, u * 7, "a", 1.0) for u in range(200)])
    plan = (
        sessionize(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_tumbling_window_day_boundaries(spark):
    rows = [
        (1, 10, "a", 1.0),               # day 0
        (2, 86399, "a", 2.0),            # day 0, last second
        (3, 86400, "a", 4.0),            # day 1, first second
        (1, 86400 * 2 + 5, "b", 8.0),    # day 2, other type
    ]
    out = tumbling_window_stats(_events(spark, rows)).collect()
    by_key = {(r["win_start"], r["event_type"]): r for r in out}
    epoch0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert by_key[(epoch0, "a")]["n_events"] == 2
    assert by_key[(epoch0, "a")]["n_users"] == 2
    assert by_key[(epoch0, "a")]["sum_value_x100"] == 300
    assert by_key[(epoch0 + 86400, "a")]["n_events"] == 1
    assert by_key[(epoch0 + 2 * 86400, "b")]["sum_value_x100"] == 800
