"""Watermarked streaming windows: finalize-once + late-data drop."""

from __future__ import annotations

import os
from datetime import datetime

from dude_spark.streaming import start_session_stats, start_windowed_stats

SCHEMA = "ts timestamp, user_id long, event_type string, value double"


def _ts(h, m):
    return datetime(2026, 1, 15, h, m, 0)


def _write(spark, input_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        input_dir
    )


def _drain(start_fn, spark, dirs, **kw):
    q = start_fn(spark, dirs["in"], dirs["out"], dirs["ckpt"], **kw)
    q.awaitTermination(180)
    assert not q.isActive


def _read_out(spark, out_dir):
    try:
        return spark.read.parquet(out_dir).collect()
    except Exception:
        return []  # sink dir not created until the first emitted row


def test_windowed_stats_watermark_drops_late_and_emits_once(spark, tmp_path):
    dirs = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    # epoch 1: two users in window [10:00, 10:05) + a sentinel at 11:00
    # that advances the watermark to 10:50 once the batch commits
    _write(
        spark,
        dirs["in"],
        [
            (_ts(10, 0), 1, "click", 1.25),
            (_ts(10, 1), 2, "click", 2.50),
            (_ts(11, 0), 3, "click", 0.10),
        ],
    )
    _drain(start_windowed_stats, spark, dirs)

    # epoch 2: a LATE click for the 10:00 window (event time 10:02 <
    # watermark 10:50 -> engine drops it) + fresh data at 12:00
    _write(
        spark,
        dirs["in"],
        [
            (_ts(10, 2), 9, "click", 99.0),
            (_ts(12, 0), 4, "click", 0.20),
        ],
    )
    _drain(start_windowed_stats, spark, dirs)

    rows = _read_out(spark, dirs["out"])
    w1 = [r for r in rows if r["win_start"] == int(_ts(10, 0).timestamp())]
    # finalized exactly once, late row NOT counted (else n=3 / sum=10275)
    assert len(w1) == 1
    assert w1[0]["n_events"] == 2
    assert w1[0]["sum_value_x100"] == 375
    assert w1[0]["n_users_approx"] == 2

    # epoch 3: advance the watermark past the 11:00 window -> it
    # finalizes now, exactly once, across a THIRD checkpoint restart
    _write(spark, dirs["in"], [(_ts(13, 0), 5, "click", 0.30)])
    _drain(start_windowed_stats, spark, dirs)

    rows = _read_out(spark, dirs["out"])
    w11 = [r for r in rows if r["win_start"] == int(_ts(11, 0).timestamp())]
    assert len(w11) == 1 and w11[0]["n_events"] == 1
    # the 10:00 window was not re-emitted by later batches
    assert len([r for r in rows if r["win_start"] == int(_ts(10, 0).timestamp())]) == 1


def test_session_stats_gap_merge_and_finalize(spark, tmp_path):
    dirs = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    # user 1: three events 10 min apart (gap 30m -> ONE session);
    # user 2: one event; user 3: sentinel advancing the watermark
    _write(
        spark,
        dirs["in"],
        [
            (_ts(10, 0), 1, "view", 1.00),
            (_ts(10, 10), 1, "view", 2.00),
            (_ts(10, 20), 1, "view", 3.00),
            (_ts(10, 5), 2, "view", 5.00),
            (_ts(12, 0), 3, "view", 0.01),
        ],
    )
    _drain(start_session_stats, spark, dirs)

    # new data at 12:35 moves the watermark to 12:25 — past both early
    # sessions' (end+gap) but still short of user 3's 12:30 session end
    # even if an extra no-data micro-batch runs with the post-batch
    # watermark (version-robust)
    _write(spark, dirs["in"], [(_ts(12, 35), 4, "view", 0.02)])
    _drain(start_session_stats, spark, dirs)

    rows = {r["user_id"]: r for r in _read_out(spark, dirs["out"])}
    # user 1's events merged into one session despite arriving as
    # separate aggregate groups (session_window merge semantics)
    assert rows[1]["n_events"] == 3
    assert rows[1]["sum_value_x100"] == 600
    assert rows[1]["session_start"] == int(_ts(10, 0).timestamp())
    assert rows[2]["n_events"] == 1
    # user 3's session (end 12:00 + 30m gap = 12:30) is still open at
    # watermark 12:25 -> not finalized, not emitted
    assert 3 not in rows
