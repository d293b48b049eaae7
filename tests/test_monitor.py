"""Hot-bucket monitor (streaming/monitor.py): applyInPandasWithState.

Kernel gates run without Spark (fake GroupState); the streaming gate
drives a real file-source stream across two query restarts sharing one
checkpoint — the cumulative count must survive the restart in the
state store and alert exactly once at the crossing.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dude_spark.streaming.monitor import _update_groups, hot_bucket_alerts


class _FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run(state, rows_in_batch, threshold, report_every=0):
    pdfs = [pd.DataFrame({"bucket": ["k"] * rows_in_batch})]
    out = list(_update_groups(("k",), pdfs, state, threshold, report_every))
    return [t for pdf in out for t in pdf.itertuples(index=False)]


def test_kernel_alert_fires_once_at_crossing():
    st = _FakeState()
    assert _run(st, 3, threshold=5) == []  # below threshold: silence
    assert st.get == (3, 0, 0)
    hits = _run(st, 4, threshold=5)  # 3+4 = 7 crosses 5
    assert [(h.bucket, h.members, h.kind) for h in hits] == [("k", 7, "alert")]
    assert st.get == (7, 1, 7)
    assert _run(st, 10, threshold=5) == []  # no re-alert, no growth (off)
    assert st.get == (17, 1, 7)


def test_kernel_growth_reports_every_n():
    st = _FakeState()
    assert [h.kind for h in _run(st, 5, 5, report_every=10)] == ["alert"]
    assert _run(st, 9, 5, report_every=10) == []  # 14 - 5 = 9 < 10
    hits = _run(st, 1, 5, report_every=10)  # 15 - 5 = 10
    assert [(h.members, h.kind) for h in hits] == [(15, "growth")]
    hits = _run(st, 25, 5, report_every=10)  # 40 - 15 = 25 >= 10
    assert [(h.members, h.kind) for h in hits] == [(40, "growth")]


def test_kernel_validation():
    with pytest.raises(ValueError, match="threshold"):
        hot_bucket_alerts(None, 0)
    with pytest.raises(ValueError, match="report_every"):
        hot_bucket_alerts(None, 5, report_every=-1)


def test_streaming_alerts_across_restarts(spark, tmp_path):
    """Cumulative counts live in the state store: 3 members in epoch 1
    + 2 in epoch 2 cross threshold=5 only in epoch 2, exactly once,
    across a full query stop/start on the same checkpoint."""
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "alerts")
    os.makedirs(in_dir)

    def drain(name):
        # memory sinks can't recover a checkpoint; foreachBatch can.
        stream = (
            spark.readStream.schema("image_id string, bucket string")
            .parquet(in_dir)
        )
        q = (
            hot_bucket_alerts(stream, threshold=5)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        return [
            (r["bucket"], r["members"], r["kind"])
            for r in spark.read.parquet(out_dir).collect()
        ]

    # epoch 1: hot has 3 members, cold has 1 — nobody crosses 5
    spark.createDataFrame(
        [("a", "hot"), ("b", "hot"), ("c", "hot"), ("d", "cold")],
        "image_id string, bucket string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    assert drain("mon_e1") == []

    # epoch 2 (fresh query, same checkpoint): +2 hot = 5 -> one alert
    spark.createDataFrame(
        [("e", "hot"), ("f", "hot"), ("g", "cold")],
        "image_id string, bucket string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    assert drain("mon_e2") == [("hot", 5, "alert")]

    # epoch 3: more hot rows but already alerted (report_every=0);
    # the sink accumulates, so the one epoch-2 alert is all there is
    spark.createDataFrame(
        [("h", "hot"), ("i", "hot")], "image_id string, bucket string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    assert drain("mon_e3") == [("hot", 5, "alert")]


def test_kernel_dedups_members_within_batch():
    """Duplicate (id, bucket) rows in ONE batch count once; the same id
    re-delivered in a LATER batch re-counts (documented: per-key state
    stays three longs, cross-batch dedup belongs to the ingest layer)."""
    st = _FakeState()
    pdfs = [pd.DataFrame({"member_id": ["a", "a", "b"]}),
            pd.DataFrame({"member_id": ["b", "c"]})]
    out = list(_update_groups(("k",), pdfs, st, 5, 0))
    assert out == [] and st.get[0] == 3  # {a, b, c}
    pdfs = [pd.DataFrame({"member_id": ["a", "d"]})]  # 'a' again: +2
    hits = [t for pdf in _update_groups(("k",), pdfs, st, 5, 0)
            for t in pdf.itertuples(index=False)]
    assert [(h.members, h.kind) for h in hits] == [(5, "alert")]
