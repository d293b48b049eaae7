"""Structured-Streaming incremental dedup: new files → new pairs only."""

from __future__ import annotations

import os

from dude_spark.streaming import start_incremental_dedup


def _write_batch(spark, input_dir: str, rows: list[tuple[str, bytes]]):
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    df.coalesce(1).write.mode("append").parquet(input_dir)


def _drain(spark, input_dir, state_dir, schema):
    q = start_incremental_dedup(spark, input_dir, state_dir, schema)
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_dedup_stream(spark, tmp_path):
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"

    # epoch 1: one within-batch dup pair
    _write_batch(
        spark,
        input_dir,
        [("a", b"payload-1"), ("b", b"payload-1"), ("c", b"unique-1")],
    )
    _drain(spark, input_dir, state_dir, schema)
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    assert pairs == {("a", "b")}

    # epoch 2: a new file duplicates a KNOWN row and adds its own dup;
    # restarting the query picks up only the new file (checkpoint)
    _write_batch(
        spark,
        input_dir,
        [("d", b"payload-1"), ("e", b"unique-2"), ("f", b"unique-2")],
    )
    _drain(spark, input_dir, state_dir, schema)
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    # new-vs-known: a-d and b-d; new-vs-new: e-f; epoch-1 pair NOT re-emitted
    assert pairs == {("a", "b"), ("a", "d"), ("b", "d"), ("e", "f")}

    # durable signature state holds every row seen
    sigs = spark.read.parquet(os.path.join(state_dir, "sigs"))
    assert sigs.count() == 6

    # epoch markers make foreachBatch replays idempotent
    epochs = os.listdir(os.path.join(state_dir, "epochs"))
    assert len(epochs) == 2

    # state lands in per-epoch partition dirs — a replay overwrites its
    # own epoch instead of appending duplicates
    pair_dirs = {
        d for d in os.listdir(os.path.join(state_dir, "pairs"))
        if d.startswith("epoch=")
    }
    assert pair_dirs == {"epoch=0", "epoch=1"}
