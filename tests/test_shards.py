"""Training-shard writer (operators/shards.py).

Gates: exact size bound and id-contiguity per shard, deterministic
re-assignment, one parquet file per shard directory, manifest-after-
data verification round-trip (verify_shards empty on intact output,
non-empty on a tampered shard), and no single-partition exchange in
the assignment plan.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dude_spark.operators.shards import (
    MANIFEST_DIR,
    shard_assignment,
    verify_shards,
    write_training_shards,
)
from dude_spark.functions.splits import hash_split


def test_shard_assignment_bounded_contiguous_deterministic(images_df):
    rps = 37
    df = hash_split(images_df.select("image_id"))
    out = shard_assignment(df, rps, split_col="split").collect()
    by_shard: dict[tuple, list[str]] = {}
    for r in out:
        by_shard.setdefault((r["split"], r["shard"]), []).append(r["image_id"])
    per_split: dict[str, dict[int, list[str]]] = {}
    for (split, shard), ids in by_shard.items():
        per_split.setdefault(split, {})[shard] = sorted(ids)
    for split, shards in per_split.items():
        n = sum(len(v) for v in shards.values())
        # shards are 0..k dense; every shard full except possibly the last
        assert set(shards) == set(range(len(shards)))
        for k in range(len(shards) - 1):
            assert len(shards[k]) == rps, (split, k)
        assert 1 <= len(shards[len(shards) - 1]) <= rps
        # contiguity: shard k's ids all sort before shard k+1's
        for k in range(len(shards) - 1):
            assert max(shards[k]) < min(shards[k + 1]), (split, k)
        assert n == sum(1 for r in out if r["split"] == split)
    # deterministic under a different physical layout
    again = shard_assignment(
        df.repartition(13), rps, split_col="split"
    ).collect()
    assert {(r["image_id"], r["shard"]) for r in again} == {
        (r["image_id"], r["shard"]) for r in out
    }


def test_shard_assignment_no_split_and_validation(images_df):
    out = shard_assignment(images_df, 100)
    sizes = {
        r["shard"]: r["n"]
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    n_total = images_df.count()
    full, rem = divmod(n_total, 100)
    assert all(sizes[k] == 100 for k in range(full))
    if rem:
        assert sizes[full] == rem
    with pytest.raises(ValueError, match="rows_per_shard"):
        shard_assignment(images_df, 0)


def test_shard_assignment_plan_has_no_single_partition(images_df):
    plan = (
        shard_assignment(hash_split(images_df), 50, split_col="split")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_write_verify_roundtrip_and_tamper_detection(spark, images_df, tmp_path):
    out = str(tmp_path / "shards")
    df = hash_split(images_df.select("image_id", "caption"))
    manifest = write_training_shards(
        df, out, rows_per_shard=97, split_col="split"
    )
    man_rows = manifest.count()
    assert man_rows > 3  # several shards across three splits

    # exactly one data file per shard directory
    shard_dirs = glob.glob(f"{out}/split=*/shard=*")
    assert len(shard_dirs) == man_rows
    for d in shard_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d

    # full corpus round-trips through the written tree
    written = spark.read.parquet(out)
    assert written.count() == images_df.count()
    assert {r["image_id"] for r in written.select("image_id").collect()} == {
        r["image_id"] for r in images_df.select("image_id").collect()
    }

    # intact output verifies clean
    assert verify_shards(spark, out, split_col="split").count() == 0

    # tamper: drop one shard's data file -> that shard is reported
    victim = shard_dirs[0]
    for f in os.listdir(victim):
        os.remove(os.path.join(victim, f))
    os.rmdir(victim)
    bad = verify_shards(spark, out, split_col="split").collect()
    assert len(bad) == 1
    assert bad[0]["got_n_rows"] is None  # data side missing, manifest side present
    assert bad[0]["want_n_rows"] is not None

    # the manifest dir is invisible to the data scan (underscore rule)
    assert os.path.isdir(f"{out}/{MANIFEST_DIR}")
    assert "fingerprint" not in spark.read.parquet(out).columns
