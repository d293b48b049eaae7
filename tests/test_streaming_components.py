"""Incremental connected components at ingest: per-epoch assignment
maintenance must equal batch CC over the cumulative pairs table."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dude_spark.operators.components import connected_components
from dude_spark.storage import ShardedEpochStore
from dude_spark.streaming import (
    assignment_stores,
    current_assignments,
    start_incremental_dedup,
    update_assignments,
)


def _assign_map(spark, store):
    return {
        r["image_id"]: r["cluster_id"]
        for r in current_assignments(spark, store).collect()
    }


def _batch_cc_map(spark, all_pairs):
    df = spark.createDataFrame(all_pairs, "a string, b string")
    return {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }


def test_incremental_cc_equals_batch_cc(spark, tmp_path):
    """Epoch-by-epoch folds — including chain merges that force a
    LARGER existing cluster to be rewritten when a smaller-id member
    arrives — must match batch CC over the union of all pairs after
    every single epoch."""
    a_store, m_store = assignment_stores(spark, str(tmp_path), n_shards=4)
    epochs = [
        # epoch 0: two separate clusters {m,n,o} (min m) and {x,y}
        [("n", "m"), ("o", "n"), ("x", "y")],
        # epoch 1: new id z joins {x,y}; separate fresh pair {q,r}
        [("z", "x"), ("q", "r")],
        # epoch 2: id "a" (global min) merges {m,n,o} — the whole
        # 3-member cluster must be rewritten to cluster a
        [("a", "o")],
        # epoch 3: bridge {q,r} and {x,y,z} — two existing clusters
        # merge; min(q, x) wins and the loser's members rewrite
        [("r", "y")],
        # epoch 4: already-same-cluster pair (no-op) + dup of epoch-0
        [("m", "n"), ("x", "z")],
    ]
    cumulative = []
    for e, pairs in enumerate(epochs):
        pdf = spark.createDataFrame(pairs, "a string, b string")
        audit = update_assignments(spark, a_store, m_store, pdf, e)
        cumulative += pairs
        assert _assign_map(spark, a_store) == _batch_cc_map(spark, cumulative), (
            f"divergence after epoch {e}"
        )
        assert audit["epoch"] == e
    # epoch 4 was pure no-op pairs: nothing written
    assert audit["assign_rows_written"] == 0


def test_incremental_cc_merge_size_audit(spark, tmp_path):
    """Every component rewrite is durably recorded under merges/ —
    (epoch, winning_cluster, losing_cluster, rewritten_members), the
    overcap-record convention applied to the one unbounded-looking
    cost in the streaming path.  Chain-merge fixture; no behavior
    change (assignments still equal batch CC)."""
    a_store, m_store = assignment_stores(spark, str(tmp_path), n_shards=4)
    epochs = [
        [("n", "m"), ("o", "n"), ("x", "y")],   # {m,n,o}, {x,y}
        [("a", "o")],                           # tiny id rewrites {m,n,o}
        [("m", "x")],                           # {a..o} ∪ {x,y}: x loses
    ]
    audits = []
    for e, pairs in enumerate(epochs):
        pdf = spark.createDataFrame(pairs, "a string, b string")
        audits.append(update_assignments(spark, a_store, m_store, pdf, e))

    def merges(e):
        return {
            (r["winning_cluster"], r["losing_cluster"],
             r["rewritten_members"], r["epoch"])
            for r in spark.read.parquet(
                os.path.join(str(tmp_path), "merges", f"epoch={e}")
            ).collect()
        }

    # epoch 0: no prior state — no merges dir at all
    assert not os.path.exists(
        os.path.join(str(tmp_path), "merges", "epoch=0")
    )
    assert audits[0]["merges"] is None
    # epoch 1: "a" wins cluster m, all 3 members rewritten
    assert merges(1) == {("a", "m", 3, 1)}
    assert audits[1]["merges"] == {"n_merges": 1, "rewritten_members": 3}
    # epoch 2: cluster a absorbs cluster x (2 members rewritten)
    assert merges(2) == {("a", "x", 2, 2)}
    assert audits[2]["merges"] == {"n_merges": 1, "rewritten_members": 2}
    # behavior unchanged
    assert _assign_map(spark, a_store) == _batch_cc_map(
        spark, [p for ep in epochs for p in ep]
    )


def test_incremental_cc_replay_idempotent(spark, tmp_path):
    """A replayed epoch (same id, same pairs — the foreachBatch crash
    contract) must leave the state byte-identical: epoch-partition
    overwrite + own-epoch exclusion on every state read."""
    a_store, m_store = assignment_stores(spark, str(tmp_path), n_shards=4)
    p0 = spark.createDataFrame([("b", "c")], "a string, b string")
    p1 = spark.createDataFrame([("a", "b")], "a string, b string")
    update_assignments(spark, a_store, m_store, p0, 0)
    update_assignments(spark, a_store, m_store, p1, 1)
    want = {"a": "a", "b": "a", "c": "a"}
    assert _assign_map(spark, a_store) == want
    # replay epoch 1 twice more — a half-written previous attempt is
    # exactly this shape (its own epoch rows already on disk)
    update_assignments(spark, a_store, m_store, p1, 1)
    update_assignments(spark, a_store, m_store, p1, 1)
    assert _assign_map(spark, a_store) == want


def test_incremental_cc_scans_are_pruned(spark, tmp_path):
    """The whole point: an epoch touching one small component must not
    read the full assignment state.  With many spread-out clusters in
    state, a single-pair epoch opens a strict subset of shards."""
    a_store, m_store = assignment_stores(spark, str(tmp_path), n_shards=8)
    seed = [(f"u{i}", f"v{i}") for i in range(32)]
    update_assignments(
        spark, a_store, m_store,
        spark.createDataFrame(seed, "a string, b string"), 0,
    )
    audit = update_assignments(
        spark, a_store, m_store,
        spark.createDataFrame([("u3", "w")], "a string, b string"), 1,
    )
    assert 0 < audit["assign_scan"]["shards_touched"] < 8
    assert 0 < audit["assign_scan"]["files_read"] < a_store.total_data_files()


def test_stream_assign_clusters_end_to_end(spark, tmp_path):
    """assign_clusters=True in the ingest loop: groups stay current
    across epochs + restart, match batch CC over the durable pairs
    table, survive compaction (latest/distinct modes), and a replay
    re-emits nothing."""
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            n_state_shards=4, assign_clusters=True, compact_every=2,
        )
        q.awaitTermination(120)
        assert not q.isActive

    def write(rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    write([("d1", b"p"), ("d2", b"p"), ("s1", b"q")])
    drain()
    write([("d3", b"p"), ("s2", b"r"), ("a0", b"q"), ("s1b", b"q")])
    drain()

    a_store, _ = assignment_stores(spark, state_dir, 4)
    got = _assign_map(spark, a_store)
    pairs = spark.read.parquet(os.path.join(state_dir, "pairs"))
    want = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == want
    assert got["d1"] == got["d2"] == got["d3"] == "d1"
    assert got["s1"] == got["a0"] == got["s1b"] == "a0"  # min-id rewrite

    # compaction ran after epoch 1 — assign/members live as one base
    with open(os.path.join(state_dir, "compactions", "epoch_1.json")) as f:
        audit = json.load(f)
    assert audit["assign"]["gen"] == 1
    assert audit["members"]["gen"] == 1
    # post-compaction epoch still folds correctly against base state
    write([("d4", b"p")])
    drain()
    got = _assign_map(spark, a_store)
    assert got["d4"] == "d1"
    # per-epoch scan audit carries the assignment fold's prune stats
    with open(os.path.join(state_dir, "scans", "epoch_2.json")) as f:
        scan = json.load(f)
    assert scan["assign"]["epoch"] == 2


@pytest.mark.parametrize("seed", [7, 23, 61])
def test_incremental_cc_randomized_streams(spark, tmp_path, seed):
    """Seeded fuzz: random pair streams over a small id universe (so
    merges are frequent), with a compaction injected mid-stream, must
    equal batch CC over the cumulative pairs after EVERY epoch.  A
    hypothesis-per-example Spark round trip would be minutes per
    example; three seeded streams buy the same breadth tractably."""
    import random

    rng = random.Random(seed)
    ids = [f"n{i:02d}" for i in range(12)]
    a_store, m_store = assignment_stores(
        spark, str(tmp_path / str(seed)), n_shards=4
    )
    compact_at = rng.randrange(1, 4)
    cumulative = []
    for e in range(5):
        pairs = [
            tuple(rng.sample(ids, 2)) for _ in range(rng.randrange(1, 5))
        ]
        pdf = spark.createDataFrame(pairs, "a string, b string")
        update_assignments(spark, a_store, m_store, pdf, e)
        cumulative += pairs
        assert _assign_map(spark, a_store) == _batch_cc_map(spark, cumulative), (
            f"seed {seed}: divergence after epoch {e} (pairs {cumulative})"
        )
        if e == compact_at:
            a_store.compact(e, dedup="latest")
            m_store.compact(e, dedup="distinct")
            assert _assign_map(spark, a_store) == _batch_cc_map(
                spark, cumulative
            ), f"seed {seed}: divergence after compaction at epoch {e}"
