"""Structured-Streaming incremental dedup: new files → new pairs only."""

from __future__ import annotations

import os

import pytest

from dude_spark.streaming import minhash_ingest, start_incremental_dedup


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


def test_stream_state_read_is_pruned(spark, tmp_path):
    """The round-3 top defect: every micro-batch re-scanned the WHOLE
    accumulated sigs/rows state.  With the ShardedEpochStore, epoch 2
    must open a STRICT SUBSET of the state files — only the shards its
    own keys hash into — and the per-epoch prune audit under scans/
    records it durably (files_read < files_total for both the sigs
    and the rows state)."""
    import json

    from pyspark.sql import functions as F

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"

    def verify_bytes(pairs, rows):
        ra = rows.select(F.col("image_id").alias("a"), F.col("bytes").alias("ba"))
        rb = rows.select(F.col("image_id").alias("b"), F.col("bytes").alias("bb"))
        return (
            pairs.join(ra, "a").join(rb, "b")
            .where(F.col("ba") == F.col("bb"))
            .select("a", "b")
        )

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            verify_fn=verify_bytes, state_cols=("bytes",),
            n_state_shards=8,
        )
        q.awaitTermination(120)
        assert not q.isActive

    # epoch 1: 40 distinct payloads + one dup — buckets land in (nearly)
    # every one of the 8 shards, so the state is spread wide
    _write_batch(
        spark,
        input_dir,
        [(f"u{i}", f"payload-{i}".encode()) for i in range(40)]
        + [("dup0", b"payload-0")],
    )
    drain()

    # epoch 2: ONE newcomer duplicating one known payload — its bucket
    # hashes into one shard, so the sigs read must open only that
    # shard's files across epochs, not the whole state
    _write_batch(spark, input_dir, [("x", b"payload-7")])
    drain()

    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    assert pairs == {("dup0", "u0"), ("u7", "x")}

    with open(os.path.join(state_dir, "scans", "epoch_1.json")) as f:
        audit = json.load(f)
    assert audit["n_state_shards"] == 8
    # the audit itself is O(batch) — files opened + shards touched; the
    # TOTAL is globbed once here (a per-epoch total listing would be
    # the very O(corpus) driver cost the store removes)
    from dude_spark.storage import ShardedEpochStore

    sig_total = ShardedEpochStore(
        spark, state_dir, "sigs", key_col="bucket", n_shards=8
    ).total_data_files()
    row_total = ShardedEpochStore(
        spark, state_dir, "rows", key_col="image_id", n_shards=8
    ).total_data_files()
    assert 0 < audit["sigs"]["files_read"] < sig_total
    assert 0 < audit["sigs"]["shards_touched"] < 8
    assert 0 < audit["rows"]["files_read"] < row_total
    assert 0 < audit["rows"]["shards_touched"] < 8

    # the shard count is pinned for the state dir's lifetime: a restart
    # with a different value would silently move every key's shard
    with pytest.raises(ValueError, match="n_state_shards"):
        start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            verify_fn=verify_bytes, state_cols=("bytes",),
            n_state_shards=16,
        )


_BASE = (
    "the quick brown fox jumps over the lazy dog beside the quiet riverbank "
    "at dawn while distant church bells echo across the misty valley and "
    "fishermen prepare their nets for the morning catch"
)


def test_incremental_dedup_stream_minhash(spark, tmp_path):
    """Near-dup-at-ingest (round-2 VERDICT next #5): the D1 MinHash-LSH
    detector wired through foreachBatch — planted near-dup captions
    across epochs pair up new-vs-known AND new-vs-new, candidates are
    exact-Jaccard verified, and a restart re-emits nothing."""
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, caption string"
    bucket_fn, verify_fn, state_cols = minhash_ingest()

    def write(rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn, state_cols=state_cols,
        )
        q.awaitTermination(180)
        assert not q.isActive

    near1 = _BASE.replace("quick", "swift")
    uniq1 = (
        "completely different text about spark shuffle partitions and "
        "parquet footers that shares no phrases with the pastoral scene"
    )
    # epoch 1: a~b near-dups within the batch, c unrelated
    write([("a", _BASE), ("b", near1), ("c", uniq1)])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b")}

    # epoch 2: d is a near-dup of KNOWN a/b (cross-epoch); e~f are
    # near-dups of each other within the batch; restart picks up only
    # the new file (streaming checkpoint)
    near2 = _BASE.replace("dawn", "dusk")
    uniq2 = (
        "another unrelated caption mentioning watermark state stores and "
        "arrow record batches flowing through vectorized python workers"
    )
    write([("d", near2), ("e", uniq2), ("f", uniq2 + " nightly")])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b"), ("a", "d"), ("b", "d"), ("e", "f")}

    # verification payloads persisted per epoch for new-vs-known checks
    rows_state = spark.read.parquet(os.path.join(state_dir, "rows"))
    assert rows_state.count() == 6
    assert set(rows_state.columns) >= {"image_id", "caption", "epoch"}

    # epoch markers + per-epoch overwrite partitions: replay-idempotent
    assert len(os.listdir(os.path.join(state_dir, "epochs"))) == 2


def test_stream_known_side_bucket_cap(spark, tmp_path):
    """A bucket whose KNOWN membership exceeds bucket_cap joins new
    rows through its min known id only — O(batch) pairs per epoch
    instead of O(batch × corpus) — and the cut lands in the durable
    overcap record (no silent truncation)."""
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"

    # epoch 1: 9 byte-identical rows — one exact bucket in state
    _write_batch(
        spark, input_dir, [(f"k{i}", b"hot-payload") for i in range(9)]
    )
    _drain_capped(spark, input_dir, state_dir, schema, bucket_cap=4)

    # epoch 2: two newcomers hit the hot known bucket
    _write_batch(spark, input_dir, [("x", b"hot-payload"), ("y", b"hot-payload")])
    _drain_capped(spark, input_dir, state_dir, schema, bucket_cap=4)

    e2 = spark.read.parquet(os.path.join(state_dir, "pairs", "epoch=1"))
    vs_known = {(r["a"], r["b"]) for r in e2.collect() if r["a"].startswith("k")}
    # capped: each newcomer pairs with the min known id only, not all 9
    assert vs_known == {("k0", "x"), ("k0", "y")}

    overcap = spark.read.parquet(os.path.join(state_dir, "overcap"))
    rec = overcap.where(overcap["side"] == "known").collect()
    assert len(rec) == 1 and rec[0]["bucket_size"] == 9

    # epoch 1's within-batch star degradation is also on record
    batch_rec = overcap.where(
        (overcap["side"] == "batch") & (overcap["epoch"] == 0)
    ).collect()
    assert len(batch_rec) == 1 and batch_rec[0]["bucket_size"] == 9


def _drain_capped(spark, input_dir, state_dir, schema, bucket_cap):
    q = start_incremental_dedup(
        spark, input_dir, state_dir, schema, bucket_cap=bucket_cap
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_dedup_stream_simhash(spark, tmp_path):
    """The D2 caption-channel preset through foreachBatch: token-bag
    simhash is order-insensitive, so a REORDERED caption (byte-unequal
    — the exact detector would miss it) pairs with its source both
    within a batch and cross-epoch against known state, and the
    Hamming verify recomputes signatures only for pair members."""
    from dude_spark.streaming import simhash_ingest

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, caption string"
    bucket_fn, verify_fn, state_cols = simhash_ingest()

    def write(rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn, state_cols=state_cols,
        )
        q.awaitTermination(180)
        assert not q.isActive

    words = _BASE.split()
    reordered = " ".join(reversed(words))  # same token bag, distance 0
    uniq1 = (
        "completely different text about spark shuffle partitions and "
        "parquet footers that shares no phrases with the pastoral scene"
    )
    write([("a", _BASE), ("b", reordered), ("c", uniq1)])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b")}

    # epoch 2: d duplicates the KNOWN token bag; e is fresh
    write([("d", _BASE), ("e", "totally fresh unrelated caption words")])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b"), ("a", "d"), ("b", "d")}
    assert len(os.listdir(os.path.join(state_dir, "epochs"))) == 2


def test_incremental_dedup_stream_simhash_phash(spark, tmp_path):
    """The D2 PHASH channel at ingest (round-3 missing #2): perceptual
    hashes within the radius-3 Hamming ball pair within a batch AND
    cross-epoch against known state.  Planted phashes flip bits in
    DISTINCT 8-bit segments, so pigeonhole recovery is deterministic
    (the WWW'07 guarantee), and a restart re-emits nothing."""
    from dude_spark.config import SimHashConfig
    from dude_spark.streaming import simhash_ingest

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, phash long"
    bucket_fn, verify_fn, state_cols = simhash_ingest(
        SimHashConfig(use_caption=False)
    )
    assert state_cols == ("phash",)

    base = 0x0123456789ABCDEF
    far = base ^ 0x00FFFF00FF00FF00  # ~28 bits away: never pairs

    def write(rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn, state_cols=state_cols,
        )
        q.awaitTermination(180)
        assert not q.isActive

    # epoch 1: b is one bit-flip from a (distance 1 <= radius 3)
    write([("a", base), ("b", base ^ (1 << 5)), ("c", far)])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b")}

    # epoch 2: d flips a different segment's bit — distance 1 from KNOWN
    # a, 2 from KNOWN b, both within the ball; e is unrelated
    # e sits 8 bits from far and ~28 from base — outside every ball
    write([("d", base ^ (1 << 23)), ("e", far ^ 0x00000000000F000F)])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b"), ("a", "d"), ("b", "d")}
    assert len(os.listdir(os.path.join(state_dir, "epochs"))) == 2

    # restart with nothing new: the streaming checkpoint re-emits nothing
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b"), ("a", "d"), ("b", "d")}


def test_simhash_ingest_rejects_no_channels():
    from dude_spark.config import SimHashConfig
    from dude_spark.streaming import simhash_ingest

    with pytest.raises(ValueError):
        simhash_ingest(SimHashConfig(use_phash=False, use_caption=False))


def test_incremental_dedup_stream_suffix(spark, tmp_path):
    """The D3 preset through foreachBatch: captions sharing a >=32-char
    substring (here a verbatim stolen clause inside otherwise-unrelated
    text — minhash-blind at low Jaccard, exact-detector-blind because
    byte-unequal) pair within a batch and cross-epoch against known
    state; the shared-L-gram verify runs only on pair members."""
    from dude_spark.streaming import suffix_ingest

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, caption string"
    bucket_fn, verify_fn, state_cols = suffix_ingest()

    def write(rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn, state_cols=state_cols,
        )
        q.awaitTermination(180)
        assert not q.isActive

    stolen = "while distant church bells echo across the misty valley"
    host_a = f"an otherwise unrelated report {stolen} filed by the clerk"
    host_b = f"meeting minutes note that {stolen} during the recess break"
    uniq = (
        "completely different text about spark shuffle partitions and "
        "parquet footers that shares no long clause with the pastoral scene"
    )
    write([("a", host_a), ("b", host_b), ("c", uniq)])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b")}

    # epoch 2: d quotes the KNOWN clause inside fresh text; e is fresh
    write([
        ("d", f"the appendix reproduces it verbatim: {stolen}, unquoted"),
        ("e", "totally fresh unrelated caption words about something else"),
    ])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "b"), ("a", "d"), ("b", "d")}
    assert len(os.listdir(os.path.join(state_dir, "epochs"))) == 2


def test_incremental_dedup_stream_prefilter(spark, tmp_path):
    """Quality gate at ingest: junk rows are rejected with a durable
    reason BEFORE fingerprinting — they never enter the signature
    state (cannot match future rows), while dups among clean rows are
    still found across epochs."""
    from dude_spark.operators.filters import filter_corpus
    from dude_spark.streaming.ingest import start_incremental_dedup

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary, caption string"
    good = (
        "a perfectly ordinary caption about the weather and the sea "
        "with enough common words that every quality cut passes it"
    )

    def write(rows):
        spark.createDataFrame(
            rows, schema
        ).coalesce(1).write.mode("append").parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            prefilter_fn=lambda b: filter_corpus(b, text_col="caption"),
        )
        q.awaitTermination(120)
        assert not q.isActive

    # epoch 1: a dup pair among clean rows + one junk fragment whose
    # BYTES collide with a clean row — junk must not produce a pair
    write([
        ("a", b"payload-1", good),
        ("b", b"payload-1", good + " twice"),
        ("junk1", b"payload-1", "too short"),
    ])
    drain()
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    assert pairs == {("a", "b")}
    rej = spark.read.parquet(os.path.join(state_dir, "rejected"))
    assert [(r["image_id"], r["reason"]) for r in rej.collect()] == [
        ("junk1", "too_short")
    ]
    sigs = spark.read.parquet(os.path.join(state_dir, "sigs"))
    assert {r["image_id"] for r in sigs.collect()} == {"a", "b"}

    # epoch 2: a clean new-vs-known dup + more junk with the same bytes
    write([
        ("c", b"payload-1", good + " thrice"),
        ("junk2", b"payload-1", "x y"),
    ])
    drain()
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    rej = spark.read.parquet(os.path.join(state_dir, "rejected"))
    assert {r["image_id"] for r in rej.collect()} == {"junk1", "junk2"}


def test_stream_state_compaction_equivalence(spark, tmp_path):
    """compact_every folds the sigs/rows state into a base generation
    without changing ANY emitted pair: four epochs with compact_every=2
    produce the identical pairs table as the uncompacted run, a
    post-compaction newcomer still pairs against a pre-compaction
    (base-resident) row, the compaction audit shows the file-count
    collapse, and a restart re-emits nothing."""
    import json

    from pyspark.sql import functions as F

    schema = "image_id string, bytes binary"

    def verify_bytes(pairs, rows):
        ra = rows.select(F.col("image_id").alias("a"), F.col("bytes").alias("ba"))
        rb = rows.select(F.col("image_id").alias("b"), F.col("bytes").alias("bb"))
        return (
            pairs.join(ra, "a").join(rb, "b")
            .where(F.col("ba") == F.col("bb"))
            .select("a", "b")
        )

    def run(tag, compact_every):
        input_dir = str(tmp_path / f"in-{tag}")
        state_dir = str(tmp_path / f"state-{tag}")
        epochs = [
            [(f"e0-{i}", f"p{i}".encode()) for i in range(6)],
            [("e1-dup", b"p1"), ("e1-new", b"q0")],
            [("e2-a", b"r0"), ("e2-b", b"r0")],
            # epoch 3 duplicates an EPOCH-0 payload: with
            # compact_every=2 that row lives only in the base
            # generation by now — the pair proves base state is read
            [("e3-dup", b"p4")],
        ]
        for rows in epochs:
            _write_batch(spark, input_dir, rows)
            q = start_incremental_dedup(
                spark, input_dir, state_dir, schema,
                verify_fn=verify_bytes, state_cols=("bytes",),
                n_state_shards=4, compact_every=compact_every,
            )
            q.awaitTermination(120)
            assert not q.isActive
        return input_dir, state_dir

    _, plain_state = run("plain", None)
    comp_in, comp_state = run("comp", 2)

    def pairs_of(state_dir):
        return {
            (r["a"], r["b"])
            for r in spark.read.parquet(
                os.path.join(state_dir, "pairs")
            ).collect()
        }

    assert pairs_of(comp_state) == pairs_of(plain_state)
    assert ("e0-4", "e3-dup") in pairs_of(comp_state)

    # compaction audits: after batch 1 (epochs 0-1 merged) and batch 3
    audits = sorted(os.listdir(os.path.join(comp_state, "compactions")))
    assert audits == ["epoch_1.json", "epoch_3.json"]
    with open(os.path.join(comp_state, "compactions", "epoch_3.json")) as f:
        audit = json.load(f)
    for side in ("sigs", "rows"):
        assert audit[side]["files_after"] < audit[side]["files_before"]
        assert audit[side]["merged_upto"] == 3
    # the live state is ONE base generation per store, no epoch dirs
    for side in ("sigs", "rows"):
        dirs = {
            d for d in os.listdir(os.path.join(comp_state, side))
            if d.startswith("epoch=")
        }
        assert dirs == {f"epoch=-{audit[side]['gen']}"}

    # fewer live files than the uncompacted twin — the point of it
    from dude_spark.storage import ShardedEpochStore

    for side, key in (("sigs", "bucket"), ("rows", "image_id")):
        comp_files = ShardedEpochStore(
            spark, comp_state, side, key_col=key, n_shards=4
        ).total_data_files()
        plain_files = ShardedEpochStore(
            spark, plain_state, side, key_col=key, n_shards=4
        ).total_data_files()
        assert comp_files < plain_files

    # restart over the compacted state: nothing new, nothing re-emitted
    before = pairs_of(comp_state)
    q = start_incremental_dedup(
        spark, comp_in, comp_state, schema,
        verify_fn=verify_bytes, state_cols=("bytes",),
        n_state_shards=4, compact_every=2,
    )
    q.awaitTermination(120)
    assert pairs_of(comp_state) == before

    # …and a post-compaction epoch still pairs against the base
    _write_batch(spark, comp_in, [("e4-dup", b"p2")])
    q = start_incremental_dedup(
        spark, comp_in, comp_state, schema,
        verify_fn=verify_bytes, state_cols=("bytes",),
        n_state_shards=4, compact_every=2,
    )
    q.awaitTermination(120)
    assert pairs_of(comp_state) == before | {("e0-2", "e4-dup")}


def test_stream_detector_pin_refuses_config_swap(spark, tmp_path):
    """A detector/config swap on an existing state dir compares
    incompatible bucket keys — old signatures never collide with new
    ones, so cross-epoch pairs silently vanish.  With state_config_id
    the restart is refused loudly; legacy (unpinned) dirs adopt the
    pin on first pinned restart."""
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"
    _write_batch(spark, input_dir, [("a", b"x"), ("b", b"x")])

    def drain(cid):
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema, state_config_id=cid,
        )
        q.awaitTermination(120)

    drain("exact|v1")
    # same pin: accepted across restart
    _write_batch(spark, input_dir, [("c", b"x")])
    drain("exact|v1")
    # different pin: refused before any state is touched
    with pytest.raises(ValueError, match="detector config"):
        start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            state_config_id="minhash|v1",
        )
    # unpinned restart on a pinned dir: allowed (opt-in guard)
    _write_batch(spark, input_dir, [("d", b"x")])
    q = start_incremental_dedup(spark, input_dir, state_dir, schema)
    q.awaitTermination(120)

    # legacy dir (no config_id in meta) adopts the pin in place
    import json as _json

    meta_path = os.path.join(state_dir, "state_meta.json")
    with open(meta_path) as f:
        meta = _json.load(f)
    meta.pop("config_id", None)
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    _write_batch(spark, input_dir, [("e", b"x")])
    drain("exact|v2")  # adopts
    with open(meta_path) as f:
        assert _json.load(f)["config_id"] == "exact|v2"
    with pytest.raises(ValueError, match="detector config"):
        start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            state_config_id="exact|v3",
        )


def test_incremental_dedup_stream_embedding(spark, tmp_path):
    """Semantic-dedup-at-ingest: the embedding preset wired through
    foreachBatch with FROZEN centroids — identical embeddings pair
    cross-epoch and within-batch, sub-threshold neighbors don't, and a
    restart re-emits nothing."""
    import numpy as np

    from dude_spark.functions.clustering import kmeans_fit
    from dude_spark.streaming import embedding_ingest

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, embedding array<float>"
    rng = np.random.RandomState(17)
    vecs = {
        c: rng.uniform(-0.5, 0.5, 8).astype("float32").tolist()
        for c in "abcdef"
    }

    def write(rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(input_dir)

    # bootstrap centroids on a seed corpus (frozen thereafter)
    boot = spark.createDataFrame(
        [(f"s{i}", rng.uniform(-0.5, 0.5, 8).astype("float32").tolist())
         for i in range(24)],
        schema,
    )
    cent = kmeans_fit(boot, k=3, id_col="image_id", vec_col="embedding",
                      iters=2)
    bucket_fn, verify_fn, state_cols = embedding_ingest(
        cent, threshold_x1000=990
    )
    assert state_cols == ("embedding",)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn, state_cols=state_cols,
        )
        q.awaitTermination(180)
        assert not q.isActive

    # epoch 1: a1~a2 identical within batch, b unrelated
    write([("a1", vecs["a"]), ("a2", vecs["a"]), ("b", vecs["b"])])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a1", "a2")}

    # epoch 2: a3 duplicates KNOWN a1/a2 cross-epoch; c/d unrelated
    write([("a3", vecs["a"]), ("c", vecs["c"]), ("d", vecs["d"])])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a1", "a2"), ("a1", "a3"), ("a2", "a3")}

    # restart with no new files: nothing re-emitted
    drain()
    again = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert again == pairs

    # validation surface
    with pytest.raises(ValueError, match="threshold_x1000"):
        embedding_ingest(cent, threshold_x1000=5000)
    with pytest.raises(ValueError, match="centroids"):
        embedding_ingest(np.empty((0, 0)), threshold_x1000=900)


def test_incremental_dedup_stream_tilephash(spark, tmp_path):
    """Pyramid tile-phash at ingest: a crop of a KNOWN image pairs
    cross-epoch through the pyramid key buckets; no rows state is
    kept (exact-equality contract, no verify)."""
    import numpy as np

    from dude_spark.imagecodec import encode
    from dude_spark.streaming import start_incremental_dedup, tilephash_ingest

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"
    rng = np.random.RandomState(23)
    A = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    E = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    bucket_fn, verify_fn, state_cols = tilephash_ingest()
    assert verify_fn is None and state_cols == ()

    def write(rows):
        spark.createDataFrame(
            [(i, bytearray(encode(p, "png"))) for i, p in rows], schema
        ).coalesce(1).write.mode("append").parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, state_cols=state_cols,
        )
        q.awaitTermination(180)
        assert not q.isActive

    write([("a", A), ("e", E)])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    assert spark.read.parquet(pairs_path).count() == 0

    # epoch 2: crop of KNOWN a, plus an unrelated image
    F2 = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    write([("crop", A[:32, :32].copy()), ("f", F2)])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "crop")}
    # no rows state dir: nothing to verify against, nothing stored
    assert not os.path.exists(os.path.join(state_dir, "rows"))

    import pytest as _pt
    with _pt.raises(ValueError, match="grid"):
        tilephash_ingest(grid=0)


def test_incremental_dedup_stream_tilephash_hamming(spark, tmp_path):
    """Hamming-tolerant tile-phash at ingest: a JPEG-re-encoded crop of
    a KNOWN image (a few flipped tile-phash bits — exact key equality
    would miss it) pairs cross-epoch; rows state holds the derived
    tile_keys arrays (rows_fn hook), never image bytes."""
    import numpy as np

    from dude_spark.imagecodec import decode, encode, phash64, pyramid_phash64
    from dude_spark.streaming import (
        start_incremental_dedup,
        tilephash_hamming_ingest,
    )

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"
    rng = np.random.RandomState(2)
    A = rng.randint(0, 256, (128, 128, 3)).astype(np.uint8)
    crop_jpeg = encode(A[:64, :64].copy(), "jpeg")
    d = bin(
        (phash64(decode(crop_jpeg)[0]) ^ pyramid_phash64(A, 2)[1])
        & ((1 << 64) - 1)
    ).count("1")
    assert 1 <= d <= 3, d  # exact equality would NOT have matched
    E = rng.randint(0, 256, (128, 128, 3)).astype(np.uint8)
    bucket_fn, verify_fn, state_cols, rows_fn = tilephash_hamming_ingest()
    assert verify_fn is not None and state_cols == ("tile_keys",)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def drain():
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn,
            state_cols=state_cols, rows_fn=rows_fn,
        )
        q.awaitTermination(180)
        assert not q.isActive

    write([("a", bytearray(encode(A, "png"))), ("e", bytearray(encode(E, "png")))])
    drain()
    pairs_path = os.path.join(state_dir, "pairs")
    assert spark.read.parquet(pairs_path).count() == 0

    write([("crop", bytearray(crop_jpeg))])
    drain()
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_path).collect()}
    assert pairs == {("a", "crop")}
    # rows state exists and holds key ARRAYS, not image bytes
    rows_state = spark.read.parquet(os.path.join(state_dir, "rows"))
    assert "tile_keys" in rows_state.columns
    assert "bytes" not in rows_state.columns

    import pytest as _pt
    with _pt.raises(ValueError, match="segments"):
        tilephash_hamming_ingest(segments=7)
    with _pt.raises(ValueError, match="radius"):
        tilephash_hamming_ingest(segments=4, radius=4)


def test_tilephash_hamming_state_compacts_and_radius_is_pinned(
    spark, tmp_path
):
    """The Hamming preset's ARRAY-typed rows state survives compaction
    (sigs + rows fold to one base generation; later epochs still pair
    against compacted state), and a restart at a different radius is
    refused by the config-id pin."""
    import numpy as np

    from dude_spark.imagecodec import encode
    from dude_spark.streaming import (
        start_incremental_dedup,
        tilephash_hamming_ingest,
    )

    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    schema = "image_id string, bytes binary"
    rng = np.random.RandomState(2)
    A = rng.randint(0, 256, (128, 128, 3)).astype(np.uint8)
    crop_jpeg = encode(A[:64, :64].copy(), "jpeg")
    bucket_fn, verify_fn, state_cols, rows_fn = tilephash_hamming_ingest()

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def drain(config_id):
        q = start_incremental_dedup(
            spark, input_dir, state_dir, schema,
            bucket_fn=bucket_fn, verify_fn=verify_fn,
            state_cols=state_cols, rows_fn=rows_fn,
            compact_every=1, state_config_id=config_id,
        )
        q.awaitTermination(180)
        assert not q.isActive

    write([("a", bytearray(encode(A, "png")))])
    drain("tileham:g2:s8:r3")

    # radius change on accumulated state: refused (the pin)
    import pytest as _pt
    with _pt.raises(ValueError, match="config"):
        drain("tileham:g2:s8:r2")

    # epoch 1 pairs the re-encoded crop against the known state, then
    # compaction folds both epochs' ARRAY-typed rows + sigs into one
    # base generation (single-epoch compaction is a deliberate no-op,
    # so the base appears only now)
    write([("crop", bytearray(crop_jpeg))])
    drain("tileham:g2:s8:r3")
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(
            os.path.join(state_dir, "pairs")
        ).collect()
    }
    assert pairs == {("a", "crop")}
    assert os.path.isdir(os.path.join(state_dir, "sigs", "epoch=-1"))
    assert os.path.isdir(os.path.join(state_dir, "rows", "epoch=-1"))

    # epoch 2: ANOTHER crop pairs against the now-COMPACTED state
    crop2 = encode(A[:64, 64:].copy(), "jpeg")
    write([("crop2", bytearray(crop2))])
    drain("tileham:g2:s8:r3")
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(
            os.path.join(state_dir, "pairs")
        ).collect()
    }
    assert ("a", "crop2") in pairs
