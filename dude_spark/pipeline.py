"""End-to-end pipeline orchestration: stages, checkpoints, resume, cache.

The Spark analogue of the reference's hardwired operator chain
(/root/reference/internal/processing/runner.go:213-325): scan →
[incremental cache probe] → signature projection → bucket grouping →
candidate pairs → verify → connected components → report.  Three
generalizations mandated by the north star:

  * every stage materializes to a checkpoint directory with a sidecar
    manifest keyed by the detector's ``config_id`` — a re-run skips
    every completed stage whose config matches ("resumes idempotently
    mid-run"; generalizes DuDe's row cache, hashing.go:84-116, from
    rows to stages);
  * per-partition lineage rows + stage metrics append to durable
    tables (lineage.py);
  * the signature stage is row-incremental when ``use_cache`` is on:
    rows whose content fingerprint matches the cached signature are
    NOT recomputed — the stat+cache-probe (O3, hashing.go:73-88) and
    upsert (O6, db/hash_repository.go:128-143) as one join + union
    (an Iceberg ``MERGE INTO`` in production; see below).

Storage note: stage I/O goes through the StageStore interface
(storage.py) — ParquetManifestStore (sandbox default: parquet dirs +
atomic JSON manifest sidecars) or IcebergStageStore (cluster: one
Iceberg table per stage, MERGE INTO manifests).  The swap is an
interface implementation, enforced by the stage runner depending only
on the contract; pass ``store=`` to run_pipeline to select.

Scale notes: `bytes` is projected away before every shuffle except the
exact detector's verify join (SURVEY.md §7 hard-part (e)); candidate
generation is bucket-capped with star edges (operators/candidates.py);
CC uses localCheckpoint-per-round (operators/components.py); stage
reads come back from parquet so no lineage chain spans a stage
boundary.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import JobConfig
from .detectors import exact as d_exact
from .detectors import minhash as d_minhash
from .detectors import simhash as d_simhash
from .detectors import suffix as d_suffix
import datetime as _dt

from .lineage import flush_records, partition_count_rows
from .operators.candidates import pairs_from_buckets
from .operators.components import connected_components
from .operators.ids import decode_keys, encode_ids, encode_keys
from .operators.report import assignments_to_report, write_csv_report
from .operators.verify import prefilter_minhash, verify_exact, verify_jaccard
from .storage import ParquetManifestStore, StageStore


@dataclasses.dataclass
class StageInfo:
    rows: int
    wall_s: float
    skipped: bool


@dataclasses.dataclass
class PipelineResult:
    assignments: DataFrame
    report: DataFrame
    csv_path: str | None
    stages: dict[str, StageInfo]


def _job_group(run_id: str) -> str:
    return f"dude_spark::{run_id}"


class CancelledRun(RuntimeError):
    """Raised in the driver when a run is cancelled mid-flight."""


def cancel_run(
    spark: SparkSession, run_id: str, checkpoint_dir: str | None = None
) -> None:
    """Cancel an in-flight pipeline run (O13 — ≅ CancelExecution,
    /root/reference/internal/processing/runner.go:45-50, context
    cancellation threaded through every operator).

    Two mechanisms, mirroring Go's ctx.Done() being both preemptive
    (goroutines killed) and sticky (checked at operator boundaries):
    ``cancelJobGroup`` kills currently-active Spark jobs, and a CANCEL
    marker in the checkpoint root makes the stage runner refuse to
    start the next stage (cancelJobGroup alone is one-shot — a cancel
    landing between jobs would otherwise be lost).  Completed stages
    stay checkpointed, so a resume picks up where the cancel landed.
    """
    if checkpoint_dir:
        with open(os.path.join(checkpoint_dir, "CANCEL"), "w") as f:
            f.write(run_id)
    spark.sparkContext.cancelJobGroup(_job_group(run_id))


def input_fingerprint(spark: SparkSession, cfg: JobConfig) -> str:
    """Fingerprint of the input tables: sha256 over sorted
    (path, size, mtime) of every file under each input root — the
    direct analogue of the reference's per-file (FileSize, ModTime)
    cache probe (hashing.go:73-88) lifted to the table level.  Stage
    manifests embed this so a changed/extended input invalidates stage
    skips while `use_cache` still reuses unchanged rows.  On Iceberg
    this is the table's snapshot id.

    Listings go through the Hadoop FileSystem API, so remote schemes
    the CLI advertises (s3://, hdfs://) fingerprint correctly instead
    of silently hashing nothing (round-1 ADVICE: a driver-local
    os.walk returned a constant hash for remote paths, so a changed
    input no longer invalidated a resume).  A root with zero files
    raises — an empty fingerprint must never validate a resume.
    Metadata-only: one listing RPC stream per root, no data reads.
    """
    import hashlib

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    h = hashlib.sha256()
    for root in cfg.input_paths:
        path = jvm.org.apache.hadoop.fs.Path(root)
        fs = path.getFileSystem(hconf)
        if not fs.exists(path):
            raise FileNotFoundError(f"input root does not exist: {root}")
        entries = []
        it = fs.listFiles(path, True)  # recursive; a plain file lists itself
        while it.hasNext():
            st = it.next()
            entries.append(
                f"{st.getPath().toString()}|{st.getLen()}"
                f"|{st.getModificationTime()}\n"
            )
        if not entries:
            raise ValueError(
                f"input root {root} contains no files — refusing to "
                "fingerprint an empty input (it would validate stale "
                "stage checkpoints on resume)"
            )
        for e in sorted(entries):
            h.update(e.encode())
    return h.hexdigest()[:16]


def load_images(spark: SparkSession, cfg: JobConfig) -> DataFrame:
    """Union of all input tables (≅ multi-root scan fan-in,
    runner.go:249-252 — cross-input and intra-input dups are the same)."""
    df = spark.read.parquet(cfg.input_paths[0])
    for p in cfg.input_paths[1:]:
        df = df.unionByName(spark.read.parquet(p))
    return df


# ---------------------------------------------------------------- detectors

def _row_fp(detector: str):
    """Cheap per-row content fingerprint for the incremental cache —
    hashes exactly the columns the detector's signature reads (the
    (size, mtime) stat proxy of hashing.go:73-88; our schema has no
    mtime, so content columns are hashed directly — for caption
    detectors this skips the expensive Python-UDF recompute, for
    `exact` it degenerates to the same cost as the signature itself
    and is kept only for uniformity)."""
    if detector == "exact":
        return F.xxhash64("bytes")
    if detector == "simhash":
        return F.xxhash64("caption", "phash")
    return F.xxhash64("caption")  # minhash, suffix


def _signatures(images: DataFrame, detector: str, cfg: JobConfig) -> DataFrame:
    if detector == "exact":
        return d_exact.exact_buckets(images).withColumnRenamed("bucket", "sig")
    if detector == "minhash":
        return d_minhash.minhash_signatures(images, cfg.minhash)
    if detector == "simhash":
        return d_simhash.simhash_signatures(images, cfg.simhash)
    if detector == "suffix":
        return d_suffix.suffix_signatures(images, cfg.suffix)
    raise ValueError(detector)


def _buckets(signatures: DataFrame, detector: str, cfg: JobConfig) -> DataFrame:
    if detector == "exact":
        return signatures.select("image_id", F.col("sig").alias("bucket"))
    if detector == "minhash":
        return d_minhash.minhash_buckets(signatures)
    if detector == "simhash":
        return d_simhash.simhash_buckets(signatures, cfg.simhash)
    if detector == "suffix":
        return d_suffix.suffix_buckets(signatures)
    raise ValueError(detector)


def _verify_is_noop(detector: str, cfg: JobConfig) -> bool:
    """True when _verify returns its input unchanged — the ONE source
    of truth for both _verify's early return and compute_edges'
    decode/encode-sandwich skip (and the edges stage key tag)."""
    return detector == "exact" and not cfg.paranoid


def _verify(
    pairs: DataFrame,
    images: DataFrame,
    signatures: DataFrame,
    detector: str,
    cfg: JobConfig,
) -> DataFrame:
    """ParanoidMode analogue per detector (hashing.go:135-239); for the
    fuzzy detectors verification is NOT optional — it is what turns
    candidate buckets into true near-dup pairs."""
    if detector == "exact":
        if _verify_is_noop(detector, cfg):
            return pairs
        return verify_exact(pairs, images)
    if detector == "minhash":
        mh = cfg.minhash
        if mh.verify_prefilter:
            # sketch-estimate cut kills the LSH false-positive bulk
            # JVM-side before captions are attached (verify.py docs)
            pairs = prefilter_minhash(
                pairs, signatures, mh.jaccard_threshold,
                mh.num_hashes, mh.prefilter_margin_sigmas,
            )
        return verify_jaccard(
            pairs, images, mh.shingle_k, mh.jaccard_threshold
        ).select("a", "b")
    if detector == "simhash":
        return d_simhash.simhash_pairs_verified(pairs, signatures, cfg.simhash)
    if detector == "suffix":
        return d_suffix.verify_substring(pairs, images, cfg.suffix).select("a", "b")
    raise ValueError(detector)


# ------------------------------------------------------------- checkpointing

class _Stages:
    """Checkpointed stage runner over a pluggable StageStore
    (storage.py — parquet+manifest in the sandbox, Iceberg tables on a
    cluster; the seam is the interface, not prose)."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: JobConfig,
        resume: bool,
        store: StageStore | None = None,
    ):
        self.spark, self.cfg, self.resume = spark, cfg, resume
        self.root = cfg.checkpoint_dir
        self.store = store or ParquetManifestStore(spark, cfg.checkpoint_dir)
        self.stages: dict[str, StageInfo] = {}
        # buffered durable records, flushed once at pipeline end
        # (2 writes per run instead of 2 per stage)
        self.metrics_rows: list[tuple] = []
        self.lineage_rows: list[tuple] = []
        self._lock = threading.Lock()  # detector chains run concurrently

    def flush(self) -> None:
        flush_records(self.spark, self.root, self.metrics_rows, self.lineage_rows)
        self.metrics_rows, self.lineage_rows = [], []

    def run(
        self, stage: str, detector: str, config_id: str, compute
    ) -> DataFrame:
        # sticky-cancel check at every stage boundary (≅ ctx polls,
        # reference hashing.go:58-70) — see cancel_run
        if os.path.exists(os.path.join(self.root, "CANCEL")):
            raise CancelledRun(f"run cancelled before stage {stage}")
        if self.resume:
            m = self.store.manifest(stage)
            if (
                m is not None
                and m.get("config_id") == config_id
                and self.store.exists(stage)
            ):
                with self._lock:
                    self.stages[stage] = StageInfo(m["rows"], 0.0, skipped=True)
                return self.store.read(stage)
            # config changed → cached stage is invalid, fall through
        t0 = time.monotonic()
        out = self.store.write(compute(), stage)
        pc = partition_count_rows(out)  # one cheap count-per-partition job
        rows = sum(n for _, n in pc)
        wall = time.monotonic() - t0
        self.store.publish_manifest(
            stage,
            {
                "run_id": self.cfg.run_id,
                "stage": stage,
                "config_id": config_id,
                "rows": rows,
                "wall_s": wall,
            },
        )
        ts = _dt.datetime.now(_dt.timezone.utc).isoformat()
        with self._lock:
            self.metrics_rows.append(
                (self.cfg.run_id, stage, detector, rows, float(wall), ts, {})
            )
            self.lineage_rows.extend(
                (self.cfg.run_id, stage, detector, pid, n) for pid, n in pc
            )
            self.stages[stage] = StageInfo(rows, wall, skipped=False)
        return out


def _incremental_signatures(
    spark: SparkSession,
    images: DataFrame,
    detector: str,
    cfg: JobConfig,
    store: StageStore,
    sig_stage: str,
) -> DataFrame:
    """Row-level MERGE of new/changed signatures with the cached table.

    ≅ fileNeedsReHashing = !memoryExists || fileHasChangedOnDisk
    (hashing.go:84-88) as one left join; unchanged rows keep their
    cached signature without re-running the signature UDF.
    """
    fp = images.withColumn("row_fp", _row_fp(detector))
    full = _signatures(images, detector, cfg).join(
        fp.select("image_id", "row_fp"), "image_id"
    )
    try:
        if not store.exists(sig_stage):
            raise FileNotFoundError(sig_stage)
        cached = store.read(sig_stage)
    except Exception:  # first run — no cache yet
        return full
    if set(cached.columns) != set(full.columns):
        # signature SCHEMA migrated since the cache was written (e.g.
        # round 3 added the full `sig` column to minhash signatures):
        # a stale-schema cache cannot be row-merged — unionByName would
        # abort the run — so recompute everything; this stage's own
        # write then refreshes the cache to the new schema.  Checked
        # BEFORE the checkpoint so the useless cache is never
        # materialized.
        return full
    # localCheckpoint BEFORE the stage overwrites the cache — Spark
    # reads lazily, so writing over the table still being scanned
    # would corrupt the very cache being merged.  (With Iceberg this
    # is a snapshot-isolated MERGE INTO and the checkpoint is free.)
    cached = cached.localCheckpoint(eager=True)
    current = fp.select("image_id", "row_fp")
    unchanged = cached.join(current, ["image_id", "row_fp"])  # semi via inner
    stale_ids = current.join(
        cached.select("image_id", F.col("row_fp").alias("cached_fp")),
        "image_id",
        "left",
    ).where(
        F.col("cached_fp").isNull() | (F.col("cached_fp") != F.col("row_fp"))
    ).select("image_id")
    fresh_rows = images.join(stale_ids, "image_id")
    fresh = _signatures(fresh_rows, detector, cfg).join(
        fp.select("image_id", "row_fp"), "image_id"
    )
    return unchanged.unionByName(fresh)


# ------------------------------------------------------------------ pipeline

def run_pipeline(
    spark: SparkSession,
    cfg: JobConfig,
    resume: bool = True,
    images: DataFrame | None = None,
    progress=None,
    store: StageStore | None = None,
) -> PipelineResult:
    """Full run: detectors → union of verified edges → CC → report.

    `resume=True` + an existing checkpoint dir skips completed stages
    (kill-and-rerun safety, ≅ runner.go cancellation + cache warm
    path).  Pass `images` to override the input scan (tests).
    ``progress``: True for the reference-style stderr bar, or a
    callable receiving each ProgressEvent (progress.py) — live
    {title, percent, current, total} during stages, ≅
    progress_tracker.go's 250 ms ticker.
    """
    from .progress import ProgressReporter

    if progress:
        reporter = ProgressReporter(
            spark, callback=progress if callable(progress) else None
        ).start()
        try:
            return run_pipeline(
                spark, cfg, resume=resume, images=images, store=store
            )
        finally:
            reporter.stop()
    cfg = cfg.validated()
    if cfg.checkpoint_dir is None:
        raise ValueError("run_pipeline requires cfg.checkpoint_dir")
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    # a fresh run (or resume) clears any stale cancel marker
    cancel_marker = os.path.join(cfg.checkpoint_dir, "CANCEL")
    if os.path.exists(cancel_marker):
        os.remove(cancel_marker)
    spark.sparkContext.setJobGroup(
        _job_group(cfg.run_id), "dude_spark pipeline", interruptOnCancel=True
    )
    st = _Stages(spark, cfg, resume, store=store)

    if images is None:
        images = load_images(spark, cfg)

    # early-exit guard: abort on an empty input (runner.go:255-260)
    if images.limit(1).count() == 0:
        empty_assign = spark.createDataFrame([], "image_id string, cluster_id string")
        empty_rep = spark.createDataFrame(
            [], "image_id string, caption string, dup_image_id string, "
            "dup_caption string, cluster_id string"
        )
        return PipelineResult(empty_assign, empty_rep, None, st.stages)

    in_fp = input_fingerprint(spark, cfg)

    # id dictionary encoding (round-2 top lever, operators/ids.py): one
    # shared mapping stage; every bucket explode, candidate pair, edge,
    # and CC round downstream is keyed by 8-byte longs instead of id
    # strings — ~3× narrower rows on the pipeline's widest shuffles.
    # Built BEFORE the concurrent detector chains (they all read it).
    # cfg.id_encoding="auto" sizes the decision with a BOUNDED probe
    # (limit n+1, never a full count — same cost at 10^12 rows): below
    # the threshold the mapping joins cost more than narrow shuffles
    # save, so small inputs keep the direct string-keyed plan.
    if cfg.id_encoding == "auto":
        probe = cfg.id_encoding_min_rows
        use_iid = (
            images.select("image_id").limit(probe).count() >= probe
        )
    else:
        use_iid = cfg.id_encoding == "on"
    if use_iid:
        ids_map = st.run("ids", "all", "ids@" + in_fp, lambda: encode_ids(images))

        def _enc(df: DataFrame, cols) -> DataFrame:
            return encode_keys(df, ids_map, cols)

        def _dec(df: DataFrame, cols) -> DataFrame:
            return decode_keys(df, ids_map, cols)

        iid_tag = "#iid1"
    else:
        def _enc(df: DataFrame, cols) -> DataFrame:
            return df

        def _dec(df: DataFrame, cols) -> DataFrame:
            return df

        iid_tag = ""

    def run_detector(det: str) -> DataFrame:
        """signatures → candidates → verified edges for one detector."""
        # job groups are thread-local — each detector thread re-arms
        # the group so cancel_run() reaches every concurrent chain
        spark.sparkContext.setJobGroup(
            _job_group(cfg.run_id), f"dude_spark {det}", interruptOnCancel=True
        )
        cid = cfg.config_id(det) + "@" + in_fp
        # stages keyed by long iids carry a schema-version tag so a
        # checkpoint written by the string-keyed layout can never be
        # resumed into the long-keyed plan (type-mismatched joins)
        cid_iid = cid + iid_tag

        def compute_sigs():
            if cfg.use_cache:
                return _incremental_signatures(
                    spark, images, det, cfg, st.store, f"signatures_{det}"
                )
            return _signatures(images, det, cfg).withColumn(
                "row_fp", F.lit(None).cast("long")
            )

        sigs = st.run(f"signatures_{det}", det, cid, compute_sigs)

        def compute_pairs():
            # encode BEFORE the bucket explode: the exploded bucket
            # table (rows × bands) is the widest shuffle in the
            # pipeline — it must carry longs, not id strings
            sigs_enc = _enc(sigs, ("image_id",))
            pairs, overcap = pairs_from_buckets(
                _buckets(sigs_enc, det, cfg), cfg.bucket_cap
            )
            # durable record of capped buckets — never silently
            # truncated (SURVEY §2.2).  The overcap aggregate is its
            # own map-side-combinable job; no persist is shared with
            # the pairs write (its shuffle volume is one combined row
            # per map partition per hot bucket — noise).
            st.store.write(overcap, f"overcap_{det}")
            return pairs

        pairs = st.run(f"candidates_{det}", det, cid_iid, compute_pairs)

        def compute_edges():
            if _verify_is_noop(det, cfg):
                # verify is a no-op — don't pay the decode/encode
                # sandwich (four mapping joins) to reproduce the input
                return pairs.select("a", "b")
            # verification runs in STRING space between a decode and a
            # re-encode: the payload attach (captions / bytes) joins
            # the raw images table, and pairs are small post-LSH, so
            # the two mapping joins per side cost far less than
            # encoding a payload projection would (bytes must never
            # shuffle at table width — SURVEY §7 hard-part (e))
            pairs_str = _dec(pairs, ("a", "b"))
            verified = _verify(pairs_str, images, sigs, det, cfg)
            return _enc(verified.select("a", "b"), ("a", "b"))

        # the verify-noop tag keys ONLY the edges stage: an edge set
        # written without verification must not resume into a paranoid
        # run (and vice versa), but signatures and candidates are
        # byte-identical across paranoid settings — tagging the whole
        # config_id would force a pointless corpus re-fingerprint on
        # every --no-paranoid toggle
        cid_edges = cid_iid + ("#v0" if _verify_is_noop(det, cfg) else "")
        edges = st.run(f"edges_{det}", det, cid_edges, compute_edges)
        return edges.select("a", "b")

    # Detector chains are independent until the edge union — run them
    # CONCURRENTLY from driver threads.  Spark job submission is
    # thread-safe; interleaved jobs fill task slots that a sequential
    # chain would leave idle during its per-stage barriers (write/
    # read/commit latency), which is also exactly what a multi-tenant
    # cluster scheduler would do with four independent job DAGs.
    if len(cfg.detectors) > 1:
        with ThreadPoolExecutor(max_workers=len(cfg.detectors)) as pool:
            edge_frames = list(pool.map(run_detector, cfg.detectors))
    else:
        edge_frames = [run_detector(cfg.detectors[0])]

    all_edges = edge_frames[0]
    for e in edge_frames[1:]:
        all_edges = all_edges.unionByName(e)

    combined_cid = (
        "+".join(cfg.config_id(d) for d in cfg.detectors) + "@" + in_fp + iid_tag
    )
    # CC iterates entirely on long iids; the component minimum decodes
    # to min(image_id) because the mapping is order-preserving (dense
    # rank), so the deterministic-representative contract is unchanged.
    # Decode happens once here, at the stage boundary — report and
    # results stay string-keyed for every consumer.
    assignments = st.run(
        "components", "all", combined_cid,
        lambda: _dec(
            connected_components(all_edges.distinct()),
            ("image_id", "cluster_id"),
        ),
    )
    report = st.run(
        "report", "all", combined_cid,
        lambda: assignments_to_report(assignments, images),
    )

    st.flush()
    csv_path = None
    if cfg.results_dir:
        csv_path = write_csv_report(report, cfg.results_dir)
    return PipelineResult(assignments, report, csv_path, st.stages)
