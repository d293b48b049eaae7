"""Composed curation recipe: the end-to-end chain users actually run.

The CLI exposes ~20 single-purpose verbs; a real pretraining-data
pipeline chains a fixed subset in a fixed order.  ``curate`` runs that
chain — filter → pii-scrub → dedup (exact + fuzzy n-gram Jaccard →
connected components → representative-keep) → decontaminate (optional)
→ domain mix (optional) → training shards — through the same
StageStore manifest machinery the dedup pipeline uses
(``pipeline.py``), so the chain is RESUMABLE MID-RUN: every stage
materializes under ``<workdir>/stages/<name>`` with a manifest keyed
by that stage's config hash, a re-run skips every completed stage
whose config matches, and a flag change invalidates exactly the
stages it affects (and therefore everything downstream of them, since
downstream config ids fold in upstream ones).

Every destructive stage leaves a durable audit under
``<workdir>/audits/`` — rejected rows with reasons, PII rewrite
counts, dup-cluster assignments, hot-bucket caps, decontamination
flags, realized mix fractions — the same no-silent-drop contract the
stream state keeps (rejected/, overcap/).

Scale shape: each stage is one of the already-audited operators
(filter/pii are zero-shuffle codegen maps; dedup is the banded /
hot-gram-cut candidate machinery + CC; decontam broadcasts only the
benchmark side; mix is a zero-shuffle hash sample; shards are
bounded-task writes) — composing them adds ONE parquet materialization
per stage boundary, which is precisely what buys kill-anywhere
resumability on a 10^12-row run.

Reference analogue: the reference's hardwired single-detector chain
(/root/reference/internal/processing/runner.go:213-325), widened to
the curation surface the north star mandates.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import ParquetManifestStore, StageStore


def _cfg_id(**kw) -> str:
    """Deterministic stage-config hash (the JobConfig.config_id shape)."""
    return hashlib.sha256(
        json.dumps(kw, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class CurateRunner:
    """Minimal manifest-keyed stage runner (the pipeline.StageRunner
    skip contract, without its detector-thread machinery)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        resume: bool = True,
        store: StageStore | None = None,
    ):
        self.spark, self.workdir, self.resume = spark, workdir, resume
        self.store = store or ParquetManifestStore(spark, workdir)
        self.report: dict[str, dict] = {}

    def run(self, stage: str, config_id: str, compute) -> DataFrame:
        m = self.store.manifest(stage)
        if (
            self.resume
            and m is not None
            and m.get("config_id") == config_id
            and self.store.exists(stage)
        ):
            self.report[stage] = {"rows": m["rows"], "skipped": True}
            return self.store.read(stage)
        t0 = time.monotonic()
        out = self.store.write(compute(), stage)
        rows = out.count()
        self.store.publish_manifest(
            stage,
            {
                "stage": stage,
                "config_id": config_id,
                "rows": rows,
                "wall_s": time.monotonic() - t0,
            },
        )
        self.report[stage] = {"rows": rows, "skipped": False}
        return out

    def audit(self, name: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self.workdir, "audits", name)
        )


def curate(
    spark: SparkSession,
    docs: DataFrame,
    workdir: str,
    id_col: str = "image_id",
    text_col: str = "caption",
    source_col: str = "source",
    allowed_langs: tuple[str, ...] | None = None,
    ngram: int = 3,
    jaccard_num: int = 8,
    jaccard_den: int = 10,
    max_gram_df: int | None = 100_000,
    benchmark: DataFrame | None = None,
    mix_weights: dict[str, float] | None = None,
    rows_per_shard: int = 100_000,
    resume: bool = True,
    store: StageStore | None = None,
) -> dict:
    """Run the full curation chain over ``docs``; returns the per-stage
    report (rows, skipped) plus shard-verification status.  See the
    module docstring for semantics; the CLI twin is ``dude-spark
    curate``.

    Input columns are renamed to the canonical ``(image_id, caption)``
    on entry (several chain operators carry that contract) and back to
    the caller's names before the shard write, so the shards hold the
    input schema.
    """
    from .functions.splits import mix_corpus
    from .operators.candidates import pairs_from_buckets
    from .operators.components import connected_components
    from .operators.decontam import decontaminate
    from .operators.filters import filter_corpus
    from .operators.pii import scrub_pii
    from .operators.report import dedup_corpus
    from .operators.shards import verify_shards, write_training_shards
    from .operators.textdedup import ngram_jaccard_pairs

    runner = CurateRunner(spark, workdir, resume=resume, store=store)
    canon = docs
    if id_col != "image_id":
        canon = canon.withColumnRenamed(id_col, "image_id")
    if text_col != "caption":
        canon = canon.withColumnRenamed(text_col, "caption")

    # 1 — quality filter (rejected rows + reasons are the audit)
    c_filter = _cfg_id(stage="filter", langs=allowed_langs)

    def _filter():
        clean, rejected = filter_corpus(
            canon, text_col="caption", allowed_langs=allowed_langs
        )
        runner.audit("rejected", rejected)
        return clean

    filtered = runner.run("filtered", c_filter, _filter)

    # 2 — PII scrub (audit = per-touched-doc signal counts)
    c_pii = _cfg_id(stage="pii", upstream=c_filter)

    def _pii():
        scrubbed, audit = scrub_pii(filtered, "caption", "image_id")
        runner.audit("pii", audit)
        return scrubbed

    scrubbed = runner.run("pii", c_pii, _pii)

    # 3 — dedup: exact (sha2 of text) + fuzzy (n-gram Jaccard) edges →
    # connected components → keep each cluster's min-id representative
    c_dedup = _cfg_id(
        stage="dedup", upstream=c_pii, ngram=ngram,
        num=jaccard_num, den=jaccard_den, max_gram_df=max_gram_df,
    )

    def _dedup():
        base = scrubbed.localCheckpoint(eager=True)  # feeds 3 consumers
        exact_b = base.where(
            F.col("caption").isNotNull() & (F.length("caption") > 0)
        ).select(
            "image_id", F.sha2(F.col("caption"), 256).alias("bucket")
        )
        # star mode: assignment semantics — CC restores membership
        # through the star center, overcap recorded
        e_pairs, overcap = pairs_from_buckets(exact_b, overcap_mode="star")
        fuzzy = ngram_jaccard_pairs(
            base, "image_id", "caption", n=ngram,
            threshold_num=jaccard_num, threshold_den=jaccard_den,
            max_gram_df=max_gram_df,
        )
        edges = e_pairs.select("a", "b").unionByName(fuzzy.select("a", "b"))
        assigns = connected_components(edges).localCheckpoint(eager=True)
        runner.audit("dedup_assignments", assigns)
        runner.audit("dedup_overcap", overcap)
        return dedup_corpus(base, assigns, "image_id")

    deduped = runner.run("deduped", c_dedup, _dedup)

    # 4 — decontamination vs a benchmark set (optional)
    current = deduped
    if benchmark is not None:
        c_dec = _cfg_id(stage="decontam", upstream=c_dedup)

        def _dec():
            clean, flagged = decontaminate(deduped, benchmark)
            runner.audit("decontam_flagged", flagged)
            return clean

        current = runner.run("decontam", c_dec, _dec)
    else:
        runner.report["decontam"] = {"rows": None, "skipped": "no benchmark"}

    # 5 — domain mix (optional)
    if mix_weights is not None:
        c_mix = _cfg_id(
            stage="mix",
            upstream=runner.store.manifest(
                "decontam" if benchmark is not None else "deduped"
            )["config_id"],
            weights=mix_weights,
        )
        src = current

        def _mix():
            mixed, fractions = mix_corpus(
                src, mix_weights, source_col, id_col="image_id"
            )
            with open(
                os.path.join(workdir, "audits", "mix_fractions.json"), "w"
            ) as f:
                json.dump(fractions, f)
            return mixed

        os.makedirs(os.path.join(workdir, "audits"), exist_ok=True)
        current = runner.run("mixed", c_mix, _mix)
    else:
        runner.report["mixed"] = {"rows": None, "skipped": "no mix weights"}

    # 6 — training shards (manifest-after-data + verification)
    final = current
    if id_col != "image_id":
        final = final.withColumnRenamed("image_id", id_col)
    if text_col != "caption":
        final = final.withColumnRenamed("caption", text_col)
    shards_dir = os.path.join(workdir, "shards")
    # every-row-filtered-away corpus: a shard write would produce an
    # empty parquet dir that the verification read cannot even infer a
    # schema from — report loudly instead of crashing (the chain's
    # audits say exactly where the rows went)
    last = [v["rows"] for v in runner.report.values() if v.get("rows") is not None]
    if last and last[-1] == 0:
        runner.report["shards"] = {
            "rows": 0,
            "skipped": "upstream corpus is empty — nothing to shard",
        }
        return {
            "stages": runner.report,
            "shards": 0,
            "shard_verification_failures": 0,
            "workdir": workdir,
        }
    # the shard config folds in every upstream stage's row count, so
    # any upstream recompute (or flag change) re-shards
    c_sh = _cfg_id(
        stage="shards",
        rows_per_shard=rows_per_shard,
        upstream={k: v.get("rows") for k, v in runner.report.items()},
    )
    manifest = runner.run(
        "shards",
        c_sh,
        lambda: write_training_shards(
            final, shards_dir, rows_per_shard, id_col=id_col
        ),
    )
    bad = verify_shards(spark, shards_dir, id_col=id_col).count()
    return {
        "stages": runner.report,
        "shards": manifest.count(),
        "shard_verification_failures": bad,
        "workdir": workdir,
    }
