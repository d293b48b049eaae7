"""Hard-kill resume: SIGKILL the driver process mid-run, resume, and
get byte-identical assignments (SURVEY.md §5.4 — the strongest form of
the reference's cache warm-run contract, hashing.go:84-116)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from dude_spark.config import JobConfig
from dude_spark.fixtures import IMAGES_COLUMNS
from dude_spark.pipeline import run_pipeline

N = 2000


@pytest.fixture(scope="module")
def input_parquet(spark, tmp_path_factory):
    from dude_spark.fixtures import generate_pdf

    d = tmp_path_factory.mktemp("kill_input")
    pdf = generate_pdf(N)
    spark.createDataFrame(pdf[IMAGES_COLUMNS]).write.parquet(str(d / "images.parquet"))
    return str(d / "images.parquet")


def test_sigkill_then_resume_identical(spark, input_parquet, tmp_path_factory):
    work = tmp_path_factory.mktemp("kill_work")
    ckpt = str(work / "ckpt")
    script = textwrap.dedent(
        f"""
        from dude_spark.session import get_spark
        from dude_spark.config import JobConfig
        from dude_spark.pipeline import run_pipeline
        spark = get_spark("kill_child", master="local[4]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        cfg = JobConfig(input_paths=({input_parquet!r},), checkpoint_dir={ckpt!r},
                        detectors=("exact", "minhash", "simhash", "suffix"),
                        run_id="kr")
        run_pipeline(spark, cfg)
        print("CHILD-DONE", flush=True)
        """
    )
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    child = subprocess.Popen(
        [sys.executable, "-c", script], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    stages_dir = os.path.join(ckpt, "stages")
    deadline = time.monotonic() + 300
    killed = False
    while time.monotonic() < deadline:
        if child.poll() is not None:
            break  # finished before we could kill — handled below
        n_manifests = (
            len([f for f in os.listdir(stages_dir) if f.endswith(".manifest.json")])
            if os.path.isdir(stages_dir)
            else 0
        )
        if n_manifests >= 2:
            child.send_signal(signal.SIGKILL)  # no cleanup, no atexit
            killed = True
            break
        time.sleep(0.1)
    child.wait(timeout=60)
    if not killed:
        pytest.skip("child pipeline finished before 2 manifests appeared")

    # resume in-process: must complete and skip the surviving stages
    cfg = JobConfig(
        input_paths=(input_parquet,), checkpoint_dir=ckpt,
        detectors=("exact", "minhash", "simhash", "suffix"), run_id="kr2",
    )
    resumed = run_pipeline(spark, cfg)
    assert any(i.skipped for i in resumed.stages.values())
    resumed_set = {
        (r["image_id"], r["cluster_id"]) for r in resumed.assignments.collect()
    }

    # clean-room reference run in a fresh checkpoint
    cfg2 = JobConfig(
        input_paths=(input_parquet,), checkpoint_dir=str(work / "ckpt_clean"),
        detectors=("exact", "minhash", "simhash", "suffix"), run_id="clean",
    )
    clean = run_pipeline(spark, cfg2)
    clean_set = {
        (r["image_id"], r["cluster_id"]) for r in clean.assignments.collect()
    }
    assert resumed_set == clean_set
