"""Two-cluster-size scaling benchmark (north-rule criterion).

No real multi-executor cluster exists in this sandbox, so the N vs 4N
executor criterion is evidenced as BASELINE.md §sandbox-note
prescribes: the IDENTICAL job (same pre-generated input parquet, same
config) runs at two parallelism levels and we report images/sec at
both plus

    eff = (throughput_4N / throughput_N) / 4        (target >= 0.8)

Faithfulness matters: plain local[8] on a 32-core box still lets the
JVM (GC, shuffle, parquet codec threads) and the Python workers use
all 32 hardware cores, which *understates* scaling.  So each
configuration runs in a subprocess pinned with ``taskset`` to exactly
N cores — local[8] on CPUs 0-7 vs local[32] on CPUs 0-31 — the honest
single-box proxy for an 8-executor vs 32-executor cluster.  Shuffle
partitioning is FIXED at 64 across both configurations (matching the
worker code and BENCH.md): scaling partitions with cores would shrink
tasks 4x and per-task overhead would swamp the measurement.
Each subprocess runs a small warmup pipeline first so JIT/worker-pool
spin-up doesn't bias either side.

The (N, 4N) pair defaults to (8, 32) cores.  A second supported pair is
(2, 8): at 8 and especially 32 pinned cores this VM's single socket is
DRAM-bandwidth-saturated (hw_control.py ceilings of 0.66-0.80 measured
across rounds), so the 8->32 ratio mostly measures the memory wall; at
2->8 cores bandwidth is NOT the binding resource and the pair exposes
the JOB's intrinsic scalability — the thing the criterion is about.
Report both pairs with their same-day hw_control ceilings.

Usage:
  python scripts/scaling_bench.py [n_images] [repeats] [coresN] [cores4N] \
      [state_file]
  python scripts/scaling_bench.py worker CPUS INPUT WORK   # internal

With a state_file, every pinned-run sample is appended to it as one
JSON line the moment it completes, and a rerun SKIPS samples already
recorded — so a campaign killed mid-run (the harness session owns the
tmux server; when the session dies, so does every process in it)
resumes at single-sample granularity instead of repeating ~18-minute
legs.  The fixture work dir is then deterministic (keyed by n) and
reused across restarts.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DETECTORS = ("exact", "minhash", "simhash", "suffix")


def worker(cpus: int, input_path: str, work: str) -> None:
    from dude_spark.config import JobConfig
    from dude_spark.fixtures import write_fixture
    from dude_spark.pipeline import run_pipeline
    from dude_spark.session import get_spark

    # Shuffle partitioning is FIXED (64) across both cluster sizes: the
    # partition layout of a production job is a property of the data,
    # not the cluster; scaling efficiency measures how the same task
    # set spreads over more slots.  (Scaling partitions with slots
    # shrinks tasks 4× and conflates per-task overhead with scaling.)
    spark = get_spark(
        f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # warmup must be HEAVY enough to finish JIT/codegen for every
        # stage shape: with a 500-row warmup the short 32-core run
        # still pays mid-measurement compilation that the long 8-core
        # run amortizes — an asymmetry that artificially depresses
        # measured efficiency
        warm = f"{work}/warm_{cpus}"
        write_fixture(spark, warm, n=20000, partitions=cpus)
        run_pipeline(
            spark,
            JobConfig(
                input_paths=(f"{warm}/images.parquet",),
                checkpoint_dir=f"{warm}/ckpt",
                detectors=DETECTORS,
                run_id=f"warm{cpus}",
            ),
            resume=False,
        )
        ckpt = f"{work}/ckpt_{cpus}"
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.monotonic()
        run_pipeline(
            spark,
            JobConfig(
                input_paths=(input_path,),
                checkpoint_dir=ckpt,
                detectors=DETECTORS,
                run_id=f"scale{cpus}",
            ),
            resume=False,
        )
        print(json.dumps({"wall_s": time.monotonic() - t0}))
    finally:
        spark.stop()


def _run_pinned(cpus: int, input_path: str, work: str) -> float:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        sys.executable, __file__, "worker", str(cpus), input_path, work,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"pinned worker (cpus={cpus}) failed")
    out = proc.stdout.strip().splitlines()[-1]
    return float(json.loads(out)["wall_s"])


def _load_state(state_file: str | None) -> list[dict]:
    if not state_file or not os.path.exists(state_file):
        return []
    rows = []
    with open(state_file) as fh:
        for line in fh:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cores_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cores_4n = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * cores_n
    state_file = sys.argv[5] if len(sys.argv) > 5 else None
    if state_file:
        # deterministic work dir so a resumed run reuses the fixture
        work = os.path.join(tempfile.gettempdir(), f"dude_scaling_n{n}")
        os.makedirs(work, exist_ok=True)
    else:
        work = tempfile.mkdtemp(prefix="dude_scaling_")
    try:
        input_path = f"{work}/images.parquet"
        marker = f"{work}/_fixture_done_{n}"
        if not (state_file and os.path.exists(marker)):
            from dude_spark.fixtures import write_fixture
            from dude_spark.session import get_spark

            gen = get_spark(
                "scaling_gen", master="local[32]", shuffle_partitions=32
            )
            gen.sparkContext.setLogLevel("ERROR")
            write_fixture(gen, work, n=n, partitions=64)
            gen.stop()
            if state_file:
                open(marker, "w").close()

        # This Firecracker VM shares a host: identical runs measured
        # t32 ∈ {71.8, 94.4, 119.2} s at n=200k (CPU steal).  One
        # (t8, t32) pair is therefore meaningless; runs alternate
        # configs and the MEDIAN per config is reported, with every
        # sample shown so the spread is visible, never hidden.
        prior = _load_state(state_file)
        t8s = [r["wall_s"] for r in prior if r["cores"] == cores_n]
        t32s = [r["wall_s"] for r in prior if r["cores"] == cores_4n]

        def _sample(cores: int, sink: list[float]) -> None:
            wall = _run_pinned(cores, input_path, work)
            sink.append(wall)
            if state_file:
                with open(state_file, "a") as fh:
                    fh.write(json.dumps({"cores": cores, "wall_s": wall}) + "\n")

        # preserve the alternation order across resumes: repeat i runs
        # (N, 4N); a sample already in the state file is simply skipped
        for i in range(repeats):
            if len(t8s) <= i:
                _sample(cores_n, t8s)
            if len(t32s) <= i:
                _sample(cores_4n, t32s)
        t8s, t32s = sorted(t8s), sorted(t32s)
        t8, t32 = t8s[len(t8s) // 2], t32s[len(t32s) // 2]
        thr8, thr32 = n / t8, n / t32
        eff = (thr32 / thr8) / (cores_4n / cores_n)
        print(
            json.dumps(
                {
                    "n_images": n,
                    "repeats": repeats,
                    "cores_N": cores_n,
                    "cores_4N": cores_4n,
                    f"wall_s_pinned{cores_n}": round(t8, 1),
                    f"wall_s_pinned{cores_4n}": round(t32, 1),
                    f"samples_s_{cores_n}": [round(t, 1) for t in t8s],
                    f"samples_s_{cores_4n}": [round(t, 1) for t in t32s],
                    "images_per_sec_N": round(thr8, 1),
                    "images_per_sec_4N": round(thr32, 1),
                    "scaling_efficiency": round(eff, 3),
                    "target": 0.8,
                    "pass": eff >= 0.8,
                }
            )
        )
    finally:
        if not state_file:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
