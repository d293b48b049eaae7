"""Pinned two-parallelism scaling probe for the distributed k-means
operator (functions/clustering.kmeans_clusters) — the round-4
clustering flagship's own N-vs-4N evidence, same protocol as
scaling_bench.py: identical pre-generated input, taskset-pinned
subprocesses at N and 4N cores, fixed shuffle partitioning, warmup
action inside each subprocess, alternated samples, every wall
printed.

Why this job should scale: each Lloyd round is one embarrassingly
parallel corpus scan through an int64-matmul pandas UDF plus one
map-side-combinable (cluster, dim) integer-sum aggregate whose
exchange carries k·dim rows TOTAL — there is no quadratic stage, no
global sort, and the only driver traffic is k·dim longs per round.
The (2, 8) pair is the faithful proxy on this DRAM-limited single
socket (BENCH.md round-3/4 analysis).

Usage:
  python scripts/kmeans_scale_probe.py [n_rows] [repeats] [coresN] [cores4N]
  python scripts/kmeans_scale_probe.py worker CPUS INPUT   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
K = 64
ITERS = 3


def _fixture(n_rows: int) -> str:
    """Deterministic embeddings parquet, keyed by n (reused across
    runs so both pinned legs read identical bytes)."""
    path = os.path.join(
        tempfile.gettempdir(), f"kmeans_probe_{n_rows}_{DIM}.parquet"
    )
    if os.path.exists(path):
        return path
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    # blobs around 16 anchors + noise: realistic cluster structure
    anchors = rng.uniform(-0.5, 0.5, (16, DIM))
    idx = rng.randint(0, 16, n_rows)
    X = anchors[idx] + rng.uniform(-0.1, 0.1, (n_rows, DIM))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n_rows), "embedding": list(X.astype(np.float32))}
    )
    # many row groups: a single-row-group file plans as ONE input
    # partition and the scan/quantize/checkpoint phase serializes —
    # the session-level ensure_min_partitions lesson applies to the
    # FIXTURE here (a real corpus has thousands of splits)
    pdf.to_parquet(path, index=False, row_group_size=max(n_rows // 64, 1))
    return path


def worker(cpus: int, input_path: str) -> None:
    """Times SETUP (scan → quantize → checkpoint + seed collect) apart
    from the Lloyd ROUNDS + final assignment: setup is a one-time scan
    whose parallelism is the file layout's (on a cluster, thousands of
    splits); the rounds are what the iteration count MULTIPLIES, so
    they carry the scaling claim."""
    from dude_spark.functions.clustering import (
        _assign_on_u,
        _fit_on_u,
        _u_frame,
    )
    from dude_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        "kmeans_probe", master=f"local[{cpus}]", shuffle_partitions=64
    )
    embs = spark.read.parquet(input_path).select(
        "vec_id", F.col("embedding").cast("array<float>")
    )
    embs.count()  # warmup: scan + JVM spin-up outside the clock
    # python-worker warmup: the FIRST pandas-UDF stage pays worker
    # pool spin-up (~2-3 s once per session) — without this, the fit's
    # first round carries it and the smaller-core leg amortizes it
    # over a longer wall, biasing efficiency upward
    import numpy as _np

    from dude_spark.functions.clustering import _assign_udf

    warm_c = _np.ones((2, DIM), dtype=_np.int64)
    warm = _assign_udf(warm_c, [DIM, DIM], with_sim=False)
    _u_frame(embs.limit(2048), "vec_id", "embedding").select(
        warm(F.col("_u"))
    ).count()
    t0 = time.time()
    u = _u_frame(embs, "vec_id", "embedding").localCheckpoint(eager=True)
    t1 = time.time()
    cent = _fit_on_u(u, K, ITERS)
    n = _assign_on_u(u, cent, "vec_id").count()
    t2 = time.time()
    print(json.dumps({
        "setup_s": round(t1 - t0, 2),
        "rounds_s": round(t2 - t1, 2),
        "wall_s": round(t2 - t0, 2),
        "rows": n,
    }))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return 0
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores_n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cores_4n = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    inp = _fixture(n_rows)
    walls: dict[int, list[float]] = {cores_n: [], cores_4n: []}
    for r in range(repeats):
        for cpus in (cores_n, cores_4n):  # alternated
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}",
                sys.executable, os.path.abspath(__file__), "worker",
                str(cpus), inp,
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            walls[cpus].append(rec["rounds_s"])
            print(
                f"sample {r}: {cpus} cores -> rounds {rec['rounds_s']} s "
                f"(setup {rec['setup_s']} s, total {rec['wall_s']} s)",
                flush=True,
            )
    med = {c: sorted(v)[len(v) // 2] for c, v in walls.items()}
    tput = {c: n_rows / med[c] for c in med}
    eff = (tput[cores_4n] / tput[cores_n]) / (cores_4n / cores_n)
    print(json.dumps({
        "n_rows": n_rows, "k": K, "iters": ITERS, "dim": DIM,
        "cores": [cores_n, cores_4n],
        "samples_s": {str(c): v for c, v in walls.items()},
        "median_s": {str(c): med[c] for c in med},
        "rows_per_sec_rounds": {str(c): round(tput[c], 1) for c in tput},
        "scaling_efficiency_rounds": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
