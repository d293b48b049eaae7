"""Pure-hardware scaling control: NO Spark, NO shared state.

Measures what 4× more pinned cores buys for an embarrassingly parallel
numpy workload on THIS box: K independent worker *processes* (no GIL,
no shared memory), each pinned inside a `taskset 0-(K-1)` envelope,
each running an identical fixed work quota of the same flavor as the
pipeline's kernels (integer polynomial hashing + small float matmul).
Aggregate units/sec at K=8 vs K=32 bounds ANY job's achievable scaling
on this hardware (shared LLC / memory bandwidth / hypervisor steal) —
no code can exceed it, so pipeline efficiency should be read relative
to this ceiling, not to an ideal 4.0 (BENCH.md "reading these
numbers").  Run it the same session as scaling_bench.py: the ceiling
moves day to day with noisy neighbors.

Usage: python scripts/hw_control.py [units_per_proc] [coresN] [cores4N]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time


def _unit(rs_seed: int) -> float:
    import numpy as np

    rs = np.random.RandomState(rs_seed & 0x7FFFFFFF)
    acc = 0.0
    # integer hashing flavor (shingle/minhash-like); CACHE-RESIDENT
    # working set (~160 KB) iterated, so the control measures the CPU
    # ceiling, not the memory-bandwidth ceiling — a streaming-sized
    # array here understated the achievable scaling by 2-3x
    x = rs.randint(0, 1 << 31, size=20_000).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = x
        for _ in range(10):
            h = h * np.uint64(1099511628211) + np.uint64(14695981039346656037)
        acc += float((h % np.uint64(2147483647)).min())
    # float matmul flavor (embedding/simhash vote-like)
    A = rs.standard_normal((128, 128))
    acc += float((A @ A.T).trace())
    return acc


def worker(units: int, seed: int) -> None:
    t0 = time.monotonic()
    s = 0.0
    for i in range(units):
        s += _unit(seed * 1_000_003 + i)
    print(json.dumps({"wall": time.monotonic() - t0, "sink": s}))


def run_config(procs: int, units: int) -> float:
    """Aggregate units/sec for `procs` pinned worker processes.

    BLAS thread pools are pinned to 1 thread/process: without this,
    each numpy process spawns nproc OpenBLAS threads (procs × 32
    threads on 32 cores) and the measurement collapses to ~1.1×
    scaling from pure scheduler thrash — measured, not hypothetical.
    (A pure-python spin control on the same box scales 3.1×.)"""
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        NUMEXPR_NUM_THREADS="1",
    )
    cmd_prefix = ["taskset", "-c", f"0-{procs - 1}"]
    ps = [
        subprocess.Popen(
            cmd_prefix + [sys.executable, __file__, "worker", str(units), str(i)],
            stdout=subprocess.PIPE, text=True, env=env,
        )
        for i in range(procs)
    ]
    walls = []
    for p in ps:
        out, _ = p.communicate()
        walls.append(json.loads(out.strip().splitlines()[-1])["wall"])
    # aggregate throughput over the slowest worker (barrier semantics,
    # like a Spark stage)
    return procs * units / max(walls)


def main() -> None:
    units = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    cores_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cores_4n = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * cores_n
    thr8 = run_config(cores_n, units)
    thr32 = run_config(cores_4n, units)
    print(
        json.dumps(
            {
                "units_per_proc": units,
                f"units_per_sec_{cores_n}": round(thr8, 1),
                f"units_per_sec_{cores_4n}": round(thr32, 1),
                f"hw_speedup_{cores_n}_to_{cores_4n}": round(thr32 / thr8, 2),
                "hw_ceiling_efficiency": round(
                    thr32 / thr8 / (cores_4n / cores_n), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
