"""Evidence probe: streaming per-epoch cost stays O(batch) as the
corpus grows, while a batch CC re-run over accumulated pairs grows
with the corpus.

Drives the real ingest loop (start_incremental_dedup with
assign_clusters and compaction) over E epochs of fixed batch size and
prints, per epoch: the wall, the assignment-fold state-scan audit
(files opened vs live total), and the wall of re-running BATCH
connected components over the cumulative pairs table — the cost the
incremental fold replaces.  One JSON line at the end for BENCH.md.

Usage: python scripts/stream_scale_probe.py [epochs] [rows_per_epoch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from dude_spark.operators.components import connected_components  # noqa: E402
from dude_spark.session import get_spark  # noqa: E402
from dude_spark.storage import ShardedEpochStore  # noqa: E402
from dude_spark.streaming import start_incremental_dedup  # noqa: E402


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("stream_scale_probe", master="local[8]",
                      shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="stream_probe_")
    input_dir, state_dir = os.path.join(root, "in"), os.path.join(root, "st")
    rows = []

    def payload(e: int, i: int) -> bytes:
        # ~10% of each batch duplicates a payload the PREVIOUS epoch
        # actually emitted as unique (its rows [2n/10, n) carry their
        # own p-(e-1)-i payload — referencing i<n/10 there would miss:
        # those rows carry e-2 payloads themselves), ~10% duplicates
        # within the batch (odd i repeats even i-1), the rest unique —
        # deterministic, no RNG needed
        if e > 0 and i < n // 10:
            return f"p-{e - 1:03d}-{2 * n // 10 + i:06d}".encode()
        if i < 2 * n // 10:
            return f"p-{e:03d}-{i - i % 2:06d}".encode()
        return f"p-{e:03d}-{i:06d}".encode()

    for e in range(epochs):
        pdf = pd.DataFrame({
            "image_id": [f"e{e:03d}-{i:06d}" for i in range(n)],
            "bytes": [payload(e, i) for i in range(n)],
        })
        pdf.to_parquet(os.path.join(input_dir, f"batch-{e:03d}.parquet")
                       if os.path.isdir(input_dir) else _first(input_dir, e))
        t0 = time.monotonic()
        q = start_incremental_dedup(
            spark, input_dir, state_dir, "image_id string, bytes binary",
            n_state_shards=32, assign_clusters=True, compact_every=4,
        )
        q.awaitTermination(600)
        wall = time.monotonic() - t0
        with open(os.path.join(state_dir, "scans", f"epoch_{e}.json")) as f:
            scan = json.load(f)
        # the replaced cost: batch CC over ALL pairs so far
        t1 = time.monotonic()
        all_pairs = spark.read.parquet(os.path.join(state_dir, "pairs"))
        n_assign = connected_components(all_pairs).count()
        cc_wall = time.monotonic() - t1
        sig_store = ShardedEpochStore(spark, state_dir, "sigs",
                                      key_col="bucket", n_shards=32)
        rows.append({
            "epoch": e,
            "epoch_wall_s": round(wall, 2),
            "batch_cc_rerun_s": round(cc_wall, 2),
            "assign_files_read": scan["assign"]["assign_scan"]["files_read"],
            "sigs_files_read": scan["sigs"]["files_read"],
            "sigs_files_live": sig_store.total_data_files(),
            "cc_rows": n_assign,
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({"probe": "stream_scale", "epochs": epochs,
                      "rows_per_epoch": n, "rows": rows}))
    spark.stop()
    return 0


def _first(input_dir: str, e: int) -> str:
    os.makedirs(input_dir, exist_ok=True)
    return os.path.join(input_dir, f"batch-{e:03d}.parquet")


if __name__ == "__main__":
    sys.exit(main())
