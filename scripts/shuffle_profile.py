"""Per-stage shuffle-bytes profile of the 4-detector pipeline.

Round-4 VERDICT next #7 asks for a shuffle-bytes diet: before cutting
bytes, measure where they go.  This script runs the full pipeline on a
fixture at the given size with the Spark UI enabled, then reads the
UI's REST API (the same numbers the Stages tab shows) and prints ONE
JSON line: total shuffle read/write plus the top stages by shuffle
write, each with its first pipeline-relevant call site.

Conf experiments ride the SPARK_GRAFT_EXTRA_CONF hook (session.py),
e.g.:

    SPARK_GRAFT_EXTRA_CONF='{"spark.io.compression.codec":"zstd"}' \
        python scripts/shuffle_profile.py 100000 8

Usage: python scripts/shuffle_profile.py [n_images] [cpus] [label]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    label = sys.argv[3] if len(sys.argv) > 3 else "default"

    from dude_spark.config import JobConfig
    from dude_spark.fixtures import write_fixture
    from dude_spark.pipeline import run_pipeline
    from dude_spark.session import get_spark

    spark = get_spark(
        f"shuffle_profile_{label}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = os.path.join(tempfile.gettempdir(), f"dude_shufprof_n{n}")
    try:
        if not os.path.exists(os.path.join(work, "_fixture_done")):
            write_fixture(spark, work, n=n, partitions=64)
            open(os.path.join(work, "_fixture_done"), "w").close()
        ckpt = os.path.join(work, f"ckpt_{label}")
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.monotonic()
        run_pipeline(
            spark,
            JobConfig(
                input_paths=(os.path.join(work, "images.parquet"),),
                checkpoint_dir=ckpt,
                detectors=("exact", "minhash", "simhash", "suffix"),
                run_id=f"prof_{label}",
            ),
            resume=False,
        )
        wall = time.monotonic() - t0

        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.loads(r.read())
        total_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        total_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        top = sorted(
            stages, key=lambda s: -s.get("shuffleWriteBytes", 0)
        )[:12]

        def site(s: dict) -> str:
            for line in (s.get("details") or "").splitlines():
                if "/dude_spark/" in line:
                    return line.strip().split("/dude_spark/")[-1]
            return (s.get("name") or "?").split("\n")[0][:60]

        print(
            json.dumps(
                {
                    "label": label,
                    "n_images": n,
                    "cpus": cpus,
                    "wall_s": round(wall, 1),
                    "codec": spark.conf.get(
                        "spark.io.compression.codec", "lz4(default)"
                    ),
                    "shuffle_write_mb": round(total_w / 1e6, 1),
                    "shuffle_read_mb": round(total_r / 1e6, 1),
                    "top_stages": [
                        {
                            "stage": s["stageId"],
                            "write_mb": round(
                                s.get("shuffleWriteBytes", 0) / 1e6, 1
                            ),
                            "read_mb": round(
                                s.get("shuffleReadBytes", 0) / 1e6, 1
                            ),
                            "wall_s": round(
                                (s.get("executorRunTime", 0)) / 1000.0, 1
                            ),
                            "site": site(s),
                        }
                        for s in top
                        if s.get("shuffleWriteBytes", 0) > 0
                    ],
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
