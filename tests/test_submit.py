"""End-to-end `spark-submit --py-files` packaging proof (north-rule
clause: "ships as a spark-submit --py-files job").

Builds dude_spark.zip from the working tree, then launches a REAL
spark-submit subprocess from a temp cwd with PYTHONPATH stripped, so
both the driver and the python workers can only import the package
from the --py-files zip.  A ModuleNotFoundError here is a packaging
regression (a module reading files relative to __file__, a missing
subpackage, an import-time dependency on the repo checkout)."""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import pytest

from dude_spark.fixtures import write_fixture

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    write_fixture(spark, str(tmp_path), n=400, partitions=4)

    zip_path = shutil.make_archive(
        str(tmp_path / "dude_spark_pkg"), "zip", REPO_ROOT, "dude_spark"
    )
    shutil.copy(
        os.path.join(REPO_ROOT, "scripts", "submit_driver.py"),
        tmp_path / "submit_driver.py",
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            "submit_driver.py",
            "run",
            "--input", f"{tmp_path}/images.parquet",
            "--checkpoint", f"{tmp_path}/ckpt",
            "--results", f"{tmp_path}/results",
            "--detectors", "exact,minhash",
            "--run-id", "submit_e2e",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )

    # the fixture plants exact+near dups, so a report must exist
    csvs = glob.glob(f"{tmp_path}/results/**/*.csv", recursive=True)
    assert csvs, f"no results csv; stdout:\n{proc.stdout[-2000:]}"
    raw = open(csvs[0], "rb").read()
    assert raw[:3] == b"\xef\xbb\xbf"  # reference CSV contract: UTF-8 BOM
    assert raw.count(b"\n") > 1
