"""CSV report sink: DuDe-cosmetic driver path vs distributed path."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dude_spark.operators.report import (
    CSV_HEADER,
    SEPARATOR,
    delimiter_for_os,
    write_csv_report,
)


@pytest.fixture()
def report_df(spark):
    rows = [
        (f"rep{c}", f"caption {c}", f"dup{c}_{i}", f"dup caption {c} {i}", f"rep{c}")
        for c in range(5)
        for i in range(4)
    ]
    return spark.createDataFrame(rows, CSV_HEADER)


def test_driver_path_cosmetics(report_df, tmp_path):
    path = write_csv_report(report_df, str(tmp_path))
    assert path and path.endswith(".csv") and os.path.isfile(path)
    raw = open(path, "rb").read()
    assert raw[:3] == b"\xef\xbb\xbf"  # BOM (files.go:103)
    lines = raw.decode("utf-8-sig").splitlines()
    assert lines[0] == delimiter_for_os().join(CSV_HEADER)
    # 20 data rows + 4 separators between the 5 clusters
    assert sum(1 for ln in lines if ln == SEPARATOR) == 4
    assert len(lines) == 1 + 20 + 4


def test_distributed_path_roundtrip(spark, report_df, tmp_path):
    path = write_csv_report(report_df, str(tmp_path), max_driver_rows=5)
    assert path and os.path.isdir(path)  # a directory of part files
    parts = glob.glob(os.path.join(path, "part-*"))
    assert parts
    back = spark.read.option("header", True).csv(path)
    assert back.columns == CSV_HEADER
    assert back.count() == 20
    want = {tuple(r) for r in report_df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want
    # rows of one cluster never straddle part files (range partitioning)
    by_part = (
        back.withColumn("part", F.input_file_name())
        .groupBy("cluster_id")
        .agg(F.countDistinct("part").alias("nparts"))
        .collect()
    )
    assert all(r["nparts"] == 1 for r in by_part)


def test_empty_report_writes_nothing(spark, tmp_path):
    empty = spark.createDataFrame([], ", ".join(f"{c} string" for c in CSV_HEADER))
    assert write_csv_report(empty, str(tmp_path)) is None
    assert not glob.glob(os.path.join(str(tmp_path), "*"))
