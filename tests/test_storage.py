"""StageStore contract: parquet implementation + Iceberg availability."""

from __future__ import annotations

import json
import os

import pytest

from dude_spark.storage import IcebergStageStore, ParquetManifestStore


def test_parquet_store_contract(spark, tmp_path):
    store = ParquetManifestStore(spark, str(tmp_path))
    df = spark.range(10).withColumnRenamed("id", "v")

    assert not store.exists("s1")
    assert store.manifest("s1") is None

    out = store.write(df, "s1")
    assert out.count() == 10
    assert store.exists("s1")
    assert store.read("s1").count() == 10

    # manifest publishes atomically AFTER data, survives re-read
    store.publish_manifest("s1", {"config_id": "abc", "rows": 10})
    assert store.manifest("s1") == {"config_id": "abc", "rows": 10}
    raw = json.load(open(os.path.join(str(tmp_path), "stages", "s1.manifest.json")))
    assert raw["config_id"] == "abc"

    # overwrite replaces
    store.write(spark.range(3).withColumnRenamed("id", "v"), "s1")
    assert store.read("s1").count() == 3


def test_iceberg_store_probe_fails_fast_without_runtime(spark):
    """The sandbox ships no Iceberg jar: constructing the Iceberg store
    must raise immediately with actionable guidance, never fail
    mid-pipeline."""
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergStageStore(spark)
