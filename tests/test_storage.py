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


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def test_iceberg_store_probe_fails_fast_without_runtime(spark):
    """The sandbox ships no Iceberg jar: constructing the Iceberg store
    must raise immediately with actionable guidance, never fail
    mid-pipeline."""
    if _iceberg_available(spark):
        pytest.skip("Iceberg runtime present — probe-failure path N/A")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergStageStore(spark)


def test_iceberg_store_contract_parity(spark, tmp_path):
    """Executable swap claim (round-3 VERDICT next #7): when the
    Iceberg runtime jar IS on the classpath, the Iceberg store must
    satisfy the exact StageStore contract the parquet store does —
    write/read/exists/manifest/publish (idempotent MERGE re-publish) —
    with identical observable results.  Skips (with the missing-jar
    message) in this sandbox; runs wherever spark-submit ships
    --packages org.apache.iceberg:iceberg-spark-runtime."""
    if not _iceberg_available(spark):
        pytest.skip(
            "org.apache.iceberg not on the Spark classpath — submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime to run"
        )
    stores = {
        "parquet": ParquetManifestStore(spark, str(tmp_path)),
        "iceberg": IcebergStageStore(spark, namespace="dude_spark_test"),
    }
    results = {}
    for name, store in stores.items():
        df = spark.range(10).withColumnRenamed("id", "v")
        assert not store.exists("c1")
        assert store.manifest("c1") is None
        out = store.write(df, "c1")
        store.publish_manifest("c1", {"config_id": "abc", "rows": 10})
        # re-publish must be idempotent (MERGE INTO / atomic replace)
        store.publish_manifest("c1", {"config_id": "abc", "rows": 10})
        store.write(spark.range(3).withColumnRenamed("id", "v"), "c1")
        results[name] = (
            out.count(),
            store.exists("c1"),
            store.manifest("c1"),
            sorted(r["v"] for r in store.read("c1").collect()),
        )
    assert results["parquet"] == results["iceberg"]
