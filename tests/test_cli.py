"""CLI surface: the stream subcommand drives ingest dedup end to end."""

from __future__ import annotations

import os

from dude_spark import cli


def test_cli_stream_exact(spark, tmp_path, monkeypatch, capsys):
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    df = spark.createDataFrame(
        [("a", b"same"), ("b", b"same"), ("c", b"other")],
        "image_id string, bytes binary",
    )
    df.coalesce(1).write.parquet(input_dir)

    # inject the session fixture: the CLI builds (and stops) its own
    # session, which would tear down the shared test session
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    rc = cli.main(["stream", "--input", input_dir, "--state", state_dir])
    assert rc == 0
    assert "pairs:" in capsys.readouterr().out

    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    assert pairs == {("a", "b")}


def test_cli_stream_minhash_flag_builds_detector(spark, tmp_path, monkeypatch):
    """--detector minhash wires the D1 preset (near-dup captions pair)."""
    input_dir, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    base = (
        "the quick brown fox jumps over the lazy dog beside the quiet "
        "riverbank at dawn while distant church bells echo across the valley"
    )
    df = spark.createDataFrame(
        [("a", base), ("b", base.replace("quick", "swift")),
         ("c", "entirely unrelated text about parquet footer statistics")],
        "image_id string, caption string",
    )
    df.coalesce(1).write.parquet(input_dir)

    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    rc = cli.main([
        "stream", "--input", input_dir, "--state", state_dir,
        "--schema", "image_id string, caption string",
        "--detector", "minhash",
    ])
    assert rc == 0
    pairs = {
        (r["a"], r["b"])
        for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    }
    assert pairs == {("a", "b")}
