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


# --- representative selection (keep-the-best-duplicate policy) ---


def _reps(spark, assign_rows, score_rows):
    from dude_spark.operators.report import select_representatives

    assigns = spark.createDataFrame(assign_rows, "image_id string, cluster_id string")
    scores = spark.createDataFrame(score_rows, "image_id string, q long")
    return {
        r["cluster_id"]: (r["rep_id"], r["rep_score"])
        for r in select_representatives(assigns, scores, "q").collect()
    }


def test_select_representatives_max_score_min_id_ties(spark):
    got = _reps(
        spark,
        # c1: distinct scores — b wins; c2: tie at 9 between d and e —
        # min id d wins; singleton cluster c3 keeps its only member
        [
            ("a", "c1"), ("b", "c1"), ("c", "c1"),
            ("d", "c2"), ("e", "c2"), ("f", "c2"),
            ("g", "c3"),
        ],
        [
            ("a", 5), ("b", 8), ("c", 2),
            ("d", 9), ("e", 9), ("f", 1),
            ("g", 3),
        ],
    )
    assert got == {"c1": ("b", 8), "c2": ("d", 9), "c3": ("g", 3)}


def test_select_representatives_unscored_members_never_win(spark):
    # b has the top score but no scores row: inner join drops it, a wins
    got = _reps(spark, [("a", "c1"), ("b", "c1")], [("a", 1)])
    assert got == {"c1": ("a", 1)}


def test_select_representatives_plan_has_no_window(spark):
    """Scale gate: the argmax must be combinable aggregates, never a
    per-cluster window sort (one hot component = one buffering task)."""
    from dude_spark.operators.report import select_representatives

    assigns = spark.range(100).select(
        F.concat(F.lit("i"), F.col("id")).alias("image_id"),
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("cluster_id"),
    )
    scores = spark.range(100).select(
        F.concat(F.lit("i"), F.col("id")).alias("image_id"),
        (F.col("id") % 7).alias("q"),
    )
    plan = (
        select_representatives(assigns, scores, "q")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_reroot_assignments_rewrites_cluster_ids(spark):
    from dude_spark.operators.report import (
        reroot_assignments,
        select_representatives,
    )

    assigns = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "image_id string, cluster_id string"
    )
    scores = spark.createDataFrame(
        [("a", 1), ("b", 7), ("c", 3)], "image_id string, q long"
    )
    reps = select_representatives(assigns, scores, "q")
    out = {
        r["image_id"]: r["cluster_id"]
        for r in reroot_assignments(assigns, reps).collect()
    }
    assert out == {"a": "b", "b": "b", "c": "b"}


def test_dedup_corpus_keeps_reps_and_untouched_rows(spark):
    from dude_spark.operators.report import (
        dedup_corpus,
        reroot_assignments,
        select_representatives,
    )

    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in ("a", "b", "c", "x", "y")],
        "image_id string, text string",
    )
    # one cluster {a, b, c} with rep a (component min); x, y untouched
    assigns = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "image_id string, cluster_id string"
    )
    out = dedup_corpus(corpus, assigns)
    assert set(out.columns) == {"image_id", "text"}  # schema unchanged
    assert {r["image_id"] for r in out.collect()} == {"a", "x", "y"}

    # composed with quality reroot: b (best score) survives instead of a
    scores = spark.createDataFrame(
        [("a", 1), ("b", 9), ("c", 2)], "image_id string, q long"
    )
    rerooted = reroot_assignments(
        assigns, select_representatives(assigns, scores, "q")
    )
    out2 = dedup_corpus(corpus, rerooted)
    assert {r["image_id"] for r in out2.collect()} == {"b", "x", "y"}


def test_dedup_impact_per_stratum_accounting(spark):
    """dedup_impact: exact per-source counts — docs outside every
    cluster count toward n_docs only; removed = non-representative
    members; true-integer per-mille."""
    from dude_spark.operators.report import dedup_impact

    corpus = spark.createDataFrame(
        [
            ("a1", "web"), ("a2", "web"), ("a3", "web"), ("a4", "web"),
            ("b1", "books"), ("b2", "books"),
            ("c1", "code"),
        ],
        "image_id string, source string",
    )
    # cluster {a1,a2,a3} (a1 rep), cluster {b1,b2} (b1 rep); a4/c1 unseen
    assignments = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("a3", "a1"), ("b1", "b1"), ("b2", "b1")],
        "image_id string, cluster_id string",
    )
    got = {
        r["source"]: (r["n_docs"], r["dup_members"], r["removed"], r["removed_x1000"])
        for r in dedup_impact(corpus, assignments).collect()
    }
    assert got == {
        "web": (4, 3, 2, 500),    # 2*1000 div 4
        "books": (2, 2, 1, 500),
        "code": (1, 0, 0, 0),
    }
    # plan: no Window, no Python workers
    plan = (
        dedup_impact(corpus, assignments)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_impact_composes_with_reroot(spark):
    """After reroot_assignments the removal policy follows the chosen
    representative: removed counts members != rep, and dedup_corpus's
    survivor count per stratum equals n_docs - removed."""
    from dude_spark.operators.report import (
        dedup_corpus,
        dedup_impact,
        reroot_assignments,
        select_representatives,
    )

    corpus = spark.createDataFrame(
        [("a1", "web"), ("a2", "web"), ("a3", "web")],
        "image_id string, source string",
    )
    assignments = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("a3", "a1")],
        "image_id string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("a1", 1), ("a2", 9), ("a3", 5)], "image_id string, score long"
    )
    reps = select_representatives(assignments, scores, "score")
    rerooted = reroot_assignments(assignments, reps)
    got = dedup_impact(corpus, rerooted).collect()[0]
    assert (got["n_docs"], got["removed"]) == (3, 2)  # a2 survives
    survivors = {r["image_id"] for r in dedup_corpus(corpus, rerooted).collect()}
    assert survivors == {"a2"}
    assert got["n_docs"] - got["removed"] == len(survivors)
