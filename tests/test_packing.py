"""Sequence packing (operators/packing.py) and the distributed
running-total primitive behind it (functions/ranking.with_running_total).

Gates: bit-identity vs the single-partition window expression (the
thing the two-pass shape replaces), SinglePartition-free plan,
stability under input repartitioning, weight validation, and the
concat-and-chunk invariants (offsets < budget, seq ids monotone
non-decreasing in pack order, first doc at (0, 0))."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dude_spark.functions.ranking import with_running_total
from dude_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def toks_df(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(500),
            # mixed sizes incl. 0-token docs and docs over the budget
            "n_tokens": [(i * 37) % 211 + (613 if i % 97 == 0 else 0)
                         for i in range(500)],
        }
    )
    return spark.createDataFrame(pdf, "doc_id long, n_tokens long")


def test_running_total_matches_window(toks_df):
    got = {
        r["doc_id"]: r["running"]
        for r in with_running_total(
            toks_df, ("doc_id",), "n_tokens"
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["doc_id"]: r["cum"] - r["n_tokens"]
        for r in toks_df.withColumn(
            "cum", F.sum("n_tokens").over(w)
        ).collect()
    }
    assert got == want


def test_pack_matches_window_and_invariants(toks_df):
    budget = 256
    out = pack_sequences(toks_df, budget).orderBy("doc_id").collect()
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        toks_df.withColumn(
            "pfx", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["seq_id"], r["seq_offset"]) for r in out] == [
        (r["pfx"] // budget, r["pfx"] % budget) for r in want
    ]
    assert (out[0]["seq_id"], out[0]["seq_offset"]) == (0, 0)
    assert all(0 <= r["seq_offset"] < budget for r in out)
    seqs = [r["seq_id"] for r in out]
    assert seqs == sorted(seqs)  # monotone in pack order


def test_pack_stable_under_repartition(toks_df):
    base = {
        (r["doc_id"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(toks_df, 100).collect()
    }
    shuffled = {
        (r["doc_id"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(toks_df.repartition(13), 100).collect()
    }
    assert base == shuffled


def test_pack_plan_no_single_partition(toks_df):
    plan = (
        pack_sequences(toks_df, 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_weight_validation(spark, toks_df):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(toks_df, 0)
    neg = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "n_tokens": [5, -1]}),
        "doc_id long, n_tokens long",
    )
    with pytest.raises(ValueError, match="non-negative"):
        pack_sequences(neg, 10).collect()
    nulls = spark.createDataFrame(
        [(1, 5), (2, None)], "doc_id long, n_tokens long"
    )
    with pytest.raises(ValueError, match="NULL"):
        pack_sequences(nulls, 10).collect()
    clash = toks_df.withColumn("seq_id", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        pack_sequences(clash, 10)


def test_budget_select_matches_greedy(toks_df):
    """Kept set + cum_tokens == the Python greedy walk in quality
    order, including the boundary doc that exactly exhausts the budget
    (inclusive <=, whole docs only)."""
    from dude_spark.operators.packing import budget_select

    d = toks_df.withColumn("negq", -((F.col("doc_id") * 7) % 13))
    rows = sorted(
        ((-(i * 7 % 13), i, (i * 37) % 211 + (613 if i % 97 == 0 else 0))
         for i in range(500))
    )
    # pick a budget landing EXACTLY on a prefix sum: the boundary doc
    # must be kept
    acc, prefix = 0, []
    for _, i, t in rows:
        acc += t
        prefix.append((i, t, acc))
    budget = prefix[137][2]
    want = {(i, t, c) for i, t, c in prefix if c <= budget}
    got = {
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in budget_select(
            d, budget, token_col="n_tokens", order_cols=("negq", "doc_id")
        ).collect()
    }
    assert got == want
    assert prefix[137][0:1][0] in {i for i, _, _ in want}  # boundary kept
    assert 0 < len(want) < 500  # a strict, non-empty cut


def test_budget_select_validation(toks_df):
    from dude_spark.operators.packing import budget_select

    with pytest.raises(ValueError, match="budget must be positive"):
        budget_select(toks_df, 0)
    with pytest.raises(ValueError, match="collide"):
        budget_select(
            toks_df.withColumn("cum_tokens", F.lit(1)), 100
        )
