"""functions/ranking.py — distributed global rank / exact ntile."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dude_spark.functions.ranking import ntile_exact, with_global_rank


def _frame(spark, n, seed=11, parts=7):
    rng = random.Random(seed)
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            # heavy ties: chars drawn from a small range so order needs
            # the doc_id tiebreak, exactly like the driver query
            "chars": pd.array(
                [rng.randrange(40) for _ in range(n)], dtype="int64"
            ),
        }
    )
    return spark.createDataFrame(
        pdf, "doc_id long, chars long"
    ).repartition(parts)


def test_global_rank_matches_window_row_number(spark):
    df = _frame(spark, 700)
    got = with_global_rank(df, ("chars", "doc_id")).toPandas()
    got = got.sort_values(["chars", "doc_id"]).reset_index(drop=True)
    assert list(got["rn"]) == list(range(700))


@pytest.mark.parametrize("n", [0, 1, 7, 10, 503])
def test_ntile_exact_bit_identical_to_window(spark, n):
    """Every tile assignment equals ntile(10) OVER (ORDER BY chars,
    doc_id) — including n < tiles, n % tiles != 0, and empty input."""
    df = _frame(spark, n)
    w = Window.orderBy(F.col("chars"), F.col("doc_id"))
    want = (
        df.withColumn("tile", F.ntile(10).over(w).cast("long"))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        ntile_exact(df, 10, ("chars", "doc_id"))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got[["doc_id", "chars", "tile"]].equals(
        want[["doc_id", "chars", "tile"]]
    )


def test_ntile_exact_plan_has_no_single_partition_exchange(spark):
    """The point of the operator: no global-order window, so no
    SinglePartition exchange anywhere in the physical plan (the window
    variant plans `Exchange SinglePartition`)."""
    df = _frame(spark, 300)
    out = ntile_exact(df, 10, ("chars", "doc_id"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # and the window version genuinely would have planned one
    w = Window.orderBy(F.col("chars"), F.col("doc_id"))
    wplan = (
        df.withColumn("t", F.ntile(10).over(w))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in wplan
