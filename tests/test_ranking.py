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


class TestGroupedQuantiles:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, v long")

    def test_matches_brute_force_seeded(self, spark):
        import random

        from dude_spark.functions.ranking import grouped_quantiles

        rng = random.Random(42)
        rows = [
            (f"g{rng.randrange(4)}", rng.randrange(50)) for _ in range(300)
        ]
        got = {
            r["g"]: (r["n_rows"], r["p100"], r["p500"], r["p900"])
            for r in grouped_quantiles(
                self._df(spark, rows), ["g"], "v"
            ).collect()
        }
        want = {}
        by_g: dict[str, list[int]] = {}
        for g, v in rows:
            by_g.setdefault(g, []).append(v)
        for g, vs in by_g.items():
            vs.sort()
            n = len(vs)
            thr = lambda q: min(
                v for i, v in enumerate(vs) if (i + 1) * 1000 >= q * n
            )
            want[g] = (n, thr(100), thr(500), thr(900))
        assert got == want

    def test_constant_group_and_null_exclusion(self, spark):
        from dude_spark.functions.ranking import grouped_quantiles

        rows = [("a", 7), ("a", 7), ("a", 7), ("a", None), ("b", 1)]
        got = {
            r["g"]: tuple(r)[1:]
            for r in grouped_quantiles(
                self._df(spark, rows), ["g"], "v", (500, 1000)
            ).collect()
        }
        assert got["a"] == (3, 7, 7)  # NULL excluded from n_rows
        assert got["b"] == (1, 1, 1)

    def test_validation(self, spark):
        import pytest

        from dude_spark.functions.ranking import grouped_quantiles

        df = self._df(spark, [("a", 1)])
        with pytest.raises(ValueError, match="quantiles_x1000"):
            grouped_quantiles(df, ["g"], "v", (0,))
        with pytest.raises(ValueError, match="duplicate"):
            grouped_quantiles(df, ["g"], "v", (500, 500))
