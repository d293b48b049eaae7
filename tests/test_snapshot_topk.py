"""grouped_topk (functions/ranking.py) + snapshot_diff
(operators/snapshot.py): exact-vs-brute-force equivalence, the
no-Window plan guarantee, salt independence, and diff classification
corners (separator collisions, empty sides, include_unchanged)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dude_spark.functions.ranking import grouped_topk
from dude_spark.operators.snapshot import snapshot_diff


def _rows(out):
    return {(r["g"], r["v"], r["uid"], r["rank"]) for r in out.collect()}


class TestGroupedTopk:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, v long, uid long")

    def test_matches_brute_force(self, spark):
        rng = random.Random(99)
        rows = [
            (f"g{rng.randrange(5)}", rng.randrange(100), i) for i in range(400)
        ]
        got = _rows(grouped_topk(self._df(spark, rows), ["g"], ["v", "uid"], k=7))
        want = set()
        by_g: dict[str, list] = {}
        for g, v, u in rows:
            by_g.setdefault(g, []).append((v, u))
        for g, vs in by_g.items():
            for rank, (v, u) in enumerate(sorted(vs)[:7], start=1):
                want.add((g, v, u, rank))
        assert got == want

    def test_small_groups_return_all_rows(self, spark):
        df = self._df(spark, [("a", 3, 1), ("a", 1, 2), ("b", 5, 3)])
        got = _rows(grouped_topk(df, ["g"], ["v", "uid"], k=10))
        assert got == {("a", 1, 2, 1), ("a", 3, 1, 2), ("b", 5, 3, 1)}

    def test_salt_independent(self, spark):
        rng = random.Random(5)
        rows = [("hot", rng.randrange(1000), i) for i in range(500)]
        df = self._df(spark, rows)
        one = _rows(grouped_topk(df, ["g"], ["v", "uid"], k=5, n_salt=1))
        many = _rows(grouped_topk(df, ["g"], ["v", "uid"], k=5, n_salt=64))
        assert one == many and len(one) == 5

    def test_no_window_in_plan(self, spark):
        df = self._df(spark, [("a", 1, 1)])
        plan = (
            grouped_topk(df, ["g"], ["v", "uid"], k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan

    def test_descending_via_negation(self, spark):
        df = self._df(spark, [("a", 10, 1), ("a", 30, 2), ("a", 20, 3)])
        out = grouped_topk(
            df.withColumn("nv", -F.col("v")), ["g"], ["nv", "uid"], k=2
        )
        got = [(r["v"], r["rank"]) for r in out.orderBy("rank").collect()]
        assert got == [(30, 1), (20, 2)]


class TestSnapshotDiff:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_classification(self, spark):
        old = self._df(spark, [(1, "same"), (2, "before"), (3, "gone")])
        new = self._df(spark, [(1, "same"), (2, "after"), (4, "fresh")])
        got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
        assert got == {2: "changed", 3: "removed", 4: "added"}

    def test_include_unchanged_and_fp_fields(self, spark):
        old = self._df(spark, [(1, "same")])
        new = self._df(spark, [(1, "same")])
        rows = snapshot_diff(old, new, include_unchanged=True).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["status"] == "unchanged" and r["old_fp"] == r["new_fp"] != ""

    def test_removed_has_empty_new_fp(self, spark):
        old = self._df(spark, [(3, "gone")])
        new = old.where(F.lit(False))
        r = snapshot_diff(old, new).collect()[0]
        assert (r["status"], r["new_fp"]) == ("removed", "") and r["old_fp"]

    def test_multi_column_separator_no_collision(self, spark):
        old = spark.createDataFrame([(1, "ab", "c")], "doc_id long, a string, b string")
        new = spark.createDataFrame([(1, "a", "bc")], "doc_id long, a string, b string")
        got = snapshot_diff(old, new, content_cols=("a", "b")).collect()
        assert [r["status"] for r in got] == ["changed"]

    def test_null_content_is_distinct_from_empty_and_shifted(self, spark):
        """NULL-aware fingerprint: a bare concat_ws would SKIP null
        columns, so (NULL,'a') vs ('a',NULL) and NULL vs '' would all
        read 'unchanged' — each must be 'changed'."""
        two = "doc_id long, a string, b string"
        old = spark.createDataFrame([(1, "a", None)], two)
        new = spark.createDataFrame([(1, None, "a")], two)
        got = snapshot_diff(old, new, content_cols=("a", "b")).collect()
        assert [r["status"] for r in got] == ["changed"]

        old1 = self._df(spark, [(1, None)])
        new1 = self._df(spark, [(1, "")])
        got1 = snapshot_diff(old1, new1).collect()
        assert [r["status"] for r in got1] == ["changed"]
        # and NULL -> NULL really is unchanged (absent from the diff)
        assert snapshot_diff(old1, old1).count() == 0
