"""asof_join + range_pairs (functions/events.py): the two interval
operators Spark has no native form of.

Contract corners exercised directly (tiny hand-built frames, exact
expected rows): inclusive right.ts <= left.ts, max-(ts, id) tiebreak,
null attach when no prior right exists, bucketed ≡ plain on seeded
random data (the scale path must be a pure plan change), exactly-once
pair emission across bin boundaries, inclusive gap bound, and
equal-timestamp pair orientation.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from dude_spark.functions.events import asof_join, range_pairs

T0 = dt.datetime(2024, 1, 1)


def _frame(spark, rows):
    """(event_id, seconds-from-T0, user_id) -> events-shaped frame."""
    df = spark.createDataFrame(
        [(e, (T0 + dt.timedelta(seconds=s)).isoformat(sep=" "), u) for e, s, u in rows],
        "event_id long, ts string, user_id long",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _asof_pairs(out):
    return {r["event_id"]: r["r_event_id"] for r in out.collect()}


class TestAsofJoin:
    def test_basic_prior_match_and_null(self, spark):
        clicks = _frame(spark, [(100, 50, 1), (101, 10, 1), (102, 40, 2)])
        views = _frame(spark, [(1, 20, 1), (2, 45, 1), (3, 60, 2)])
        got = _asof_pairs(asof_join(clicks, views))
        # click@50 sees view@45 (not the later view@60 of user 2);
        # click@10 predates every view -> null; user 2's view@60 is
        # after click@40 -> null
        assert got == {100: 2, 101: None, 102: None}

    def test_inclusive_same_instant_and_tiebreak(self, spark):
        clicks = _frame(spark, [(100, 30, 1)])
        # two views at the click's EXACT timestamp: both are eligible
        # (inclusive bound); the larger event_id wins the tie
        views = _frame(spark, [(1, 30, 1), (7, 30, 1), (2, 10, 1)])
        assert _asof_pairs(asof_join(clicks, views)) == {100: 7}

    def test_left_columns_survive_and_prefix(self, spark):
        clicks = _frame(spark, [(100, 50, 1)]).withColumn("extra", F.lit("x"))
        views = _frame(spark, [(1, 20, 1)])
        row = asof_join(clicks, views).collect()[0]
        assert row["extra"] == "x"
        assert row["r_event_id"] == 1
        assert row["r_ts"] is not None

    def test_bucketed_equals_plain(self, spark):
        """The time-sliced scale path is a plan change, not a
        semantics change: seeded random events, bucket far smaller
        than the time span, cross-bucket carries exercised."""
        rng = random.Random(42)
        lefts, rights = [], []
        for i in range(300):
            lefts.append((i, rng.randrange(0, 100_000), rng.randrange(5)))
        for i in range(300):
            rights.append((1000 + i, rng.randrange(0, 100_000), rng.randrange(5)))
        lf, rf = _frame(spark, lefts), _frame(spark, rights)
        plain = _asof_pairs(asof_join(lf, rf))
        sliced = _asof_pairs(asof_join(lf, rf, bucket_seconds=3600))
        assert plain == sliced
        # the random layout must actually exercise a cross-bucket
        # carry AND an unmatched left, or this test proves nothing
        assert any(v is None for v in plain.values()) or len(plain) == 300
        assert sum(v is not None for v in plain.values()) > 200

    def test_matches_brute_force(self, spark):
        rng = random.Random(13)
        lefts = [(i, rng.randrange(0, 50_000), rng.randrange(4)) for i in range(150)]
        rights = [
            (1000 + i, rng.randrange(0, 50_000), rng.randrange(4)) for i in range(150)
        ]
        got = _asof_pairs(asof_join(_frame(spark, lefts), _frame(spark, rights)))
        want = {}
        for le, ls, lu in lefts:
            best = None
            for re_, rs, ru in rights:
                if ru == lu and rs <= ls and (best is None or (rs, re_) > best):
                    best = (rs, re_)
            want[le] = best[1] if best else None
        assert got == want

    def test_bucketed_carry_across_empty_buckets(self, spark):
        # right event long before the left, with many empty buckets
        # between: the summary-frame carry must bridge them
        clicks = _frame(spark, [(100, 86_400 * 10, 1)])
        views = _frame(spark, [(1, 5, 1)])
        got = _asof_pairs(asof_join(clicks, views, bucket_seconds=3600))
        assert got == {100: 1}


class TestRangePairs:
    def _pairs(self, out):
        return {(r["a"], r["b"], r["gap_us"]) for r in out.collect()}

    def test_exactly_once_across_bins(self, spark):
        # gap 60 s -> bins of 60 s; events at 59 s and 61 s straddle a
        # bin boundary but are 2 s apart: found exactly once
        ev = _frame(spark, [(1, 59, 1), (2, 61, 1)])
        assert self._pairs(range_pairs(ev, gap_seconds=60)) == {(1, 2, 2_000_000)}

    def test_inclusive_gap_and_exclusion(self, spark):
        ev = _frame(spark, [(1, 0, 1), (2, 60, 1), (3, 121, 1)])
        got = self._pairs(range_pairs(ev, gap_seconds=60))
        # 0..60 inclusive; 60..121 is 61 s -> out; 0..121 -> out
        assert got == {(1, 2, 60_000_000)}

    def test_same_key_only_and_equal_ts_orientation(self, spark):
        ev = _frame(spark, [(5, 10, 1), (9, 10, 1), (7, 10, 2)])
        got = self._pairs(range_pairs(ev, gap_seconds=60))
        # equal-ts pair (5,9) emitted once, oriented by id; user 2
        # never pairs with user 1
        assert got == {(5, 9, 0)}

    def test_matches_brute_force(self, spark):
        rng = random.Random(7)
        rows = [(i, rng.randrange(0, 36_000), rng.randrange(4)) for i in range(200)]
        got = self._pairs(range_pairs(_frame(spark, rows), gap_seconds=900))
        want = set()
        for e1, s1, u1 in rows:
            for e2, s2, u2 in rows:
                if u1 != u2:
                    continue
                if (s2, e2) <= (s1, e1):
                    continue
                if s2 - s1 <= 900:
                    want.add((e1, e2, (s2 - s1) * 1_000_000))
        assert got == want
        assert len(want) > 50  # the fixture actually has volume
