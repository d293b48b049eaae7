"""operators/boilerplate.py — C4-style repeated-span detection/removal.

Detection df math is oracle-gated end-to-end (driver query
boilerplate_ngrams vs a DuckDB true-string GROUP BY); these gates pin
the removal semantics, audit invariants, and the broadcast plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dude_spark.functions.text import token_count
from dude_spark.operators.boilerplate import (
    boilerplate_ngrams,
    strip_boilerplate,
)

_BP = "this message was generated automatically please do not reply"


def _docs(spark):
    rows = [
        (0, f"unique words alpha beta {_BP} gamma delta", b"a"),
        (1, f"{_BP} other content here entirely different", b"b"),
        (2, "completely unrelated text with many  various tokens inside", b"c"),
        (3, f"tail case {_BP}", b"d"),
        (4, "short doc", b"e"),
        # a 5-gram occurring TWICE in one doc but in only one doc:
        # df=1, must not be flagged at min_df>=2
        (5, "solo repeat one two three four solo repeat one two three four", b"f"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, bytes binary")


def test_detection_df_and_min_df(spark):
    det = {r["gram"]: r["df"] for r in boilerplate_ngrams(_docs(spark), n=5, min_df=3).collect()}
    # the 9-token boilerplate sentence has 5 five-grams, each in docs 0,1,3
    assert len(det) == 5 and set(det.values()) == {3}
    assert all(gram in _BP for gram in det)
    # at min_df=2 the within-doc repeat (df=1) still must NOT appear
    det2 = {r["gram"] for r in boilerplate_ngrams(_docs(spark), n=5, min_df=2).collect()}
    assert not any("solo repeat" in g for g in det2)


def test_strip_removes_all_occurrences_and_audits(spark):
    docs = _docs(spark)
    stripped, audit = strip_boilerplate(docs, n=5, min_df=3)
    assert stripped.columns == docs.columns  # schema preserved
    texts = {r["doc_id"]: r["text"] for r in stripped.collect()}
    assert texts[0] == "unique words alpha beta gamma delta"
    assert texts[1] == "other content here entirely different"
    assert texts[3] == "tail case"
    # untouched docs keep their text BYTE-identical (incl. double space)
    assert texts[2] == "completely unrelated text with many  various tokens inside"
    assert texts[4] == "short doc" and "solo repeat" in texts[5]
    got = {r["doc_id"]: r["removed_tokens"] for r in audit.collect()}
    assert got == {0: 9, 1: 9, 3: 9}
    # invariant: removed == tokens(before) - tokens(after)
    before = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    after = {r["doc_id"]: r["n"] for r in stripped.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    for d, rm in got.items():
        assert before[d] - after[d] == rm


def test_strip_removes_within_doc_repeats_of_hot_grams(spark):
    """df counts distinct docs, but removal covers EVERY occurrence."""
    rows = [(0, f"{_BP} middle words {_BP}"), (1, _BP), (2, _BP)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stripped, audit = strip_boilerplate(docs, n=5, min_df=3)
    texts = {r["doc_id"]: r["text"] for r in stripped.collect()}
    assert texts[0] == "middle words"
    assert texts[1] == "" and texts[2] == ""
    assert {r["doc_id"]: r["removed_tokens"] for r in audit.collect()} == {
        0: 18, 1: 9, 2: 9,
    }


def test_validation_and_plan(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="min_df"):
        boilerplate_ngrams(docs, min_df=1)
    with pytest.raises(ValueError, match="n must"):
        strip_boilerplate(docs, n=0)
    stripped, _ = strip_boilerplate(docs, n=5, min_df=3)
    # the intended plan has exactly TWO joins: the hot-hash probe as a
    # static BROADCAST (corpus explode never shuffle-writes) and the
    # docs ⟕ positions attach, which MAY plan sort-merge initially
    # (AQE broadcasts the small aggregated side at runtime).  Counting
    # pins it: losing the F.broadcast hint would turn the probe into a
    # second shuffle join, which a bare 'BroadcastHashJoin in plan'
    # check would miss
    plan = stripped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_cli_boilerplate(spark, tmp_path, monkeypatch, capsys):
    from dude_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _docs(spark).write.parquet(inp)
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    rc = cli.main([
        "boilerplate", "--input", inp, "--out", out,
        "--id-col", "doc_id", "--text-col", "text", "--min-df", "3",
    ])
    assert rc == 0
    assert "5 boilerplate 5-gram(s)" in capsys.readouterr().out
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/stripped").collect()
    }
    assert texts[3] == "tail case"
    assert spark.read.parquet(f"{out}/audit").count() == 3


def test_duplicate_doc_ids_do_not_inflate_df(spark):
    """df counts DISTINCT docs: the same doc id ingested twice (the
    pre-dedup input this engine targets) must not promote its unique
    content to boilerplate at min_df=2."""
    rows = [
        (0, "entirely unique content of the duplicated ingest row here"),
        (0, "entirely unique content of the duplicated ingest row here"),
        (1, "other words that appear nowhere else in this tiny corpus"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert boilerplate_ngrams(docs, n=5, min_df=2).count() == 0
    stripped, audit = strip_boilerplate(docs, n=5, min_df=2)
    assert audit.count() == 0
    assert {r["text"] for r in stripped.collect()} == {r[1] for r in rows}


def test_strip_reuses_precomputed_hot_grams(spark):
    """hot_grams path: strip with a materialized detection table equals
    strip with internal detection."""
    docs = _docs(spark)
    hot = boilerplate_ngrams(docs, n=5, min_df=3)
    via_reuse, _ = strip_boilerplate(docs, n=5, min_df=3, hot_grams=hot)
    internal, _ = strip_boilerplate(docs, n=5, min_df=3)
    assert sorted(map(tuple, via_reuse.collect())) == sorted(
        map(tuple, internal.collect())
    )


def test_over_cap_hot_set_degrades_to_shuffle_join(spark, monkeypatch):
    """Above BROADCAST_HOT_CAP the hint is dropped (a hot set too big
    to broadcast joins on the shuffle path), and results are equal."""
    from dude_spark.operators import boilerplate as bp

    docs = _docs(spark)
    baseline = sorted(map(tuple, strip_boilerplate(docs, n=5, min_df=3)[0].collect()))
    monkeypatch.setattr(bp, "BROADCAST_HOT_CAP", 1)
    stripped, _ = strip_boilerplate(docs, n=5, min_df=3)
    # the static hint is gone: the probe join plans as a shuffle join
    plan = stripped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 1
    assert sorted(map(tuple, stripped.collect())) == baseline


def test_duplication_profile_bruteforce(spark):
    """duplication_profile replays a pure-Python recompute exactly:
    per-doc distinct grams, df over distinct docs, true integer div."""
    from dude_spark.operators.boilerplate import duplication_profile

    rows = [(r[0], r[1]) for r in [
        (0, f"unique words alpha beta {_BP} gamma delta"),
        (1, f"{_BP} other content here entirely different"),
        (2, "completely unrelated text with many  various tokens inside"),
        (3, f"tail case {_BP}"),
        (4, "short doc"),  # < 5 tokens: no grams, absent by contract
        (5, "solo repeat one two three four solo repeat one two three four"),
    ]]
    rows.append((6, rows[2][1]))  # full copy: dup_x1000 = 1000 both ways
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"], r["dup_x1000"])
        for r in duplication_profile(docs, n=5).collect()
    }

    def grams(text):
        t = text.strip().split()
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}

    df = {}
    for i, text in rows:
        for g in grams(text):
            df.setdefault(g, set()).add(i)
    want = {}
    for i, text in rows:
        gs = grams(text)
        if not gs:
            continue
        dup = sum(1 for g in gs if len(df[g]) >= 2)
        want[i] = (len(gs), dup, dup * 1000 // len(gs))
    assert got == want
    assert 4 not in got                      # too short for one gram
    assert got[6][2] == 1000 and got[2][2] == 1000  # full copy, both sides
    # within-doc repetition is NOT duplication: doc 5's grams are its own
    assert got[5][1] < got[5][0]


def test_duplication_profile_plan_and_validation(spark):
    """No Window, no Python workers; min_df/n validation refuses."""
    from dude_spark.operators.boilerplate import duplication_profile

    docs = _docs(spark)
    out = duplication_profile(docs, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # both consumers of the gram frame shuffle on the SAME key, so the
    # explode→hash subtree must execute ONCE via AQE exchange reuse
    # (visible only in the post-execution adaptive plan)
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final
    with pytest.raises(ValueError):
        duplication_profile(docs, n=0)
    with pytest.raises(ValueError):
        duplication_profile(docs, min_df=1)


class TestStripCommonLines:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_chrome_stripped_content_kept(self, spark):
        from dude_spark.operators.boilerplate import strip_common_lines

        rows = [(f"d{i}", f"NAV\nbody {i}\nFOOTER") for i in range(6)]
        rows += [("solo", "original\nlines"), ("nul", None),
                 ("allhot", "NAV\nFOOTER"), ("empty", "")]
        out = {
            r["doc_id"]: r
            for r in strip_common_lines(
                self._df(spark, rows), min_df=5, text_out="clean"
            ).collect()
        }
        assert out["d0"]["clean"] == "body 0" and out["d0"]["n_removed"] == 2
        assert out["solo"]["n_removed"] == 0
        assert out["nul"]["n_lines"] == 0 and out["nul"]["clean"] is None
        assert out["allhot"]["clean"] == "" and out["allhot"]["n_removed"] == 2
        # empty text = one empty line, blank lines never hot
        assert out["empty"]["n_lines"] == 1 and out["empty"]["n_removed"] == 0

    def test_blank_lines_never_hot(self, spark):
        from dude_spark.operators.boilerplate import strip_common_lines

        rows = [(f"d{i}", f"para {i} one\n\npara {i} two") for i in range(9)]
        out = strip_common_lines(self._df(spark, rows), min_df=3).collect()
        assert all(r["n_removed"] == 0 for r in out)

    def test_repeat_within_one_doc_counts_once(self, spark):
        from dude_spark.operators.boilerplate import strip_common_lines

        # 'x' appears 3x in ONE doc: df=1, never hot at min_df=2
        rows = [("a", "x\nx\nx"), ("b", "y\nz")]
        out = {
            r["doc_id"]: r["n_removed"]
            for r in strip_common_lines(self._df(spark, rows), min_df=2).collect()
        }
        assert out == {"a": 0, "b": 0}

    def test_brute_force_seeded(self, spark):
        import hashlib
        import random

        from dude_spark.operators.boilerplate import strip_common_lines

        rng = random.Random(33)
        pool = [f"line{i}" for i in range(12)]
        rows = [
            (f"d{i}", "\n".join(rng.choices(pool, k=rng.randrange(1, 8))))
            for i in range(30)
        ]
        got = {
            tuple(r)
            for r in strip_common_lines(self._df(spark, rows), min_df=4).collect()
        }
        df_count: dict[str, set] = {}
        for d, t in rows:
            for ln in set(t.split("\n")):
                if ln.strip():
                    df_count.setdefault(ln, set()).add(d)
        hot = {ln for ln, ds in df_count.items() if len(ds) >= 4}
        want = set()
        for d, t in rows:
            lines = t.split("\n")
            kept = [ln for ln in lines if ln not in hot]
            want.add((
                d, len(lines), len(lines) - len(kept),
                hashlib.md5("\n".join(kept).encode()).hexdigest(),
            ))
        assert got == want

    def test_min_df_validation(self, spark):
        import pytest as _pt

        from dude_spark.operators.boilerplate import strip_common_lines

        with _pt.raises(ValueError, match="min_df"):
            strip_common_lines(self._df(spark, [("a", "x")]), min_df=1)
