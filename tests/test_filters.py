"""operators/filters.py — corpus quality filtering gates.

The signal math is oracle-gated end-to-end (driver query
filter_reasons, composed from the doc_quality/repetition/lang_id
twins); these tests pin the operator contract: first-match cascade
order, input partition, schema preservation, zero-shuffle plan, and
the CLI routing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dude_spark import cli
from dude_spark.operators.filters import filter_corpus, rejection_reason

# passes every quality cut: 20 tokens, 7 stopwords (350 per-mille),
# no repeated 2-grams worth 20% of chars, no duplicate 5-grams
_CLEAN = (
    "the quick brown fox jumps over a lazy dog and then of course "
    "to in the village we go today"
)


def _reasons(spark, texts, langs=None):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    out = df.select(
        "text", rejection_reason(F.col("text"), langs).alias("reason")
    ).collect()
    return {r["text"]: r["reason"] for r in out}


def test_reason_cascade_first_match(spark):
    spam = ("the cat sat on a mat " * 10).strip()  # stopword-rich loop junk
    keyword = "alpha beta gamma delta " * 10  # no stopwords AND repetitive
    blocked = _CLEAN + " α"  # Greek char -> lang 'el'
    rows = _reasons(
        spark,
        ["one two three", keyword, spam, blocked, _CLEAN],
        langs=("en", "de"),
    )
    assert rows["one two three"] == "too_short"
    # precedence: low_stopword fires before repetitive on keyword spam
    assert rows[keyword] == "low_stopword"
    assert rows[spam] == "repetitive"
    assert rows[blocked] == "lang_blocked"
    assert rows[_CLEAN] is None


def test_no_language_cut_by_default(spark):
    rows = _reasons(spark, [_CLEAN + " α"])  # langs=None
    assert rows[_CLEAN + " α"] is None


def test_filter_corpus_partitions_input(spark):
    rows = [
        (0, _CLEAN, b"x"),
        (1, "tiny doc", b"y"),
        (2, ("the cat sat on a mat " * 10).strip(), b"z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, caption string, bytes binary")
    clean, rejected = filter_corpus(docs, text_col="caption")
    assert clean.columns == docs.columns  # schema untouched
    assert rejected.columns == docs.columns + ["reason"]
    kept = [r["doc_id"] for r in clean.collect()]
    dropped = {r["doc_id"]: r["reason"] for r in rejected.collect()}
    assert kept == [0]
    assert dropped == {1: "too_short", 2: "repetitive"}
    assert len(kept) + len(dropped) == docs.count()


def test_filter_plan_is_shuffle_and_python_free(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, _CLEAN) for i in range(32)], "doc_id long, caption string"
    ).write.parquet(p)
    clean, rejected = filter_corpus(
        spark.read.parquet(p), text_col="caption", allowed_langs=("en",)
    )
    for df in (clean, rejected):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
    assert clean.count() == 32 and rejected.count() == 0


def test_cli_filter(spark, tmp_path, monkeypatch, capsys):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        (0, _CLEAN),
        (1, "fragment"),
        (2, _CLEAN + " α"),
    ]
    spark.createDataFrame(rows, "doc_id long, caption string").write.parquet(inp)
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    rc = cli.main(
        ["filter", "--input", inp, "--out", out, "--langs", "en, de"]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "kept 1; rejected 2" in printed
    clean = spark.read.parquet(f"{out}/clean")
    assert [r["doc_id"] for r in clean.collect()] == [0]
    rej = {
        r["doc_id"]: r["reason"]
        for r in spark.read.parquet(f"{out}/rejected").collect()
    }
    assert rej == {1: "too_short", 2: "lang_blocked"}


def test_null_text_rejected_not_clean(spark):
    """A NULL caption must not slip through as clean (every signal is
    NULL; the explicit guard routes it too_short)."""
    docs = spark.createDataFrame(
        [(0, None), (1, _CLEAN)], "doc_id long, caption string"
    )
    clean, rejected = filter_corpus(docs, text_col="caption")
    assert [r["doc_id"] for r in clean.collect()] == [1]
    assert [(r["doc_id"], r["reason"]) for r in rejected.collect()] == [
        (0, "too_short")
    ]


def test_reason_column_collision_refused(spark):
    import pytest

    docs = spark.createDataFrame([(0, _CLEAN, "x")],
                                 "doc_id long, caption string, reason string")
    with pytest.raises(ValueError, match="collide"):
        filter_corpus(docs, text_col="caption")
