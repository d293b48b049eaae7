"""Edge-case gates for functions/text.quality_signals (the bulk of the
text surface is oracle-gated end-to-end in test_entry_oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dude_spark.functions.text import (
    QUALITY_MIN_STOP_X1000,
    QUALITY_MIN_TOKENS,
    quality_signals,
)


def _score(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    cols = quality_signals(F.col("text"))
    out = df.select("text", *[c.alias(n) for n, c in cols]).collect()
    return {r["text"]: r for r in out}

def test_quality_signals_edge_cases(spark):
    ok_text = "the cat sat on the mat and looked to a bird of prey in town " * 2
    rows = _score(
        spark,
        ["", "   ", "one two three", ok_text,
         "alpha beta gamma delta " * 10],
    )
    # empty/blank: zero tokens, zero ratios, too_short (cascade order)
    for t in ("", "   "):
        r = rows[t]
        assert (r["n_tokens"], r["stop_x1000"], r["mwl_x10"]) == (0, 0, 0)
        assert r["quality"] == "too_short"
    assert rows["one two three"]["quality"] == "too_short"
    r = rows[ok_text]
    assert r["n_tokens"] >= QUALITY_MIN_TOKENS
    assert r["stop_x1000"] >= QUALITY_MIN_STOP_X1000
    assert r["quality"] == "ok"
    assert rows["alpha beta gamma delta " * 10]["quality"] == "low_stopword"
