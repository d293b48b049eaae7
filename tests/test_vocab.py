"""operators/vocab.py — corpus-adaptive vocabulary coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dude_spark.operators.vocab import top_vocab, vocab_coverage


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),          # 6 toks: the x2
        (2, "THE  Dog   and the cat"),          # case + runs of spaces
        (3, "zz qq zz zz"),                     # rare-token-heavy
        (4, "   "),                             # whitespace-only: dropped
        (5, ""),                                # empty: dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_top_vocab_counts_and_boundary_tie(spark, docs):
    got = {r["token"]: r["cnt"] for r in top_vocab(docs, k=100).collect()}
    assert got["the"] == 4 and got["cat"] == 2 and got["zz"] == 3
    assert "" not in got  # no empty token from whitespace-only docs
    # counts: the=4, zz=3, cat=2, then six 1-count tokens
    top3 = {r["token"] for r in top_vocab(docs, k=3).collect()}
    assert top3 == {"the", "zz", "cat"}
    # k=4: the 1-count tie ('and','dog','mat','on','qq','sat') breaks
    # on token ASC -> 'and'
    top4 = {r["token"] for r in top_vocab(docs, k=4).collect()}
    assert top4 == {"the", "zz", "cat", "and"}


def test_vocab_coverage_exact_fractions(spark, docs):
    # vocab = top-2 = {the, zz}
    got = {
        r["doc_id"]: (r["n_tokens"], r["in_vocab"], r["cov_x1000"])
        for r in vocab_coverage(docs, k=2).collect()
    }
    assert got == {
        1: (6, 2, 333),   # the x2 of 6
        2: (5, 2, 400),   # the x2 of 5 (case-folded)
        3: (4, 3, 750),   # zz x3 of 4
    }  # docs 4/5 have no tokens: no row


def test_vocab_coverage_external_vocab_cross_corpus(spark, docs):
    ref = spark.createDataFrame([("cat",), ("dog",)], "token string")
    got = {
        r["doc_id"]: r["in_vocab"]
        for r in vocab_coverage(docs, vocab=ref).collect()
    }
    assert got == {1: 1, 2: 2, 3: 0}


def test_vocab_coverage_plan_broadcasts_and_takeordered(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7)).alias("text"),
    )
    df = vocab_coverage(docs, k=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ≤k vocab side must broadcast (hot tokens make a shuffled
    # join skew-bound), and the top-K must be TakeOrdered, never a
    # global Sort over the token counts
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_vocab_coverage_repartition_stable(spark):
    """Coverage is a pure function of the corpus: repartitioning must
    not move the top-K boundary or any per-doc count (deterministic
    tie-breaks, no partition-order dependence)."""
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("w"), (F.col("id") % 23)),
            F.concat(F.lit("w"), (F.col("id") % 7)),
            F.concat(F.lit("w"), (F.col("id") % 3)),
        ).alias("text"),
    )
    a = {tuple(r) for r in vocab_coverage(docs, k=5).collect()}
    b = {tuple(r) for r in vocab_coverage(docs.repartition(7), k=5).collect()}
    assert a == b and len(a) == 300
