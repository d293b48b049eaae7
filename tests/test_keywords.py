"""TF-IDF top terms + rare-term ratio (operators/keywords.py)."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from dude_spark.operators.keywords import rare_term_ratio, tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _brute_tfidf(rows, k):
    """Python reference: rational tf-idf with (score DESC, term ASC)."""
    tf: dict[str, Counter] = {}
    for doc_id, text in rows:
        toks = (text or "").strip().lower().split()
        if toks:
            tf[doc_id] = Counter(toks)
    df = Counter(t for c in tf.values() for t in c)
    n_docs = len(tf)
    want = set()
    for doc_id, c in tf.items():
        scored = [
            (t, n, df[t], n * (n_docs * 1000 // df[t])) for t, n in c.items()
        ]
        scored.sort(key=lambda x: (-x[3], x[0]))
        for rank, (t, n, d, s) in enumerate(scored[:k], start=1):
            want.add((doc_id, t, n, d, s, rank))
    return want


class TestTfidfTopk:
    def test_matches_brute_force_seeded(self, spark):
        rng = random.Random(1234)
        vocab = [f"w{i}" for i in range(40)]
        rows = [
            (f"d{i}", " ".join(rng.choices(vocab, k=rng.randrange(0, 30))))
            for i in range(60)
        ]
        out = tfidf_topk(_docs(spark, rows), k=4)
        got = {tuple(r) for r in out.collect()}
        assert got == _brute_tfidf(rows, 4)

    def test_tie_break_on_term_asc(self, spark):
        # every term tf=1 df=1 → all scores equal → rank by term asc
        rows = [("d1", "zeta alpha mid beta")]
        out = tfidf_topk(_docs(spark, rows), k=3).orderBy("rank").collect()
        assert [r["term"] for r in out] == ["alpha", "beta", "mid"]
        assert [r["rank"] for r in out] == [1, 2, 3]

    def test_stopword_sinks_distinctive_rises(self, spark):
        rows = [(f"d{i}", f"the the the unique{i}") for i in range(10)]
        out = tfidf_topk(_docs(spark, rows), k=1).collect()
        # "the" has df=10 (idf 1000), tf=3 → 3000;
        # "unique{i}" has df=1 (idf 10000), tf=1 → 10000: it wins
        assert all(r["term"].startswith("unique") for r in out)
        assert all(r["score"] == 10000 for r in out)

    def test_blank_and_null_docs_absent(self, spark):
        rows = [("d1", "hello world"), ("d2", "   "), ("d3", None)]
        out = tfidf_topk(_docs(spark, rows), k=5)
        assert {r["doc_id"] for r in out.collect()} == {"d1"}

    def test_case_folding(self, spark):
        rows = [("d1", "Apple APPLE apple"), ("d2", "apple pie")]
        out = tfidf_topk(_docs(spark, rows), k=1).collect()
        by_doc = {r["doc_id"]: r for r in out}
        assert by_doc["d1"]["term"] == "apple" and by_doc["d1"]["tf"] == 3
        assert by_doc["d1"]["df"] == 2

    def test_no_window_in_plan(self, spark):
        plan = (
            tfidf_topk(_docs(spark, [("d1", "a b")]), k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan

    def test_k_validation(self, spark):
        with pytest.raises(ValueError, match="k must be positive"):
            tfidf_topk(_docs(spark, [("d1", "a")]), k=0)


class TestRareTermRatio:
    def test_planted_gibberish_vs_prose(self, spark):
        common = "the quick brown fox jumps over the lazy dog"
        rows = [(f"d{i}", common) for i in range(5)]
        rows.append(("junk", "qzxv jkwpf mmzrt qzxv"))
        out = {r["doc_id"]: r for r in rare_term_ratio(_docs(spark, rows)).collect()}
        assert out["junk"]["rare_x1000"] == 1000
        assert out["junk"]["n_tokens"] == 4 and out["junk"]["n_terms"] == 3
        for i in range(5):
            assert out[f"d{i}"]["rare_x1000"] == 0

    def test_brute_force_seeded(self, spark):
        rng = random.Random(77)
        vocab = [f"t{i}" for i in range(25)]
        rows = [
            (f"d{i}", " ".join(rng.choices(vocab, k=rng.randrange(1, 15))))
            for i in range(40)
        ]
        got = {
            tuple(r) for r in rare_term_ratio(_docs(spark, rows), max_df=2).collect()
        }
        tf = {}
        for doc_id, text in rows:
            toks = text.strip().lower().split()
            if toks:
                tf[doc_id] = Counter(toks)
        df = Counter(t for c in tf.values() for t in c)
        want = set()
        for doc_id, c in tf.items():
            n_tok = sum(c.values())
            rare = sum(n for t, n in c.items() if df[t] <= 2)
            want.add((doc_id, n_tok, len(c), rare * 1000 // n_tok))
        assert got == want

    def test_max_df_validation(self, spark):
        with pytest.raises(ValueError, match="max_df"):
            rare_term_ratio(_docs(spark, [("d1", "a")]), max_df=0)

    def test_rare_ratio_monotone_under_corpus_append(self, spark):
        """Appending documents can only raise term dfs, so an existing
        doc's rare share never INCREASES — re-scoring after ingest
        moves every doc one-directionally (the weighted_sample
        monotonicity convention, applied to the hapax signal)."""
        import random

        rng = random.Random(5)
        vocab = [f"w{i}" for i in range(30)]
        base = [
            (f"d{i}", " ".join(rng.choices(vocab, k=rng.randrange(3, 12))))
            for i in range(25)
        ]
        extra = base + [
            (f"x{i}", " ".join(rng.choices(vocab, k=rng.randrange(3, 12))))
            for i in range(15)
        ]
        before = {
            r["doc_id"]: r["rare_x1000"]
            for r in rare_term_ratio(_docs(spark, base)).collect()
        }
        after = {
            r["doc_id"]: r["rare_x1000"]
            for r in rare_term_ratio(_docs(spark, extra)).collect()
            if r["doc_id"].startswith("d")
        }
        assert set(after) == set(before)
        assert all(after[d] <= before[d] for d in before)
