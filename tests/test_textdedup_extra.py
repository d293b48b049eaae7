"""containment_pairs + dedup_lines — brute-force equality, contract
edges, and plan shape (zero-shuffle for the in-row line dedup)."""

from __future__ import annotations

import hashlib

from dude_spark.operators.textdedup import (
    containment_pairs,
    dedup_lines,
    ngram_jaccard_pairs,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestDedupLines:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in dedup_lines(df).collect()}

    def test_first_occurrence_kept_order_preserved(self, spark):
        got = self._run(spark, [(1, "a\nb\na\nc\nb\na")])
        r = got[1]
        assert (r["n_lines"], r["n_kept"]) == (6, 3)
        assert r["dedup_fp"] == _md5("a\nb\nc")

    def test_no_dups_is_identity(self, spark):
        got = self._run(spark, [(1, "x\ny\nz")])
        assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 3)
        assert got[1]["dedup_fp"] == _md5("x\ny\nz")

    def test_null_and_empty_text(self, spark):
        got = self._run(spark, [(1, None), (2, "")])
        assert (got[1]["n_lines"], got[1]["n_kept"]) == (0, 0)
        assert got[1]["dedup_fp"] == _md5("")
        # empty text is ONE empty line, kept
        assert (got[2]["n_lines"], got[2]["n_kept"]) == (1, 1)
        assert got[2]["dedup_fp"] == _md5("")

    def test_repeated_empty_lines_collapse(self, spark):
        # paragraph-gap normalization: blank lines dedup like any line
        got = self._run(spark, [(1, "a\n\nb\n\nc")])
        assert (got[1]["n_lines"], got[1]["n_kept"]) == (5, 4)
        assert got[1]["dedup_fp"] == _md5("a\n\nb\nc")

    def test_custom_separator_is_literal_not_regex(self, spark):
        df = spark.createDataFrame([(1, "a|b|a")], "doc_id long, text string")
        r = dedup_lines(df, sep="|").collect()[0]
        assert (r["n_lines"], r["n_kept"]) == (3, 2)
        assert r["dedup_fp"] == _md5("a|b")

    def test_zero_shuffle_pure_codegen_plan(self, spark):
        df = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
        plan = _plan(dedup_lines(df))
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestContainmentPairs:
    def _docs(self, spark):
        # doc 2 is doc 1's first sentence verbatim (high containment
        # 2->1, low jaccard); docs 3/4 are mutual near-copies; doc 5
        # shares nothing
        rows = [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "the quick brown fox jumps over"),
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
            (4, "alpha beta gamma delta epsilon zeta eta iota"),
            (5, "completely different words with zero overlap whatsoever here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _grams(text: str, n: int = 3) -> set[str]:
        t = text.split()
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    def test_brute_force_equality(self, spark):
        docs = self._docs(spark)
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        num, den = 6, 10
        want = set()
        for sid, stext in rows:
            for did, dtext in rows:
                if sid == did:
                    continue
                sg, dg = self._grams(stext), self._grams(dtext)
                if sg and len(sg & dg) * den >= num * len(sg):
                    want.add((sid, did, len(sg & dg), len(sg)))
        got = {
            tuple(r)
            for r in containment_pairs(
                docs, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == want and want  # non-vacuous

    def test_asymmetric_quote_found_where_jaccard_misses(self, spark):
        docs = self._docs(spark)
        cont = {
            (r["src"], r["dst"])
            for r in containment_pairs(docs, threshold_num=9, threshold_den=10).collect()
        }
        assert (2, 1) in cont  # the quote IS contained
        assert (1, 2) not in cont  # but not the other way round
        jac = {
            (r["a"], r["b"])
            for r in ngram_jaccard_pairs(docs, threshold_num=5, threshold_den=10).collect()
        }
        assert (1, 2) not in jac and (2, 1) not in jac  # jaccard blind to it

    def test_mutual_containment_emits_both_directions(self, spark):
        docs = self._docs(spark)
        got = {
            (r["src"], r["dst"])
            for r in containment_pairs(docs, threshold_num=5, threshold_den=10).collect()
        }
        assert (3, 4) in got and (4, 3) in got

    def test_max_gram_df_cut_recorded_and_applied(self, spark):
        # one gram planted in every doc: df=5 > 1 -> cut
        rows = [(i, f"common shared gram unique{i} tail{i} word{i}") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = containment_pairs(docs, threshold_num=1, threshold_den=100, max_gram_df=1)
        pairs = out.collect()
        assert out.dropped_grams == 1
        assert pairs == []  # the only shared gram was the hot one


def test_dedup_lines_seeded_random_brute_force(spark):
    """200 seeded random line-lists (empty lines, dups, singletons)
    must match a Python first-occurrence reference exactly — one
    Spark job, adversarial beyond the fixture corpus."""
    import random

    rng = random.Random(42)
    vocab = ["", "a", "b", "nav bar", "x y z", "header", "©", "line  two"]
    rows = []
    for i in range(200):
        lines = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
        rows.append((i, "\n".join(lines) if lines else ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    for i, text in rows:
        lines = text.split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        r = got[i]
        assert r["n_lines"] == len(lines), (i, text)
        assert r["n_kept"] == len(kept), (i, text)
        assert r["dedup_fp"] == _md5("\n".join(kept)), (i, text)


def test_containment_seeded_random_brute_force(spark):
    """40 seeded random docs over a tiny vocabulary (lots of shared
    grams) vs the literal ordered-pair definition."""
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    num, den = 5, 10

    def grams(t):
        w = t.split()
        return {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}

    want = set()
    for sid, s in rows:
        for did, d in rows:
            if sid == did:
                continue
            sg, dg = grams(s), grams(d)
            if sg and len(sg & dg) * den >= num * len(sg):
                want.add((sid, did, len(sg & dg), len(sg)))
    got = {
        tuple(r)
        for r in containment_pairs(df, threshold_num=num, threshold_den=den).collect()
    }
    assert got == want and len(want) > 10  # non-vacuous (18 at this seed)
