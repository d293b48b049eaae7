"""Benchmark decontamination (operators/decontam.py): planted
contamination is found exactly, clean corpora pass untouched, and the
brute-force cross 32-gram join is reproduced bit-for-bit."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dude_spark.config import SuffixConfig
from dude_spark.operators.decontam import contamination_pairs, decontaminate

CFG = SuffixConfig(min_match_len=32)


def _df(spark, rows):
    return spark.createDataFrame(rows, "image_id string, caption string")


def _rand_text(rng, n_words=60):
    words = [f"w{rng.randrange(4000)}" for _ in range(n_words)]
    return " ".join(words)


def test_planted_contamination_found(spark):
    rng = random.Random(7)
    corpus_rows = [(str(i), _rand_text(rng)) for i in range(40)]
    # benchmark doc 0 is a verbatim 80-char slice of corpus doc 17;
    # benchmark doc 1 is unrelated text
    slice17 = corpus_rows[17][1][10:90]
    assert len(slice17) == 80
    bench_rows = [("b0", slice17), ("b1", _rand_text(rng))]
    out = contamination_pairs(_df(spark, corpus_rows), _df(spark, bench_rows), CFG)
    pairs = {(r["doc_id"], r["bench_id"]) for r in out.collect()}
    assert ("17", "b0") in pairs
    assert all(b != "b1" for _, b in pairs)


def test_clean_corpus_untouched(spark):
    rng = random.Random(11)
    corpus_rows = [(str(i), _rand_text(rng)) for i in range(30)]
    # disjoint vocabulary — no 32-char overlap possible
    bench_rows = [("b0", " ".join(f"z{i}" for i in range(200)))]
    corpus = _df(spark, corpus_rows)
    clean, flagged = decontaminate(corpus, _df(spark, bench_rows), CFG)
    assert flagged.count() == 0
    assert clean.count() == corpus.count()


def test_decontaminate_removes_exactly_flagged(spark):
    rng = random.Random(13)
    corpus_rows = [(str(i), _rand_text(rng)) for i in range(30)]
    # two bench docs hitting corpus docs 3 and 9; doc 3 hit twice
    bench_rows = [
        ("b0", corpus_rows[3][1][:80]),
        ("b1", corpus_rows[3][1][40:120]),
        ("b2", corpus_rows[9][1][20:100]),
    ]
    corpus = _df(spark, corpus_rows)
    clean, flagged = decontaminate(corpus, _df(spark, bench_rows), CFG)
    fl = {r["doc_id"]: r["n_bench_hits"] for r in flagged.collect()}
    assert fl["3"] == 2 and fl["9"] == 1
    kept = {r["image_id"] for r in clean.select("image_id").collect()}
    assert kept == {str(i) for i in range(30)} - set(fl)


def test_matches_bruteforce_cross_gram_join(spark):
    """Winnowing-recall + exact-L-gram-verify == brute-force shared
    32-gram cross join (the same theorem the driver oracle relies on),
    on a fixture with planted overlaps, short docs, and unicode."""
    rng = random.Random(17)
    corpus_rows = [(str(i), _rand_text(rng, 40)) for i in range(25)]
    corpus_rows.append(("25", "short"))  # < L: can never be contaminated
    corpus_rows.append(("26", "αβγδ " * 30))  # unicode, char semantics
    bench_rows = [
        ("b0", corpus_rows[5][1][5:90]),
        ("b1", "αβγδ " * 20),
        ("b2", _rand_text(rng, 40)),
        ("b3", "tiny"),  # < L benchmark text: no grams
    ]
    corpus, bench = _df(spark, corpus_rows), _df(spark, bench_rows)
    got = {
        (r["doc_id"], r["bench_id"])
        for r in contamination_pairs(corpus, bench, CFG).collect()
    }
    L = CFG.min_match_len
    grams = lambda t: {t[i : i + L] for i in range(len(t) - L + 1)}
    want = {
        (cid, bid)
        for cid, ct in corpus_rows
        for bid, bt in bench_rows
        if grams(ct) & grams(bt)
    }
    assert got == want
    assert ("26", "b1") in want  # the unicode overlap is a live case


def test_contamination_scores_bruteforce(spark):
    """(n_grams, n_hits, contam_x1000) == the Python distinct-gram
    recount: a verbatim-contained doc scores 1000, a disjoint doc 0, a
    doc below gram_len is ABSENT, and repeated grams inside one doc
    count once (the array_distinct contract)."""
    rng = random.Random(23)
    L = 8
    corpus_rows = [(str(i), _rand_text(rng, 12)) for i in range(12)]
    corpus_rows.append(("12", "xyzw"))  # < L: no grams, absent
    corpus_rows.append(("13", "abcdefgh" * 6))  # heavy repeated grams
    bench_rows = [
        ("b0", corpus_rows[4][1]),          # doc 4 fully contained
        ("b1", corpus_rows[7][1][3:40]),    # doc 7 partially contained
        ("b2", "abcdefgh" * 3),             # covers doc 13's gram cycle
    ]
    corpus, bench = _df(spark, corpus_rows), _df(spark, bench_rows)
    from dude_spark.operators.decontam import contamination_scores

    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contam_x1000"])
        for r in contamination_scores(corpus, bench, gram_len=L).collect()
    }
    bgrams = set()
    for _, bt in bench_rows:
        bgrams |= {bt[i : i + L] for i in range(len(bt) - L + 1)}
    want = {}
    for cid, ct in corpus_rows:
        grams = {ct[i : i + L] for i in range(len(ct) - L + 1)}
        if not grams:
            continue
        hits = len(grams & bgrams)
        want[cid] = (len(grams), hits, hits * 1000 // len(grams))
    assert got == want
    assert "12" not in got                      # sub-gram doc absent
    assert got["4"][2] == 1000                  # verbatim containment
    assert got["13"][0] == 8                    # cycle: 8 distinct grams
    assert got["13"][2] == 1000
    assert any(v[2] == 0 for v in got.values())  # disjoint docs score 0
    assert any(0 < v[2] < 1000 for v in got.values())  # partial overlap


def test_contamination_scores_plan_broadcasts_benchmark(spark):
    """The benchmark gram set rides a broadcast join — the corpus side
    must never sort-merge-shuffle its exploded grams (the operator's
    whole scale contract)."""
    rng = random.Random(5)
    corpus = _df(spark, [(str(i), _rand_text(rng, 30)) for i in range(20)])
    bench = _df(spark, [("b0", _rand_text(rng, 30))])
    from dude_spark.operators.decontam import contamination_scores

    plan = (
        contamination_scores(corpus, bench, gram_len=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


class TestNoveltyScores:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "image_id string, caption string")

    def test_verbatim_zero_fresh_thousand_mixed_between(self, spark):
        from dude_spark.operators.decontam import novelty_scores

        base = "the quick brown fox jumps over the lazy sleeping dog today"
        ref = self._df(spark, [("r1", base), ("r2", base + " again and again")])
        new = self._df(spark, [
            ("n1", base),                                     # verbatim
            ("n2", "qqfresh utterly novel text never seen in reference"),
            ("n3", base + " with a novel unique closing tail here"),
        ])
        got = {r["doc_id"]: r for r in novelty_scores(new, ref).collect()}
        assert got["n1"]["novel_x1000"] == 0
        assert got["n2"]["novel_x1000"] == 1000
        assert 0 < got["n3"]["novel_x1000"] < 1000
        assert got["n3"]["n_grams"] > got["n3"]["novel"] > 0

    def test_short_docs_absent_and_validation(self, spark):
        import pytest

        from dude_spark.operators.decontam import novelty_scores

        ref = self._df(spark, [("r", "x" * 64)])
        new = self._df(spark, [("s", "too short"), ("l", "y" * 64)])
        got = [r["doc_id"] for r in novelty_scores(new, ref).collect()]
        assert got == ["l"]
        with pytest.raises(ValueError, match="gram_len"):
            novelty_scores(new, ref, gram_len=0)

    def test_brute_force_seeded(self, spark):
        import random

        from dude_spark.operators.decontam import novelty_scores

        rng = random.Random(7)
        alpha = "abcdef "
        mk = lambda n: "".join(rng.choice(alpha) for _ in range(n))
        ref_rows = [(f"r{i}", mk(80)) for i in range(10)]
        new_rows = [(f"n{i}", mk(70)) for i in range(10)]
        G = 8
        got = {
            r["doc_id"]: (r["n_grams"], r["novel"], r["novel_x1000"])
            for r in novelty_scores(
                self._df(spark, new_rows), self._df(spark, ref_rows), G
            ).collect()
        }
        ref_grams = {
            t[i: i + G]
            for _, t in ref_rows
            for i in range(len(t) - G + 1)
        }
        want = {}
        for d, t in new_rows:
            grams = {t[i: i + G] for i in range(len(t) - G + 1)}
            nov = sum(1 for g in grams if g not in ref_grams)
            want[d] = (len(grams), nov, nov * 1000 // len(grams))
        assert got == want

    def test_novelty_monotone_in_reference(self, spark):
        """Growing the reference can only LOWER each doc's novelty —
        the invariant that makes the score stable triage as a corpus
        accumulates (a bigger reference never makes a crawl look
        newer)."""
        import random

        from dude_spark.operators.decontam import novelty_scores

        rng = random.Random(99)
        mk = lambda n: "".join(rng.choice("abcde ") for _ in range(n))
        new = self._df(spark, [(f"n{i}", mk(60)) for i in range(8)])
        small_rows = [(f"r{i}", mk(60)) for i in range(4)]
        big_rows = small_rows + [(f"r{i+10}", mk(60)) for i in range(6)]
        lo = {
            r["doc_id"]: r["novel"]
            for r in novelty_scores(new, self._df(spark, big_rows), 6).collect()
        }
        hi = {
            r["doc_id"]: r["novel"]
            for r in novelty_scores(new, self._df(spark, small_rows), 6).collect()
        }
        assert set(lo) == set(hi)
        assert all(lo[d] <= hi[d] for d in hi)
