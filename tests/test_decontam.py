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
