"""chunk_dedup (operators/textdedup.py): chunk-granularity exact
dedup — first-occurrence-wins semantics, rebuild fidelity, edge shapes
(empty docs, short docs, full collapse), and the no-Window plan
guarantee (the decision is a combinable min-struct aggregate)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dude_spark.operators.textdedup import chunk_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(out):
    return {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dedup_fp"]) for r in out.collect()}


def test_first_occurrence_wins_and_rebuild(spark):
    # w=2 chunks: doc 1 -> ["a b", "c d"]; doc 2 repeats "a b" then
    # adds "x y"; doc 3 is a full copy of doc 1
    docs = _docs(
        spark,
        [(1, "a b c d"), (2, "a b x y"), (3, "a b c d")],
    )
    got = _by_id(chunk_dedup(docs, chunk_tokens=2))
    assert got[1] == (2, 2, _md5("a b c d"))
    assert got[2] == (2, 1, _md5("x y"))
    assert got[3] == (2, 0, _md5(""))


def test_short_tail_chunk_is_its_own_unit(spark):
    # 5 tokens at w=2 -> chunks "a b", "c d", "e"; a later doc made of
    # just "e" dedups against the tail chunk
    docs = _docs(spark, [(1, "a b c d e"), (2, "e")])
    got = _by_id(chunk_dedup(docs, chunk_tokens=2))
    assert got[1] == (3, 3, _md5("a b c d e"))
    assert got[2] == (1, 0, _md5(""))


def test_empty_and_whitespace_docs_survive(spark):
    docs = _docs(spark, [(1, ""), (2, "   "), (3, "a b")])
    got = _by_id(chunk_dedup(docs, chunk_tokens=2))
    assert got[1] == (0, 0, _md5(""))
    assert got[2] == (0, 0, _md5(""))
    assert got[3] == (1, 1, _md5("a b"))


def test_order_is_document_order_not_chunk_order(spark):
    # kept chunks must rejoin in ORIGINAL position order even when
    # lexicographic chunk order differs
    docs = _docs(spark, [(1, "z z a a m m")])
    got = _by_id(chunk_dedup(docs, chunk_tokens=2))
    assert got[1] == (3, 3, _md5("z z a a m m"))


def test_append_stability(spark):
    """Adding NEW docs never changes an existing doc's output (the
    min-(doc_id, idx) keeper is append-stable for smaller ids) —
    the property that lets the operator run incrementally."""
    base = [(1, "a b c d"), (2, "a b x y")]
    more = base + [(9, "a b c d x y q r")]
    out1 = _by_id(chunk_dedup(_docs(spark, base), chunk_tokens=2))
    out2 = _by_id(chunk_dedup(_docs(spark, more), chunk_tokens=2))
    assert {k: out2[k] for k in out1} == out1
    assert out2[9] == (4, 1, _md5("q r"))


def test_no_window_in_plan(spark):
    """The keeper decision must be the combinable aggregate, not a
    per-chunk row_number window (the group_results lesson: a hot
    chunk with 10^8 occurrences would serialize through one task)."""
    docs = _docs(spark, [(i, "a b c d") for i in range(20)])
    plan = chunk_dedup(docs, chunk_tokens=2)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
