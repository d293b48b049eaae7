"""sources/corpus.py — JSONL/CSV/parquet corpus readers with the
skip-and-count contract (bad lines audited, never silently dropped,
never failing the run)."""

from __future__ import annotations

import pytest

from dude_spark.sources.corpus import read_corpus


def test_jsonl_skip_and_count(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text(
        '{"doc_id": "a", "text": "hello world"}\n'
        "{this is not json at all\n"
        '{"doc_id": "b", "text": "second doc"}\n'
        '{"doc_id": "c"}\n'  # parses but violates the contract: no text
        '{"doc_id": "d", "text": "third"}\n'
    )
    docs, bad = read_corpus(spark, str(p), fmt="jsonl")
    got = {(r["doc_id"], r["text"]) for r in docs.collect()}
    assert got == {("a", "hello world"), ("b", "second doc"), ("d", "third")}
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)  # raw line preserved
    assert any('"doc_id":"c"' in r.replace(" ", "") for r in raws)


def test_csv_skip_and_count(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text(
        "doc_id,text\n"
        "a,hello world\n"
        "b,\n"  # empty text -> contract violation
        "c,fine row\n"
    )
    docs, bad = read_corpus(spark, str(p), fmt="csv")
    got = {(r["doc_id"], r["text"]) for r in docs.collect()}
    assert got == {("a", "hello world"), ("c", "fine row")}
    assert bad.count() == 1


def test_csv_extra_and_reordered_columns(spark, tmp_path):
    """Real-world CSVs carry extra columns in arbitrary order; the
    reader must match the contract columns BY NAME (a positional
    contract-only schema silently swapped reordered columns and
    flagged every row of a wider file corrupt)."""
    p = tmp_path / "wide.csv"
    p.write_text(
        "lang,text,doc_id\n"
        "en,hello world,a\n"
        "de,second doc,b\n"
    )
    docs, bad = read_corpus(spark, str(p), fmt="csv")
    assert {(r["doc_id"], r["text"]) for r in docs.collect()} == {
        ("a", "hello world"), ("b", "second doc"),
    }
    assert bad.count() == 0
    # a header lacking a contract column is a configuration error,
    # not a per-row skip: fail loudly
    p2 = tmp_path / "noid.csv"
    p2.write_text("lang,text\nen,hello\n")
    with pytest.raises(ValueError, match="doc_id"):
        read_corpus(spark, str(p2), fmt="csv")


def test_parquet_and_validation(spark, tmp_path):
    p = str(tmp_path / "c.parquet")
    spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "gamma")], "doc_id long, text string"
    ).write.parquet(p)
    docs, bad = read_corpus(spark, p, fmt="parquet")
    assert {(r["doc_id"], r["text"]) for r in docs.collect()} == {
        ("1", "alpha"), ("3", "gamma"),
    }
    assert bad.count() == 1
    with pytest.raises(ValueError, match="fmt"):
        read_corpus(spark, p, fmt="xml")


def test_jsonl_feeds_the_engine(spark, tmp_path):
    """The parsed frame drops straight into the text operators."""
    from dude_spark.operators.textdedup import ngram_jaccard_pairs

    p = tmp_path / "c.jsonl"
    base = " ".join(f"tok{i}" for i in range(30))
    p.write_text(
        f'{{"doc_id": "1", "text": "{base}"}}\n'
        f'{{"doc_id": "2", "text": "{base} extra"}}\n'
        f'{{"doc_id": "3", "text": "completely different words here"}}\n'
    )
    docs, _ = read_corpus(spark, str(p), fmt="jsonl")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text")
    assert [(r["a"], r["b"]) for r in pairs.collect()] == [("1", "2")]


def test_write_read_roundtrip_all_formats(spark, tmp_path):
    """write_corpus -> read_corpus is lossless for the contract
    columns, including embedded commas, quotes, and newlines."""
    from dude_spark.sources.corpus import write_corpus

    rows = [
        ("1", "plain text"),
        ("2", 'with "quotes" and, commas'),
        ("3", "with\nan embedded newline"),
        ("4", "unicode: αβγ 中文"),
    ]
    src = spark.createDataFrame(rows, "doc_id string, text string")
    for fmt in ("jsonl", "csv", "parquet"):
        out = str(tmp_path / fmt)
        write_corpus(src, out, fmt=fmt)
        back, bad = read_corpus(spark, out, fmt=fmt)
        assert bad.count() == 0, fmt
        assert sorted(map(tuple, back.collect())) == sorted(rows), fmt
    import pytest

    with pytest.raises(ValueError, match="fmt"):
        write_corpus(src, str(tmp_path / "x"), fmt="xml")
