"""Text-corpus sources: JSONL / CSV / parquet with skip-and-count.

LLM corpora interchange as JSON-lines and CSV at least as often as
parquet; this module reads any of the three into the engine's
documents shape with the reference's error-tolerance contract
(files.go:59-70 — a bad entry skips, the run never fails, and the
skip is COUNTED): malformed lines come back as a separate bad-rows
table with the raw line preserved, never silently dropped.

Mechanism: Spark's native json/csv readers in PERMISSIVE mode with
``columnNameOfCorruptRecord`` — a row that fails to parse lands with
the raw text in the corrupt column and nulls elsewhere.  Splitting on
that column gives (docs, bad) as two plain filters over one scan: no
UDF, no second pass, executor-parallel line splitting for free (both
sources are splittable when uncompressed).  Spark caveat handled
inside: a corrupt-record filter requires the parsed frame to be
materializable — the reader needs the corrupt column SELECTED, and
referencing it alone in a filter is unsupported until it is cached or
projected; we project it into the output schema, which satisfies the
requirement without a cache.

Scale: the readers are ordinary FileScan sources — partition-parallel,
column-pruned (for parquet), and the corrupt split is codegen'd.  A
10^12-line JSONL corpus reads exactly as wide as this function's
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "__corrupt"

FORMATS = ("jsonl", "csv", "parquet")


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(docs, bad): ``docs`` is (doc_id string, text string) parsed
    from ``path``; ``bad`` is (raw string) — every line that failed to
    parse or lacked the id/text fields, preserved verbatim for audit.

    parquet inputs have no line-level corruption concept (footer-level
    corruption fails the scan, correctly); ``bad`` is rows with a null
    id or text.
    """
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if fmt == "parquet":
        raw = spark.read.parquet(path).select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(text_col).cast("string").alias("text"),
        )
        docs = raw.where(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull()
        )
        bad = raw.where(
            F.col("doc_id").isNull() | F.col("text").isNull()
        ).select(F.to_json(F.struct("doc_id", "text")).alias("raw"))
        return docs, bad

    if fmt == "jsonl":
        # JSON matches fields BY NAME, so a fixed contract schema is
        # safe: extra fields are ignored, order is irrelevant
        schema = f"{id_col} string, {text_col} string, {_CORRUPT} string"
        raw = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .json(path)
        )
    else:
        # CSV matches a user schema BY POSITION (enforceSchema), so a
        # contract-only schema silently swaps reordered columns and
        # flags every row of a wider file corrupt.  Sniff the actual
        # header first (schema-only read — touches header lines, not
        # data), parse with the FILE's layout, then project the
        # contract columns by name.
        file_cols = [
            f.name for f in spark.read.option("header", True).csv(path).schema
        ]
        missing = {id_col, text_col} - set(file_cols)
        if missing:
            raise ValueError(
                f"CSV header at {path!r} lacks contract column(s) "
                f"{sorted(missing)}; found {file_cols}"
            )
        schema = ", ".join(
            [f"`{c}` string" for c in file_cols] + [f"{_CORRUPT} string"]
        )
        # multiLine: quoted embedded newlines are valid CSV and must
        # round-trip — the cost is that multiLine CSV files are not
        # SPLITTABLE (one file = one read task).  JSONL is the scale
        # path (JSON escapes newlines in-string, so the file splits by
        # physical line); CSV is supported for interchange correctness.
        raw = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .option("header", True)
            .option("multiLine", True)
            .csv(path)
        )
    parsed = raw.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
        F.col(_CORRUPT).alias("raw"),
    )
    # a record is bad when the parser flagged it OR when it parsed but
    # is missing the contract fields (e.g. a JSON object without 'text')
    is_bad = (
        F.col("raw").isNotNull()
        | F.col("doc_id").isNull()
        | F.col("text").isNull()
    )
    docs = parsed.where(~is_bad).select("doc_id", "text")
    bad = parsed.where(is_bad).select(
        F.coalesce(
            F.col("raw"), F.to_json(F.struct("doc_id", "text"))
        ).alias("raw")
    )
    return docs, bad


def write_corpus(
    docs: DataFrame, path: str, fmt: str = "jsonl", mode: str = "overwrite"
) -> None:
    """Export a corpus in the same interchange formats read_corpus
    accepts — the curation chain's hand-off to external consumers.
    Partition-parallel (one file per partition, like every Spark
    sink); read_corpus(write_corpus(df)) round-trips losslessly for
    the (doc_id, text) contract columns, gated in tests.  CSV is
    header+quoted so embedded commas/newlines survive."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    writer = docs.write.mode(mode)
    if fmt == "jsonl":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", True).option("quoteAll", True).csv(path)
    else:
        writer.parquet(path)
