"""Corpus quality filtering — the curation stage between dedup /
decontamination and shard writing.

An LLM training corpus drops documents for a REASON, and the reason is
part of the pipeline's audit surface (the same no-silent-removal rule
as decontaminate's flagged table and the candidates over-cap records):
``filter_corpus`` returns the clean corpus AND a rejected table tagging
every dropped row with the first matching rejection reason:

  too_short     n_tokens < QUALITY_MIN_TOKENS          (fragment)
  low_stopword  stopword per-mille < QUALITY_MIN_STOP  (keyword spam)
  repetitive    top-2-gram / dup-5-gram char coverage over the
                REP_*_MAX_X1000 cuts                   (loop junk)
  lang_blocked  lang_id(text) not in allowed_langs     (optional)

The cascade is FIRST-MATCH, same contract as quality_signals/lang_id:
a too-short doc reports too_short even if it is also repetitive, so
reason counts are a partition of the rejected set.

Scale shape: every signal is a pure JVM Column expression
(functions/text.py — quality, repetition fold, language cascade), so
both outputs are plain codegen'd filters over the scan with ZERO
shuffle and zero Python.  Writing both outputs re-evaluates the scan
twice; at 10^12 rows that is two cheap map-only passes (or persist the
tagged frame once if the storage tier makes scans expensive — the
operator takes no position, it just never shuffles).

Reference analogue: none in DuDe (files are never content-filtered);
thresholds follow the Gopher data-quality cuts (Rae et al. 2021
§A.1.1), integerized in functions/text.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_signals, repetition_signals


def rejection_reason(
    text: Column, allowed_langs: Sequence[str] | None = None
) -> Column:
    """First-match rejection reason, or NULL for a clean document.

    NULL text is rejected as too_short explicitly: without the guard
    every signal evaluates to NULL and the cascade would fall through
    to clean — the one document that must never reach the training
    corpus silently would.
    """
    quality = dict(quality_signals(text))["quality"]
    repetition = dict(repetition_signals(text))["repetition"]
    reason = (
        F.when(text.isNull(), F.lit("too_short"))
        .when(quality != "ok", quality)
        .when(repetition == "repetitive", F.lit("repetitive"))
    )
    if allowed_langs is not None:
        if not allowed_langs:
            raise ValueError(
                "allowed_langs must be None (no language cut) or name "
                "at least one language"
            )
        reason = reason.when(
            ~lang_id(text).isin(*allowed_langs), F.lit("lang_blocked")
        )
    return reason.otherwise(F.lit(None).cast("string"))


def filter_corpus(
    docs: DataFrame,
    text_col: str = "caption",
    allowed_langs: Sequence[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected): clean keeps the input schema unchanged;
    rejected is the dropped rows plus a ``reason`` column.  Together
    they partition the input (every row lands in exactly one)."""
    clash = {"__reason", "reason"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the rejected "
            "table's reason column; rename them first"
        )
    reason = rejection_reason(F.col(text_col), allowed_langs)
    tagged = docs.withColumn("__reason", reason)
    clean = tagged.where(F.col("__reason").isNull()).drop("__reason")
    rejected = tagged.where(F.col("__reason").isNotNull()).withColumnRenamed(
        "__reason", "reason"
    )
    return clean, rejected
