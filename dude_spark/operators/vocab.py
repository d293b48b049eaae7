"""Corpus-adaptive vocabulary coverage — the integer-exact stand-in
for perplexity-based quality filtering.

Fixed-list signals (``functions/text.quality_signals``' stopword
ratio) miss corpus-relative junk: OCR noise, mojibake, and generated
gibberish are exactly the documents whose tokens are RARE IN THIS
CORPUS.  The classic fix is a language-model perplexity filter
(CCNet-style, Wenzek et al. 2020); its cheap deterministic core is
"what fraction of a document's tokens fall in the corpus's own top-K
vocabulary" — a rank statistic, so it needs no log-space float
arithmetic (which would never hash bit-equal across engines) and no
model artifact.

Scale shape (the whole point at 10^12 rows):

* ``top_vocab`` — one explode → map-side-combinable token count →
  ``TakeOrderedAndProject`` for the (cnt DESC, token ASC) top-K.  No
  global sort; ties at the K boundary break on the token string, so
  the vocabulary is deterministic for a given corpus.
* ``vocab_coverage`` — explode → BROADCAST left join against the ≤K
  vocab rows (K is a constant, never data-sized) → one combinable
  per-doc aggregate.  The hot-token skew that would sink a shuffled
  join ("the" in every doc) is irrelevant under a broadcast.
* Integer contract: ``cov_x1000 = floor(in_vocab * 1000 / n_tokens)``
  — same integerization style as quality_signals, so the DuckDB twin
  (``//``) hashes identically (driver query ``vocab_coverage``).

Reference analogue: none — DuDe has no notion of content quality;
this is north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """One row per whitespace token of lower(trim(text)), docs with no
    tokens dropped — the shared tokenization of both passes (and of
    the SQL twin: ``regexp_split_to_array(trim(lower(text)), '\\s+')``)."""
    t = F.trim(F.lower(F.col(text_col)))
    return (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(*keep_cols, F.explode(F.split(t, r"\s+")).alias("token"))
    )


def top_vocab(docs: DataFrame, text_col: str = "text", k: int = 1024) -> DataFrame:
    """(token, cnt): the corpus's k most frequent tokens, ties at the
    boundary broken by token ASC so the set is deterministic.  Plans
    as partial-agg count + TakeOrdered — no global sort at any size."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return (
        _tokens(docs, text_col)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def vocab_coverage(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1024,
) -> DataFrame:
    """(id_col, n_tokens, in_vocab, cov_x1000) per document with at
    least one token: how much of the doc is made of the corpus's own
    ``k`` most frequent tokens (``vocab`` overrides the self-computed
    one — pass a reference corpus's vocabulary to score a NEW corpus
    against it, the cross-corpus CCNet shape).  Low ``cov_x1000``
    flags rare-token-heavy docs: OCR junk, mojibake, gibberish."""
    if vocab is None:
        vocab = top_vocab(docs, text_col=text_col, k=k)
    # distinct: a caller-supplied reference vocabulary with repeated
    # tokens (unioned shards, a file with dups) would otherwise
    # multiply rows through the join and corrupt every count
    hits = F.broadcast(
        vocab.select("token").distinct().withColumn("__hit", F.lit(1))
    )
    return (
        _tokens(docs, text_col, id_col)
        .join(hits, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("in_vocab"),
        )
        .withColumn(
            # TRUE integer division (`div`), not floor(double division):
            # both engines then compute the identical integer op, so the
            # bit-exact hash contract cannot diverge even where
            # in_vocab*1000/n_tokens rounds across an integer boundary
            # (a double loses integer exactness past 2^53)
            "cov_x1000",
            F.expr("in_vocab * 1000L div n_tokens").cast("long"),
        )
    )
