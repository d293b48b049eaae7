"""N-gram Jaccard near-dup detection over a document table.

The exact (non-probabilistic) sibling of D1 MinHash-LSH for corpora
where candidate volume allows full inverted-index joins: explode
distinct word n-grams → self-join on gram → count intersections →
integer-arithmetic Jaccard filter.  Same blocking-then-verify shape as
the reference's group-then-compare (SURVEY.md §4 "Group-then-verify"),
with the gram playing the bucket role.

All-integer outputs (inter, union, a, b) so the DuckDB oracle hash in
``__spark_entry__`` matches bit-for-bit — Jaccard >= num/den is tested
as ``inter * den >= num * union`` with no floating point anywhere.

Scale levers: `max_gram_df` drops grams appearing in more than that
many documents (stopword-phrase hot keys — the skew analogue of the
candidates bucket cap); dropped grams are returned as a count, never
silently (SURVEY.md §2.2 rule).  At 10^12 docs this operator is the
wrong tool (candidate joins explode) — use D1 MinHash-LSH; this one is
the recall oracle at verification scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams
from ..session import ensure_min_partitions


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 10,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(a, b, inter, union) for doc pairs with n-gram Jaccard >= num/den.

    a < b; inter/union are distinct-gram counts.  When `max_gram_df`
    is set, grams with document frequency above it are excluded from
    BOTH intersection and union (consistent semantics) — the returned
    DataFrame's ``.dropped_grams`` attribute reports how many.
    """
    # spread an under-split scan first (one row group = one task for
    # the tokenize/explode otherwise), then carry grams as xxhash64
    # LONGS: the inverted-index self-join — the operator's widest
    # shuffle — moves 8 bytes per gram instead of a ~n-word string.
    # Distinct-gram semantics are applied on the STRINGS (array_distinct
    # before hashing); a 64-bit collision merging two grams of one pair
    # shifts its counts with probability ~|grams|²/2^64 — immaterial
    # (the same contract as verify_jaccard's hashed shingle sets).
    grams = ensure_min_partitions(
        docs.select(F.col(id_col).alias("doc"), F.col(text_col))
    ).select(
        "doc",
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
    ).select("doc", F.xxhash64("g").alias("gram"))
    dropped = 0
    if max_gram_df is not None:
        df_counts = grams.groupBy("gram").agg(F.countDistinct("doc").alias("df"))
        hot = df_counts.where(F.col("df") > max_gram_df)
        dropped = hot.count()
        grams = grams.join(hot.select("gram"), "gram", "left_anti")
    sizes = grams.groupBy("doc").agg(F.count("*").alias("gsize"))
    left = grams.select(F.col("doc").alias("a"), "gram")
    right = grams.select(F.col("doc").alias("b"), "gram")
    inter = (
        left.join(right, "gram")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc").alias("a"), F.col("gsize").alias("sa")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("gsize").alias("sb")), "b")
        .withColumn("union", F.col("sa") + F.col("sb") - F.col("inter"))
        .where(F.col("inter") * threshold_den >= threshold_num * F.col("union"))
        .select("a", "b", "inter", "union")
    )
    out.dropped_grams = dropped  # type: ignore[attr-defined]
    return out


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 10,
) -> DataFrame:
    """Chunk-granularity exact dedup (the tractable form of Lee et
    al. 2022's exact-substring dedup, and the batch analogue of
    CCNet's paragraph dedup for corpora without paragraph breaks):
    split every document into non-overlapping ``chunk_tokens``-token
    chunks, keep only each distinct chunk's FIRST corpus occurrence
    (min (doc_id, chunk_idx) — deterministic, append-stable for
    existing docs), and report the rebuilt per-document text.

    Returns (doc_id, n_chunks, n_kept, dedup_fp) — dedup_fp is the
    md5 of the kept chunks re-joined in document order (the PII-scrub
    rewrite-oracle trick: a full-text rewrite verified through one
    32-char column).  Documents whose every chunk appeared earlier
    collapse to md5('') with n_kept = 0; empty documents survive with
    n_chunks = 0.

    Scale shape: chunking is pure codegen (sequence + transform +
    slice, no UDF); the dedup decision is ONE combinable min-struct
    aggregate keyed by xxhash64(chunk) — 8-byte shuffle keys, never
    the chunk text (a 64-bit collision merges two distinct chunks
    with probability ~|chunks|²/2^64: the same documented contract as
    the gram hashing above).  The rebuild is a per-document aggregate
    whose buffer is bounded by that document's own chunk count.
    """
    w = int(chunk_tokens)
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(w)).cast("int")
    chunk_at = lambda i: F.array_join(F.slice(toks, i * w + 1, w), " ")
    chunks = F.when(
        F.size(toks) > 0, F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk_at)
    ).otherwise(F.array().cast("array<string>"))
    ex = ensure_min_partitions(
        docs.select(F.col(id_col).alias("doc"), F.col(text_col))
    ).select("doc", F.posexplode(chunks).alias("idx", "chunk"))
    ex = ex.withColumn("k", F.xxhash64("chunk"))
    first = ex.groupBy("k").agg(F.min(F.struct("doc", "idx")).alias("keeper"))
    flagged = ex.join(first, "k").withColumn(
        "keep", (F.col("doc") == F.col("keeper.doc")) & (F.col("idx") == F.col("keeper.idx"))
    )
    per_doc = flagged.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    # collect_list drops nulls, so the when() keeps
                    # only surviving chunks; array_sort on (idx, chunk)
                    # restores document order (idx is unique per doc)
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("idx", "chunk"))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            )
        ).alias("dedup_fp"),
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("n_chunks"), F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("dedup_fp"), F.md5(F.lit(""))).alias("dedup_fp"),
        )
    )
