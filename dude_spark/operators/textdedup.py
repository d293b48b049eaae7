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

from ..functions.text import word_ngrams
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
