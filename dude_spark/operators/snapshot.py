"""Corpus snapshot diff — the queryable form of the reference's
incremental probe.

DuDe decides what to re-hash by comparing each file's (size, mtime)
against its cache (`/root/reference/internal/processing/hashing.go:73-88`
semantics); dude_spark.pipeline generalizes that probe internally for
its signature cache.  This operator exposes the same decision as a
first-class diff between two corpus snapshots: which ids were added,
removed, or changed — the input any incremental downstream (re-dedup,
re-embed, re-shard) consumes.

Scale shape: each side reduces to (id, 32-char md5 fingerprint) BEFORE
the shuffle — payload text/bytes never ride the join — then one
full-outer equi-join on the id.  On a cluster both sides bucket by id
(or live in Iceberg with id-clustered files), making the join
co-located; the output is bounded by the churn, not the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
    include_unchanged: bool = False,
) -> DataFrame:
    """(id, old_fp, new_fp, status) for status ∈ added | removed |
    changed (| unchanged when ``include_unchanged``).

    The fingerprint is md5 over the content columns, each encoded as
    a presence flag plus the value — ``'1' || value`` for a non-NULL
    column, ``'0'`` for NULL — joined with a US unit separator (\\x1f
    — cannot appear in text, so ("ab","c") never collides with
    ("a","bc")).  The flag makes NULL, '' and every real value
    pairwise distinct: a bare concat_ws SKIPS null columns, so
    (NULL, 'a') would fingerprint equal to ('a', NULL) and a
    NULL → '' edit would read as unchanged.  Absent-side fingerprints
    return as '' rather than null so downstream hashing/joins need no
    null-handling."""
    sep = "\x1f"
    enc = [
        F.when(F.col(c).isNull(), F.lit("0")).otherwise(
            F.concat(F.lit("1"), F.col(c).cast("string"))
        )
        for c in content_cols
    ]
    fp = F.md5(F.concat_ws(sep, *enc))
    o = old.select(F.col(id_col), fp.alias("old_fp"))
    n = new.select(F.col(id_col), fp.alias("new_fp"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        F.col(id_col),
        F.coalesce(F.col("old_fp"), F.lit("")).alias("old_fp"),
        F.coalesce(F.col("new_fp"), F.lit("")).alias("new_fp"),
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
