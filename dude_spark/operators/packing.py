"""Sequence packing — concat-and-chunk assignment of docs to
fixed-token-budget training sequences.

GPT-style pretraining concatenates the tokenized corpus in a
deterministic document order and slices it every ``budget`` tokens;
the batch-building question "which training sequence does this
document start in, and at what offset?" is therefore a pure function
of the EXCLUSIVE token prefix sum:

  seq_id     = floor(prefix / budget)
  seq_offset = prefix % budget

A document straddling a boundary belongs to the sequence its FIRST
token falls in (consumers slicing the concatenated stream spill its
tail into the next sequence — that is the concat-and-chunk contract,
not an approximation), and a document longer than ``budget`` simply
spans several slices.

Scale shape: the naive expression of the prefix sum is ``sum(tokens)
OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)`` — a global-order window
Spark plans as a SinglePartition exchange, one task at 10^12 rows.
functions/ranking.with_running_total computes the identical integers
via the two-pass distributed shape (range repartition → per-partition
weight sums → offset cumsum), so packing costs the same as the shard
writer's global rank.  Validation (non-negative, non-NULL weights)
rides the per-partition aggregate for free.

Reference analogue: none — DuDe stops at duplicate groups; this is the
training-data hand-off stage downstream of dedup/filter/shards,
oracle-gated against DuckDB's literal window expression
(``__spark_entry__.q_seq_packing``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ranking import with_running_total


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_cols: Sequence[str] = ("doc_id",),
    seq_col: str = "seq_id",
    offset_col: str = "seq_offset",
) -> DataFrame:
    """Append ``seq_col``/``offset_col`` = the training-sequence index
    and in-sequence token offset of each document's first token under
    concat-and-chunk packing at ``budget`` tokens per sequence, in
    ``order_cols`` order (include a unique column for a total order —
    same caller contract as with_global_rank)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    clash = {seq_col, offset_col, "__cum"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with packing "
            "output columns; rename them first"
        )
    cum = with_running_total(docs, order_cols, token_col, out_col="__cum")
    return (
        cum.withColumn(
            seq_col, F.expr(f"__cum DIV {int(budget)}").cast("long")
        )
        .withColumn(offset_col, (F.col("__cum") % budget).cast("long"))
        .drop("__cum")
    )


def budget_select(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_cols: Sequence[str] = ("doc_id",),
    out_col: str = "cum_tokens",
) -> DataFrame:
    """Greedy token-budget corpus selection: walk the corpus in
    ``order_cols`` order and keep whole documents while the running
    token total stays within ``budget`` — "fill a 1T-token training
    budget with the best documents first".

    Rank-by-quality-then-cut is THE standard curation step downstream
    of quality scoring (pass a precomputed descending sort key — e.g.
    a negated quality column — plus a unique tiebreaker as
    ``order_cols``; same total-order caller contract as
    with_global_rank).  A document is kept iff its INCLUSIVE prefix sum
    ``<= budget`` — whole docs only, no partial truncation; a doc
    exactly exhausting the budget is kept.  ``out_col`` carries that
    inclusive prefix sum, so the output is also the packing manifest
    for the selected slice.

    Scale shape: the prefix sum is functions/ranking.with_running_total
    (two narrow distributed passes, no SinglePartition window at any
    size — the seq_packing shape); the cut itself is a codegen filter.
    Equals the literal ``sum(tokens) OVER (ORDER BY ...) <= budget``
    window query, which is how the driver oracle checks it.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    clash = {out_col, "__run"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with selection "
            "output columns; rename them first"
        )
    cum = with_running_total(docs, order_cols, token_col, out_col="__run")
    incl = F.col("__run") + F.col(token_col).cast("long")
    return (
        cum.where(incl <= int(budget))
        .withColumn(out_col, incl.cast("long"))
        .drop("__run")
    )
