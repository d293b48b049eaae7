"""Deterministic hash-based corpus splitting and sampling.

The standard training-data-pipeline step DuDe has no analogue for
(its split is "which directory a file came from"): assign every row a
stable train/val/test split — or keep a stable p-fraction sample —
from the row's IDENTITY alone, so the assignment survives re-runs,
repartitioning, cluster-size changes, and incremental appends (a doc
added tomorrow lands in the same split it would have landed in today).

Mechanism: the first 8 hex chars of ``md5(seed ':' id)`` are a uniform
32-bit value.  Fixed-width lowercase hex compares lexicographically
exactly as it compares numerically, so split boundaries are plain
STRING comparisons against precomputed hex literals — pure JVM
whole-stage-codegen expressions (no UDF, no shuffle, no driver work),
and byte-identical semantics in any engine with md5 (the DuckDB oracle
runs the very same literals).  At 10^12 rows the op is a free map over
the scan; the split column also makes a fine partition column for the
training-shard writer.

Determinism contract: md5 is fully specified, Spark's ``F.md5`` and
DuckDB's ``md5`` both hash the UTF-8 bytes and emit lowercase hex, and
integer→string casts agree on decimal form — gated by the driver
oracle (`train_split`) and tests.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16**8  # value space of the 8-hex-char prefix


def _hex_key(id_col: Column, seed: str) -> Column:
    """First 8 md5 hex chars of 'seed:id' — a uniform u32 as hex text."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 8
    )


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(name, upper-bound hex literal) per split, cumulative order.

    The last split's bound is forced to 'ffffffff…'-exclusive (i.e.
    everything), so rounding never orphans rows; weights must be
    positive and sum to ~1.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("split weights must be positive")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        out.append((name, format(min(int(acc * _HEX_SPAN), _HEX_SPAN - 1), "08x")))
    out.append((names[-1], "g"))  # 'g' > every hex char: catch-all
    return out


def hash_split(
    df: DataFrame,
    id_col: str = "image_id",
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a stable split-name column keyed on ``id_col``.

    Default 80/10/10 train/val/test.  Rows with equal ids always land
    in the same split regardless of run, partitioning, or corpus
    growth; splits are disjoint and cover every row by construction.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    key = _hex_key(F.col(id_col), seed)
    expr = None
    for name, bound in split_boundaries(weights):
        cond = key < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame,
    frac: float,
    id_col: str = "image_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep a stable ~``frac`` fraction of rows, keyed on identity.

    Unlike ``DataFrame.sample`` (per-partition RNG: resampling after a
    repartition or an append changes membership), the kept set is a
    pure function of (seed, id) — re-runs, incremental batches, and
    different cluster sizes all agree on it, so downstream caches and
    eval sets stay valid.
    """
    bound = fraction_bound(frac)  # validates frac
    if bound == "g":
        # frac == 1.0, or close enough that the float product rounds to
        # the full span (e.g. 1 - 2**-53): keep everything — including
        # NULL-id rows, which any hashed compare would drop.
        return df
    return df.where(_hex_key(F.col(id_col), seed) < F.lit(bound))


def fraction_bound(frac: float) -> str:
    """The hex literal a fraction compares against — 'g' (> every hex
    char) for the keep-everything case: format() on the full span
    would emit a 9-char bound, and the 8-char keys would compare
    against its first digit only (~1/16 kept).  Single source of the
    bound math, so SQL callers embedding these literals reproduce
    deterministic_sample/stratified_sample exactly."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    bound_i = int(frac * _HEX_SPAN)
    return "g" if bound_i >= _HEX_SPAN else format(bound_i, "08x")


def weight_bound(weight: Column) -> Column:
    """Per-row hex bound realizing a [0, 1] keep-probability column —
    the per-row generalization of :func:`fraction_bound`.

    ``floor(weight * 2^32)`` is ONE IEEE-double product + floor, so any
    engine with doubles reproduces it bit-exactly (the domain_mix
    oracle precedent); the result renders as the same fixed-width
    lowercase hex the module's keys compare against.  Out-of-range
    weights clamp (``<= 0`` → drop-all bound, ``>= 1`` → ``'g'``
    keep-all); a NULL or NaN weight yields a NULL bound, so the
    comparison is NULL and the row is dropped (no weight → no stable
    assignment, the stratified_sample NULL contract — NaN needs its
    own branch because Spark orders NaN ABOVE every number, which
    would otherwise silently take the keep-all branch).
    """
    w = weight.cast("double")
    scaled = F.floor(w * F.lit(float(_HEX_SPAN)))
    return (
        F.when(w.isNull() | F.isnan(w), F.lit(None).cast("string"))
        .when(scaled >= _HEX_SPAN, F.lit("g"))
        .when(scaled <= 0, F.lit("00000000"))
        .otherwise(F.lpad(F.lower(F.hex(scaled)), 8, "0"))
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    id_col: str = "image_id",
    seed: str = "wsample",
) -> DataFrame:
    """Keep each row with probability = its own weight in [0, 1],
    deterministically keyed on identity — quality-weighted corpus
    downsampling (keep high-quality docs with high probability, junk
    with low) as one codegen'd comparison.

    Same guarantees as :func:`deterministic_sample`, per row: stable
    across re-runs / repartitioning / appends, and MONOTONE IN THE
    WEIGHT — the uniform key is weight-independent, so raising a row's
    weight can only keep it, never evict it (re-scoring a corpus with
    a better quality model changes membership one-directionally per
    row).  ``weight_col`` may be a column name or a derived Column
    expression; weights clamp to [0, 1], NULL weights drop the row
    (see :func:`weight_bound`).

    Scale shape: zero shuffle, zero UDF — a whole-stage-codegen filter
    over the scan at any corpus size, like every op in this module.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    bound = weight_bound(w)
    # the explicit 'g' branch is deterministic_sample's frac==1.0
    # early-return, per row: weight >= 1 keeps the row even when its
    # id is NULL (a hashed compare would drop it — keep-probability 0
    # instead of the promised 1).  For non-NULL keys the branch is
    # redundant (every hex key < 'g'), so the sampled set is unchanged.
    return df.where(
        (bound == F.lit("g")) | (_hex_key(F.col(id_col), seed) < bound)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "image_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep a stable per-stratum fraction of rows, keyed on identity —
    ``DataFrame.sampleBy`` with this module's determinism contract.

    The canonical corpus-rebalancing step (e.g. downsample English to
    50%, keep low-resource languages whole): each row's stratum picks
    its hex bound, one codegen'd comparison keeps or drops.  Same
    guarantees as deterministic_sample, per stratum: stable across
    re-runs/repartitioning/appends, and monotone in the fraction
    (raising a stratum's fraction only ADDS rows).  Per stratum the
    kept set equals ``deterministic_sample(df.where(stratum), frac)``
    with the same seed — gated in tests.

    sampleBy semantics for unlisted strata: their bound is NULL, the
    comparison is NULL, the row is dropped.  Pass an explicit 1.0 to
    keep a stratum whole.

    NULL handling: rows with a NULL id or NULL stratum are always
    dropped (no identity → no stable assignment).  This is the one
    place the per-stratum equality above is asymmetric:
    deterministic_sample's frac=1.0 early return keeps NULL-id rows
    because it never evaluates the hash.
    """
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    bound = None
    for name, frac in fractions.items():
        lit = fraction_bound(frac)  # validates frac
        cond = F.col(strata_col).cast("string") == name
        bound = (
            F.when(cond, F.lit(lit))
            if bound is None
            else bound.when(cond, F.lit(lit))
        )
    return df.where(_hex_key(F.col(id_col), seed) < bound)


def mix_fractions(
    totals: dict[str, float], weights: dict[str, float]
) -> dict[str, float]:
    """Downsample-only per-stratum keep fractions realizing the target
    mixture ``weights`` from the observed per-stratum mass ``totals``:
    the achievable output mass is ``n = min_d(totals[d] / weights[d])``
    (the binding stratum is kept whole, nothing is ever upsampled), and
    ``f_d = min(1.0, weights[d] * n / totals[d])`` (the min guards the
    1-ulp overshoot on the binding stratum itself).

    Float contract: every step is IEEE-double with this exact
    expression shape, so a SQL twin computing
    ``LEAST(1.0, w * min(t/w) / t)`` over DOUBLE-cast totals gets
    bit-identical fractions, hence identical hex bounds and identical
    kept sets (the ``domain_mix`` driver oracle does exactly this).
    """
    if not weights:
        raise ValueError("weights must name at least one stratum")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be positive")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"mixture weights must sum to 1, got {total}")
    missing = [d for d in weights if not totals.get(d)]
    if missing:
        raise ValueError(
            f"strata {missing} have no mass in the corpus — a mixture "
            "targeting them is unachievable by downsampling"
        )
    n = min(float(totals[d]) / weights[d] for d in weights)
    return {
        d: min(1.0, weights[d] * n / float(totals[d])) for d in weights
    }


def mix_plan(
    totals: dict[str, float],
    weights: dict[str, float],
    max_repeat: int = 4,
) -> dict[str, tuple[int, float]]:
    """Per-stratum ``(repeat, fraction)`` realizing the target mixture
    when UPSAMPLING by integer repeats is allowed — the standard
    low-resource-domain trick ``mix_fractions`` deliberately refuses
    (downsample-only).  The output corpus mass is the largest
    mixture-consistent one where no stratum repeats more than
    ``max_repeat`` times:

      N        = min_d(totals[d] * max_repeat / weights[d])
      m_d      = weights[d] * N            (stratum d's target mass)
      repeat_d = min(max_repeat, ceil(m_d / totals[d]))
      frac_d   = min(1.0, m_d / (totals[d] * repeat_d))

    ``max_repeat=1`` degenerates to exactly ``mix_fractions``.

    Float contract (same as mix_fractions): every step is IEEE-double
    in this exact expression shape — totals cast to double first, then
    ``t * max_repeat / w``, ``ceil``, ``m / (t * repeat)`` — so a SQL
    twin with the same shapes gets bit-identical repeats, fractions,
    and hex bounds (driver oracle ``domain_mix_epochs``)."""
    if max_repeat < 1:
        raise ValueError(f"max_repeat must be >= 1, got {max_repeat}")
    fr = mix_fractions(totals, weights)  # reuse all validation
    if max_repeat == 1:
        return {d: (1, f) for d, f in fr.items()}
    n = min(float(totals[d]) * max_repeat / weights[d] for d in weights)
    plan: dict[str, tuple[int, float]] = {}
    for d, w in weights.items():
        t = float(totals[d])
        m = w * n
        rep = min(max_repeat, int(math.ceil(m / t)))
        plan[d] = (rep, min(1.0, m / (t * rep)))
    return plan


def _hex_key_epoch(id_col: Column, epoch_col: Column, seed: str) -> Column:
    """First 8 md5 hex chars of 'seed@epoch:id' — epoch-salted variant
    of _hex_key, so each repeat copy samples independently."""
    return F.substring(
        F.md5(
            F.concat(
                F.lit(f"{seed}@"),
                epoch_col.cast("string"),
                F.lit(":"),
                id_col.cast("string"),
            )
        ),
        1,
        8,
    )


def mix_corpus_epochs(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    id_col: str = "image_id",
    weight_col: str | None = None,
    seed: str = "mix",
    max_repeat: int = 4,
) -> tuple[DataFrame, dict[str, tuple[int, float]]]:
    """(mixed, plan): materialize :func:`mix_plan` — each row explodes
    into its stratum's ``repeat`` epoch copies (``epoch`` column,
    1-based) and copy e survives iff ``md5(seed@e:id)`` clears the
    stratum's hex bound, so every epoch is an independent
    deterministic sample and the expected kept mass per stratum is
    exactly ``weights[d] * N``.  The ``epoch`` column keeps repeated
    rows distinguishable downstream (shard writer, packing).

    Scale shape: same zero-shuffle contract as the rest of this module
    — one combine aggregate for the per-stratum mass (#strata rows to
    the driver), then a pure codegen explode+compare map over the
    scan; the explode factor is the stratum's repeat (≤ max_repeat),
    never data-sized.  Strata not in ``weights`` drop (their repeat
    expression is NULL, so the sequence explodes to nothing)."""
    mass = (
        F.count("*") if weight_col is None
        else F.sum(F.col(weight_col).cast("long"))
    ).alias("__mass")
    rows = (
        df.where(F.col(strata_col).cast("string").isin(list(weights)))
        .groupBy(F.col(strata_col).cast("string").alias("__stratum"))
        .agg(mass)
        .collect()
    )
    totals = {r["__stratum"]: r["__mass"] for r in rows}
    plan = mix_plan(totals, weights, max_repeat)
    rep_expr, bound_expr = None, None
    for name, (rep, frac) in plan.items():
        cond = F.col(strata_col).cast("string") == name
        rep_lit, b_lit = F.lit(rep), F.lit(fraction_bound(frac))
        rep_expr = F.when(cond, rep_lit) if rep_expr is None else rep_expr.when(cond, rep_lit)
        bound_expr = F.when(cond, b_lit) if bound_expr is None else bound_expr.when(cond, b_lit)
    out = (
        df.withColumn("epoch", F.explode(F.sequence(F.lit(1), rep_expr)))
        .where(_hex_key_epoch(F.col(id_col), F.col("epoch"), seed) < bound_expr)
    )
    return out, plan


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    id_col: str = "image_id",
    weight_col: str | None = None,
    seed: str = "mix",
) -> tuple[DataFrame, dict[str, float]]:
    """(mixed, fractions): deterministic downsample-only rebalancing of
    the corpus to the target mixture ``weights`` — per-stratum mass
    measured in rows (``weight_col`` None) or in ``sum(weight_col)``
    (the realistic case: a token count, so the mixture is of TRAINING
    TOKENS, not documents).

    The data-mixing stage every pretraining recipe runs after
    dedup/filter (fixed-weight domain reweighting): one map-side-
    combinable aggregate collects #strata rows to the driver, then one
    :func:`stratified_sample` pass keeps each stratum at its derived
    fraction — same determinism contract (stable across re-runs,
    repartitioning, and appends; monotone per stratum).  Strata not in
    ``weights`` are dropped (sampleBy semantics).  Expectation, not
    quota: like every hash-sampling op here, realized mass matches the
    target in expectation (~1/sqrt(kept) relative noise), which is the
    trade that keeps the op a zero-shuffle map over the scan.
    """
    mass = (
        F.count("*") if weight_col is None
        else F.sum(F.col(weight_col).cast("long"))
    ).alias("__mass")
    rows = (
        df.where(F.col(strata_col).cast("string").isin(list(weights)))
        .groupBy(F.col(strata_col).cast("string").alias("__stratum"))
        .agg(mass)
        .collect()
    )
    totals = {r["__stratum"]: r["__mass"] for r in rows}
    fractions = mix_fractions(totals, weights)
    return (
        stratified_sample(df, fractions, strata_col, id_col, seed),
        fractions,
    )
