"""Benchmark decontamination — flag training docs that overlap an
evaluation/benchmark set.

The canonical LLM-training-data hygiene step (n-gram-overlap test-set
decontamination, as published with GPT-2/GPT-3 and the Pile): a corpus
document is CONTAMINATED when its text shares a substring of length >=
``SuffixConfig.min_match_len`` with any benchmark document.  This is
exactly the D3 substring-duplicate predicate applied ACROSS two tables
instead of within one, so the operator reuses the winnowing machinery
(detectors/suffix.py) end to end:

  candidates  winnowed fingerprints on BOTH sides; the winnowing
              guarantee makes a shared >=L substring imply a shared
              fingerprint, so the corpus-fp ⨝ benchmark-fp equi-join
              has exact recall (fp hash collisions only ADD candidates).
  verify      exact shared-L-gram recheck per candidate pair — the
              same whole-batch kernel as verify_substring, attached
              two-sided (corpus caption vs benchmark caption).

Scale shape (the reason this beats a within-union detector run): the
benchmark side is tiny relative to the corpus (10^3-10^6 eval docs vs
10^12 training docs), so the candidate join is benchmark-broadcast
(AQE picks BroadcastHashJoin from the benchmark side's size) and the
CORPUS NEVER SHUFFLES — each corpus fingerprint row is probed map-side
and only matching (doc, bench) candidates move.  Running the plain D3
detector over corpus ∪ benchmark would instead shuffle every corpus
fingerprint into buckets and enumerate corpus×corpus pairs nobody
asked for.

No silent truncation: there are NO caps here — a boilerplate benchmark
gram that matches millions of corpus docs flags millions of docs,
because that is the decontamination semantics (every one of those docs
really does overlap the benchmark).  Candidate volume is bounded by
sum over shared fps of df_corpus(fp) x df_bench(fp); if a benchmark
set is pathologically boilerplate-heavy, shrink it (or raise L), do
not cap the flagging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import SuffixConfig
from ..detectors.suffix import _batch_shares_substring, suffix_signatures


def _side_fps(docs: DataFrame, out_id: str) -> DataFrame:
    """(image_id, caption) → (out_id, fp) exploded winnowed fingerprints."""
    return (
        docs.where(F.col("fingerprints").isNotNull())
        .select(
            F.col("image_id").alias(out_id),
            F.explode("fingerprints").alias("fp"),
        )
    )


def contamination_pairs(
    corpus: DataFrame, benchmark: DataFrame, cfg: SuffixConfig | None = None
) -> DataFrame:
    """(doc_id, bench_id) for every corpus/benchmark pair sharing a
    substring of length >= cfg.min_match_len.

    Both inputs are (image_id, caption) frames; the two id namespaces
    are independent columns in the output, so they may overlap freely.
    Exact (winnowing recall guarantee + exact L-gram verify): the
    output equals the brute-force all-cross-pairs shared-32-gram join,
    which is how the driver oracle checks it.
    """
    cfg = cfg or SuffixConfig()
    c_fp = _side_fps(suffix_signatures(corpus, cfg), "doc_id")
    b_fp = _side_fps(suffix_signatures(benchmark, cfg), "bench_id")
    # static broadcast hint: both fp sides come from pandas-UDF
    # explodes with no stats, so the planner would otherwise pick
    # sort-merge and shuffle-write every CORPUS fingerprint before AQE
    # could re-plan — the benchmark side is the small one by contract
    cand = (
        c_fp.join(F.broadcast(b_fp), "fp")
        .select("doc_id", "bench_id")
        .distinct()
    )

    # two-sided semi-reduced caption attach (the _attach idiom, one
    # projection per side): only captions of candidate members move
    from .verify import _spread_for_python

    c_cap = corpus.select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("caption_a")
    ).join(cand.select("doc_id").distinct(), "doc_id", "leftsemi")
    b_cap = benchmark.select(
        F.col("image_id").alias("bench_id"),
        F.col("caption").alias("caption_b"),
    ).join(cand.select("bench_id").distinct(), "bench_id", "leftsemi")
    j = _spread_for_python(
        cand.join(c_cap, "doc_id").join(b_cap, "bench_id")
    ).select("doc_id", "bench_id", "caption_a", "caption_b")
    d_t, b_t = (f.dataType.simpleString() for f in j.schema.fields[:2])
    L = cfg.min_match_len

    def keep_sharing(batches):
        for pdf in batches:
            m = _batch_shares_substring(
                list(pdf["caption_a"]), list(pdf["caption_b"]), L
            )
            yield pdf.loc[m, ["doc_id", "bench_id"]]

    return j.mapInPandas(keep_sharing, f"doc_id {d_t}, bench_id {b_t}")


def _gram_array(text: Column, gram_len: int) -> Column:
    """Array of the DISTINCT character ``gram_len``-grams of ``text``
    (< gram_len chars → empty).  Pure JVM array expressions — the
    per-doc distinct happens INSIDE the row via array_distinct, so no
    shuffle ever sees duplicate grams.  The explicit ``n >= 1`` guard
    matters: Spark's ``sequence(1, 0)`` generates DESCENDING ``[1, 0]``
    rather than an empty range."""
    n = F.length(text) - F.lit(gram_len - 1)
    seq = F.transform(
        F.sequence(F.lit(1), n), lambda p: text.substr(p, F.lit(gram_len))
    )
    return F.array_distinct(
        F.when(n >= 1, seq).otherwise(F.array().cast("array<string>"))
    )


def contamination_scores(
    corpus: DataFrame, benchmark: DataFrame, gram_len: int = 32
) -> DataFrame:
    """Per-document contamination FRACTION — (doc_id, n_grams, n_hits,
    contam_x1000) where n_grams counts the doc's distinct character
    ``gram_len``-grams and n_hits how many of those appear anywhere in
    the benchmark set.

    The doc-level refinement of :func:`contamination_pairs` (GPT-3
    appendix C / PaLM-style overlap scoring): the pair operator answers
    "does this doc overlap the benchmark AT ALL" — this one answers
    "HOW MUCH", so curation can keep a doc with one incidental shared
    idiom but drop one that embeds half an eval answer key.  Docs
    shorter than ``gram_len`` have no grams and no defined fraction;
    they are absent from the output (a doc that cannot contain a
    gram-sized overlap needs no score).

    contam_x1000 is integer floor division (``n_hits * 1000 div
    n_grams`` — the vocab-coverage convention), so the DuckDB ``//``
    twin hashes identically.

    Scale shape: the corpus NEVER shuffles wide.  Gram extraction and
    the per-doc distinct are map-side array expressions; the benchmark
    gram set (tiny by the decontamination contract) is broadcast and
    probed map-side via a left join on xxhash64 keys (8-byte probe
    keys instead of gram text; a miscount would need an xxhash64
    collision between a corpus gram and a DIFFERENT benchmark gram —
    ~1e-8 at 10^9 distinct grams); the only corpus shuffle is the
    final groupBy carrying (doc_id, two longs) with map-side partial
    aggregation.  At 10^12 docs the explode is ~|text| rows per doc —
    the same order as the winnowing scan — so when only flagged docs
    need scores, feed ``contamination_pairs`` survivors in as
    ``corpus`` instead of the full table.
    """
    if gram_len <= 0:
        raise ValueError(f"gram_len must be positive, got {gram_len}")
    c = corpus.select(
        F.col("image_id").alias("doc_id"),
        F.explode(_gram_array(F.col("caption"), gram_len)).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("gh"))
    b = (
        benchmark.select(
            F.explode(_gram_array(F.col("caption"), gram_len)).alias("g")
        )
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        c.join(F.broadcast(b), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("hit").cast("long").alias("n_hits"),
        )
        .withColumn(
            "contam_x1000", F.expr("n_hits * 1000 div n_grams").cast("long")
        )
    )


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, cfg: SuffixConfig | None = None
) -> tuple[DataFrame, DataFrame]:
    """(clean_corpus, flagged) — remove every contaminated doc.

    ``flagged`` is (doc_id, n_bench_hits): the removed docs with how
    many benchmark docs each overlapped (the audit trail — removal is
    never silent).  ``clean_corpus`` keeps the input schema.
    """
    pairs = contamination_pairs(corpus, benchmark, cfg)
    flagged = pairs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bench_hits")
    )
    clean = corpus.join(
        flagged.select(F.col("doc_id").alias("image_id")),
        "image_id",
        "left_anti",
    )
    return clean, flagged


def novelty_scores(
    new: DataFrame, reference: DataFrame, gram_len: int = 32
) -> DataFrame:
    """Per-document NOVELTY fraction of a new batch against a reference
    corpus — (doc_id, n_grams, novel, novel_x1000) where ``novel``
    counts the new doc's distinct character ``gram_len``-grams that
    appear NOWHERE in the reference.  The inverse question of
    :func:`contamination_scores`: contamination asks "how much of this
    doc is the benchmark's", novelty asks "how much of this crawl adds
    anything" — the acquisition-triage signal (a crawl scoring ~0 is
    re-ingestion; a source scoring ~1000 against everything ingested
    is genuinely new supply).  Docs shorter than ``gram_len`` have no
    grams and are absent.

    Integer contract as everywhere: ``novel * 1000 div n_grams``.

    Scale shape — the mirror image of contamination_scores: THERE the
    benchmark is tiny by contract and broadcasts; HERE the reference
    is the accumulated corpus (10^12 docs), so nothing broadcasts —
    the reference reduces to its distinct gram-hash set (map-side
    combinable distinct) and the join is gram-hash-keyed on 8-byte
    xxhash64 keys, the inverted-index shuffle shape every pair
    operator in this repo already rides.  A hash collision can only
    UNDERCOUNT novelty by marking a truly-novel gram as seen
    (~1e-8 at 10^9 distinct grams — the contamination_scores
    contract); the DuckDB oracle joins gram STRINGS, so a hash-key
    defect cannot hide.
    """
    if gram_len <= 0:
        raise ValueError(f"gram_len must be positive, got {gram_len}")
    c = new.select(
        F.col("image_id").alias("doc_id"),
        F.explode(_gram_array(F.col("caption"), gram_len)).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("gh"))
    r = (
        reference.select(
            F.explode(_gram_array(F.col("caption"), gram_len)).alias("g")
        )
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        c.join(r, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            (F.count("*") - F.count("hit")).cast("long").alias("novel"),
        )
        .withColumn(
            "novel_x1000", F.expr("novel * 1000 div n_grams").cast("long")
        )
    )
