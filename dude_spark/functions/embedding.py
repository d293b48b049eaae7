"""Embedding similarity: exact cosine top-k + LSH-bucketed ANN.

Two paths over an ``embeddings(vec_id, embedding array<float>, …)``
table:

  brute_force_topk   exact: broadcast the (small) query set, cosine via
                     JVM higher-order functions (zip_with + aggregate —
                     no Python in the scoring loop), row_number window
                     for top-k.  O(|queries| · |corpus|) — the
                     correctness baseline and the right tool when the
                     query set is small.
  ann_topk           scale path: 64-bit random-hyperplane signature
                     (sign of X·H, one vectorized numpy matmul per
                     Arrow batch), candidate retrieval via the SAME
                     generalized-pigeonhole segment bucketing as the
                     D2 SimHash detector (detectors/simhash.py), exact
                     cosine re-rank of candidates only.  Hyperplanes
                     are seeded/deterministic (sha256, SURVEY.md §4).

Ranking determinism: scores are rounded to 9 decimals and tied on
vec_id before row_number, so top-k is reproducible and (for the exact
path) bit-identical to the DuckDB oracle despite float summation-order
differences between engines.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SimHashConfig
from ..detectors.simhash import segment_subsets


def cosine(a, b):
    """Cosine similarity of two array<float> columns, double precision."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) exact cosine top-k, self excluded.

    The query side is broadcast — at 10^12 corpus rows this is one
    scan, no shuffle (the window repartitions only |q|·|corpus| scored
    rows after the filter... no: scored rows ARE |q|·|corpus|; keep
    |queries| small or use ann_topk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_dup_pairs(
    corpus: DataFrame, threshold: float, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b) with a < b and cosine >= threshold — embedding near-dup
    detection, the dedup-family sibling of the text detectors.

    Exact all-pairs, computed as a distributed block matmul: the
    normalized corpus matrix rides to every partition (collected once
    driver-side — sized for verification scale, ≤ ~10^5 vectors ≈
    tens of MB), each Arrow batch computes X_block @ C.T in one numpy
    GEMM, thresholds, and emits only the qualifying (a, b) id pairs.
    ~100× faster than per-pair JVM array folds and the dominant cost
    is the matmul itself.  At corpus scale put the hyperplane-LSH
    candidates (ann_topk's bucketing) in front of an exact per-pair
    recheck, exactly as LSH fronts exact Jaccard in D1.

    The similarity is rounded to 9 decimals before thresholding so the
    decision is reproducible across engines (DuckDB oracle parity).
    """
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows])
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, C = ids[order], C[order]

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            a_ids = pdf["__id"].to_numpy()
            X = np.stack(pdf["__emb"].to_numpy()).astype(np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            sims = np.round(X @ C.T, 9)
            ai, bj = np.nonzero(sims >= threshold)
            keep = a_ids[ai] < ids[bj]  # a < b: dedupe + drop self
            yield pd.DataFrame({"a": a_ids[ai][keep], "b": ids[bj][keep]})

    id_type = corpus.schema[id_col].dataType.simpleString()
    return corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__emb")
    ).mapInPandas(block, f"a {id_type}, b {id_type}")


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    blob = f"ann-hyperplanes|{seed}|{dim}|{bits}".encode()
    rs = np.random.RandomState(int.from_bytes(hashlib.sha256(blob).digest()[:4], "big"))
    return rs.standard_normal((dim, bits)).astype(np.float64)


def signature_udf(dim: int, bits: int = 64, seed: int = 42):
    """pandas_udf: embedding → int64 random-hyperplane signature.
    One numpy matmul per Arrow batch — fully vectorized."""
    H = _hyperplanes(dim, bits, seed)
    weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))

    @F.pandas_udf("long")
    def sig(embs: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in embs:
            X = np.stack(batch.to_numpy())
            b = (X.astype(np.float64) @ H) > 0
            vals = (b.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
            yield pd.Series(vals.astype(np.int64))

    return sig


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming_radius: int = 12,
    segments: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidates, exact re-rank.

    Candidate rule: signature Hamming distance <= radius, found via
    the D2 pigeonhole subset bucketing — cos θ ≈ cos(π·d_hamming/64),
    so radius 12 covers cosine ≳ 0.83 neighborhoods with certainty
    and farther ones probabilistically.  Exact cosine re-ranks the
    candidates, so precision is exact; only recall is approximate.
    """
    sig = signature_udf(dim, 64, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        sig(F.col(vec_col)).alias("c_sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        sig(F.col(vec_col)).alias("q_sig"),
    )

    # pigeonhole guarantee holds for radius <= segments-1 per-table;
    # for the larger ANN radius the same buckets act probabilistically
    # (multi-probe) — candidates beyond are simply not retrieved.
    scfg = SimHashConfig(segments=segments, hamming_radius=min(segments - 1, 7))
    width = 64 // segments
    mask = (1 << width) - 1

    def keys(sig_col):
        seg = lambda i: F.shiftright(sig_col, i * width).bitwiseAND(F.lit(mask))
        return F.array(
            *[
                F.concat_ws(
                    ":", F.lit(str(si)), *[seg(i).cast("string") for i in subset]
                )
                for si, subset in enumerate(
                    segment_subsets(scfg.segments, scfg.hamming_radius)
                )
            ]
        )

    cb = c.select("neighbor_id", "c_emb", "c_sig", F.explode(keys(F.col("c_sig"))).alias("bucket"))
    qb = q.select("query_id", "q_emb", "q_sig", F.explode(keys(F.col("q_sig"))).alias("bucket"))
    cands = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .where(
            F.bit_count(F.col("c_sig").bitwiseXOR(F.col("q_sig")))
            <= F.lit(hamming_radius)
        )
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
        .distinct()
    )
    scored = cands.withColumn(
        "sim", F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
