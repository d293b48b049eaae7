"""Embedding similarity ops: exact vs naive, ANN recall on planted dups."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dude_spark.functions.embedding import ann_topk, brute_force_topk, cosine_dup_pairs

DIM = 64


@pytest.fixture(scope="module")
def planted(spark):
    """300 base vectors + a noised near-dup for the first 40 (cos>0.99)."""
    rs = np.random.RandomState(31)
    base = rs.standard_normal((300, DIM))
    noised = base[:40] + 0.05 * rs.standard_normal((40, DIM))
    vecs = np.vstack([base, noised])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
        }
    )
    df = spark.createDataFrame(pdf)
    df.persist().count()
    return df, vecs


def _true_sims(vecs):
    X = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    return X @ X.T


def test_cosine_dup_pairs_matches_numpy(planted):
    df, vecs = planted
    got = {(r["a"], r["b"]) for r in cosine_dup_pairs(df, 0.95).collect()}
    sims = _true_sims(vecs)
    want = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if round(sims[i, j], 9) >= 0.95
    }
    assert got == want
    assert len(want) >= 38  # the planted near-dups are found


def test_brute_force_topk_matches_numpy(planted):
    df, vecs = planted
    queries = df.where(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(df, queries, k=3).collect()
    }
    sims = _true_sims(vecs)
    for q in range(5):
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-round(sims[q, i], 9), i),
        )
        for rank, nid in enumerate(order[:3], start=1):
            assert got[(q, rank)] == nid, (q, rank)


def test_ann_recall_on_planted_dups(planted):
    df, vecs = planted
    queries = df.where(F.col("vec_id") >= 300)  # the noised copies
    ann = ann_topk(df, queries, k=1, dim=DIM)
    got = {r["query_id"]: r["neighbor_id"] for r in ann.collect() if r["rank"] == 1}
    # each noised vector's true nearest neighbor is its base vector
    hits = sum(1 for q in range(300, 340) if got.get(q) == q - 300)
    recall = hits / 40
    assert recall >= 0.9, f"ANN recall@1 {recall:.2f}"
