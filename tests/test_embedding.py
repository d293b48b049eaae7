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


def test_ann_overlap_on_driver_embeddings(spark):
    """Round-1 VERDICT gate: ANN∩exact top-k overlap >= 0.8 on the REAL
    driver embeddings (whose neighbors sit at cos ~0.4 — the regime the
    round-1 radius-cut ANN returned zero rows on), not only planted
    cos>0.99 dups."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = embs.where(F.col("vec_id") < 5)
    exact = brute_force_topk(embs, queries, k=10)
    ann = ann_topk(embs, queries, k=10, dim=DIM)
    ex: dict[int, set] = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    an: dict[int, set] = {}
    for r in ann.collect():
        an.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(an) == set(ex) == {0, 1, 2, 3, 4}
    assert all(len(v) == 10 for v in an.values())  # full k rows per query
    overlaps = [len(an[q] & ex[q]) / 10 for q in ex]
    mean = sum(overlaps) / len(overlaps)
    assert mean >= 0.8, f"ANN overlap {mean:.2f} ({overlaps})"


def test_ann_topk_driver_planted_slice_is_live(spark):
    """The driver's ann_topk query plants k EXACT duplicates per query
    vector (cosine 1.0, re-keyed >= 400000): a correct IVF index must
    surface exactly |queries|·k rows and every top-k slot goes to a
    planted id — so a recall collapse drops VISIBLE rows in the
    rows-only driver gate (round-3 VERDICT next #9)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    out = e.q_ann_topk(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 50
    assert all(r["neighbor_id"] >= 400000 for r in out)
    per_query = {}
    for r in out:
        per_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(per_query) == {0, 1, 2, 3, 4}
    # each query's slots are exactly ITS ten planted copies
    for q, nbrs in per_query.items():
        assert nbrs == {400000 + q * 10 + i for i in range(10)}


def test_ann_prebuilt_index_parity(planted, tmp_path):
    """ann_fit/ann_assign/ann_query factored stages ≡ the per-call
    ann_topk — including a parquet round trip of the posting-list
    frame (the persisted-index path CLI ann-build/ann-query uses)."""
    from dude_spark.functions.embedding import (
        ann_assign,
        ann_query,
        train_ivf_centroids,
    )

    df, _ = planted
    queries = df.where(F.col("vec_id") < 5)
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk(df, queries, k=5, dim=DIM).collect()
    }
    cent = train_ivf_centroids(df, n_cells=32)
    assigned = ann_assign(df, cent)
    # persist + reload: what ann-query serves is the parquet frame
    p = str(tmp_path / "cells")
    assigned.write.parquet(p)
    reloaded = df.sparkSession.read.parquet(p)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_query(reloaded, cent, queries, k=5).collect()
    }
    assert got == want
    # prebuilt args on ann_topk short-circuit train AND assignment
    got2 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk(
            df, queries, k=5, dim=DIM, centroids=cent, assigned=reloaded
        ).collect()
    }
    assert got2 == want
    with pytest.raises(ValueError, match="centroids"):
        ann_topk(df, queries, assigned=reloaded)


def test_ann_topk_empty_corpus_returns_empty(spark, planted):
    df, _ = planted
    empty = df.where(F.col("vec_id") < 0)
    queries = df.where(F.col("vec_id") < 3)
    out = ann_topk(empty, queries, k=5, dim=DIM)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank"]


def test_ann_topk_dim_mismatch_raises(planted):
    df, _ = planted
    queries = df.where(F.col("vec_id") < 3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim"):
        ann_topk(df, queries, k=5, dim=32)


def test_cosine_dup_pairs_lsh_is_distributed(planted, monkeypatch):
    """The lsh strategy must never materialize the corpus on the driver
    (round-1 VERDICT "what's wrong" #3).  The round-2 code-review found
    the original gate vacuous: it patched the abstract
    pyspark.sql.DataFrame while real instances are the classic subclass
    (which overrides collect), AND the path legitimately runs one TINY
    driver action (the skew-detection aggregate).  The real property:
    every collect during construction+execution is (a) far smaller than
    the corpus and (b) free of embedding columns."""
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    df, vecs = planted
    n_corpus = len(vecs)
    real_collect = ClassicDF.collect
    seen: list[tuple[int, list]] = []

    def spying(self):
        rows = real_collect(self)
        seen.append((len(rows), list(self.columns)))
        return rows

    monkeypatch.setattr(ClassicDF, "collect", spying)
    try:
        pairs = cosine_dup_pairs(df, 0.95, strategy="lsh", dim=DIM)
        pairs_count = pairs.count()  # full execution under the spy
    finally:
        monkeypatch.setattr(ClassicDF, "collect", real_collect)

    for n_rows, cols in seen:
        assert n_rows < n_corpus / 2, (n_rows, cols)  # never corpus-sized
        assert not any("emb" in c for c in cols), cols  # never the vectors

    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert pairs_count == len(got)
    sims = _true_sims(vecs)
    # precision is exact: every returned pair truly clears the threshold
    for a, b in got:
        assert round(sims[a, b], 9) >= 0.95, (a, b, sims[a, b])
    # recall on the planted cos>0.99 dups (within the lsh guarantee ball)
    planted_pairs = {
        (i, 300 + i) for i in range(40) if round(sims[i, 300 + i], 9) >= 0.95
    }
    found = len(planted_pairs & got) / max(1, len(planted_pairs))
    assert found >= 0.9, f"lsh recall on planted dups {found:.2f}"


def test_zero_norm_and_null_embeddings_are_harmless(spark, planted):
    """A zero vector has cosine 0 to everything (never NaN — Spark
    would rank NaN first and pass every threshold), and NULL embedding
    rows are excluded rather than crashing np.stack in the UDFs."""
    df, vecs = planted
    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.array([9000, 9001, 9002], dtype=np.int64),
                "embedding": [
                    np.zeros(DIM, dtype=np.float32),
                    None,
                    # NaN COMPONENT, non-zero norm: the JVM cosine must
                    # define sim=0.0 (nanvl), matching numpy's exclusion
                    np.where(np.arange(DIM) == 0, np.nan, 1.0).astype(
                        np.float32
                    ),
                ],
            }
        ),
        schema=df.schema,
    )
    poisoned = df.unionByName(extra)

    queries = poisoned.where(F.col("vec_id") < 3)
    top = brute_force_topk(poisoned, queries, k=5)
    bad = (9000, 9001, 9002)
    assert not any(r["neighbor_id"] in bad for r in top.collect())

    # the zero/null/NaN rows must not appear in dup pairs at any threshold
    pairs = cosine_dup_pairs(poisoned, 0.5, strategy="exact").collect()
    assert not any(set(bad) & {r["a"], r["b"]} for r in pairs)
    pairs_lsh = cosine_dup_pairs(poisoned, 0.95, strategy="lsh").collect()
    assert not any(set(bad) & {r["a"], r["b"]} for r in pairs_lsh)

    # a zero-norm QUERY ranks real rows deterministically (all sims 0)
    zq = ann_topk(poisoned, poisoned.where(F.col("vec_id") == 9000), k=3)
    got = zq.collect()
    assert all(np.isfinite(r["rank"]) for r in got)


def test_cosine_dup_pairs_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert cosine_dup_pairs(empty, 0.9).collect() == []


def test_lsh_dim_mismatch_raises_clearly(spark):
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(4, dtype=np.int64),
                "embedding": [np.ones(16, dtype=np.float32)] * 4,
            }
        )
    )
    with pytest.raises(Exception, match="configured dim"):
        cosine_dup_pairs(bad, 0.9, strategy="lsh").collect()


def test_round_half_up_matches_spark_round(spark):
    """The exact path's rounding must agree with F.round (HALF_UP) at
    the boundary — np.round is half-to-even and can flip a threshold
    decision between the two strategies."""
    from dude_spark.functions.embedding import _round_half_up

    vals = [1.2345678905, -1.2345678905, 0.0000000005, -0.0000000005, 0.25]
    got = _round_half_up(np.array(vals)).tolist()
    exp = (
        spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round(F.col("x"), 9).alias("r"))
        .collect()
    )
    assert got == pytest.approx([r["r"] for r in exp], abs=1e-15)


# ------------------------------------------------- centroid similarity

class TestCentroidSimilarity:
    def _df(self, spark, rows):
        pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
        return spark.createDataFrame(pdf).select(
            "vec_id", F.col("embedding").cast("array<float>"), "label"
        )

    def test_matches_python_replay_seeded(self, spark):
        import math

        rng = np.random.RandomState(42)
        rows = [
            (i, rng.uniform(-0.6, 0.6, 16).astype(np.float32).tolist(),
             int(i % 3))
            for i in range(90)
        ]
        from dude_spark.functions.embedding import centroid_similarity

        got = {
            r["vec_id"]: r["sim_x1000"]
            for r in centroid_similarity(self._df(spark, rows)).collect()
        }
        q = {
            vid: [math.floor(float(np.float32(x)) * 10000.0) for x in vec]
            for vid, vec, _ in rows
        }
        cent: dict[int, list[int]] = {}
        for vid, _, g in rows:
            c = cent.setdefault(g, [0] * 16)
            cent[g] = [a + b for a, b in zip(c, q[vid])]
        want = {}
        for vid, _, g in rows:
            s = cent[g]
            dot = sum(a * b for a, b in zip(q[vid], s))
            na2 = sum(a * a for a in q[vid])
            ns2 = sum(b * b for b in s)
            want[vid] = (
                0 if na2 == 0 or ns2 == 0
                else math.floor(
                    float(1000 * dot) / (math.sqrt(float(na2)) * math.sqrt(float(ns2)))
                )
            )
        assert got == want

    def test_negated_member_is_group_minimum(self, spark):
        rng = np.random.RandomState(7)
        base = rng.uniform(0.1, 0.5, 8).astype(np.float32)
        rows = [
            (i, (base + rng.uniform(-0.05, 0.05, 8).astype(np.float32)).tolist(), 0)
            for i in range(20)
        ]
        rows.append((99, (-base).tolist(), 0))
        from dude_spark.functions.embedding import centroid_similarity

        got = {
            r["vec_id"]: r["sim_x1000"]
            for r in centroid_similarity(self._df(spark, rows)).collect()
        }
        assert got[99] == min(got.values()) and got[99] < 0
        assert all(v > 800 for k, v in got.items() if k != 99)

    def test_zero_vector_sim_zero(self, spark):
        rows = [
            (1, [0.0] * 4, 0),
            (2, [0.5, 0.5, 0.0, 0.0], 0),
        ]
        from dude_spark.functions.embedding import centroid_similarity

        got = {
            r["vec_id"]: r["sim_x1000"]
            for r in centroid_similarity(self._df(spark, rows)).collect()
        }
        assert got[1] == 0 and got[2] > 900

    def test_null_embedding_excluded_and_scale_validated(self, spark):
        from dude_spark.functions.embedding import centroid_similarity

        pdf = pd.DataFrame(
            {"vec_id": [1, 2], "embedding": [[0.1, 0.2], None], "label": [0, 0]}
        )
        df = spark.createDataFrame(pdf).select(
            "vec_id", F.col("embedding").cast("array<float>"), "label"
        )
        assert [r["vec_id"] for r in centroid_similarity(df).collect()] == [1]
        with pytest.raises(ValueError, match="scale"):
            centroid_similarity(df, scale=0)

    def test_nan_component_quantizes_to_zero(self, spark):
        """A NaN embedding component must not poison the ANSI cast
        (floor(NaN)->long errors the whole job); nanvl maps it to 0,
        matching clustering.quantized's convention.  Row 1's NaN'd
        vector therefore scores exactly like the zero-padded vector
        row 3 carries explicitly."""
        from dude_spark.functions.embedding import centroid_similarity

        rows = [
            (1, [float("nan"), 0.4], 0),
            (2, [0.3, 0.1], 0),
            (3, [0.0, 0.4], 1),
            (4, [0.3, 0.1], 1),
        ]
        # build WITHOUT pandas: the Arrow path rewrites NaN -> null,
        # which is a different degenerate case than the one under test
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label long"
        )
        got = {
            r["vec_id"]: r["sim_x1000"]
            for r in centroid_similarity(df).collect()
        }
        assert set(got) == {1, 2, 3, 4}
        assert got[1] == got[3] and got[2] == got[4]

    def test_null_group_rows_vanish(self, spark):
        """NULL group key never matches the centroid equi-join — the
        row is dropped, per the documented degenerate-input contract."""
        from dude_spark.functions.embedding import centroid_similarity

        pdf = pd.DataFrame(
            {"vec_id": [1, 2], "embedding": [[0.1, 0.2], [0.1, 0.2]],
             "label": [0.0, None]}
        )
        df = spark.createDataFrame(pdf).select(
            "vec_id", F.col("embedding").cast("array<float>"),
            F.col("label").cast("long").alias("label"),
        )
        assert [r["vec_id"] for r in centroid_similarity(df).collect()] == [1]

    def test_centroid_join_is_broadcast(self, spark):
        from dude_spark.functions.embedding import centroid_similarity

        rows = [(i, [0.1, 0.2], int(i % 2)) for i in range(8)]
        plan = (
            centroid_similarity(self._df(spark, rows))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    def test_huge_group_sums_use_wide_accumulators(self, spark):
        """Overflow regime for the centroid sums: at scale=1e9 a
        30-member group's centroid components square past int64
        (S_i^2 ~ 2e20) — the decimal accumulators (HUGEINT in the
        oracle twin) must still match the Python-bigint replay
        exactly instead of raising ANSI overflow."""
        import math

        rng = np.random.RandomState(41)
        SC = 1_000_000_000
        rows = [
            (i, rng.uniform(0.2, 0.5, 8).astype(np.float32).tolist(), 0)
            for i in range(30)
        ]
        from dude_spark.functions.embedding import centroid_similarity

        got = {
            r["vec_id"]: r["sim_x1000"]
            for r in centroid_similarity(
                self._df(spark, rows), scale=SC
            ).collect()
        }
        q = {
            vid: [math.floor(float(np.float32(x)) * SC) for x in vec]
            for vid, vec, _ in rows
        }
        S = [0] * 8
        for vid in q:
            S = [a + b for a, b in zip(S, q[vid])]
        ns2 = sum(v * v for v in S)
        assert ns2 > 2**63  # the regime this test exists for
        want = {}
        for vid in q:
            dot = sum(a * b for a, b in zip(q[vid], S))
            na2 = sum(a * a for a in q[vid])
            want[vid] = math.floor(
                (float(dot) * 1000.0)
                / (math.sqrt(float(na2)) * math.sqrt(float(ns2)))
            )
        assert got == want
