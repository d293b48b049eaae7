"""Deterministic hash splits/sampling (functions/splits.py).

The contract the reference never needed (its "split" is source
directory membership, main.go): assignments keyed on row IDENTITY so
they survive re-runs, repartitioning, and corpus growth.  Gates:
coverage + distribution, invariance under repartitioning and appends,
sample monotonicity, pure-codegen plan (no UDF, no shuffle), and
cross-engine md5 agreement vs DuckDB (the driver oracle's mechanism).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from dude_spark.functions.splits import (
    deterministic_sample,
    hash_split,
    split_boundaries,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_split_covers_and_distributes(images_df):
    out = hash_split(images_df).select("image_id", "split").collect()
    assert len(out) == images_df.count()
    names = {r.split for r in out}
    assert names <= {"train", "val", "test"}
    n = len(out)
    train_frac = sum(r.split == "train" for r in out) / n
    assert 0.7 < train_frac < 0.9  # 600 rows, p=0.8: ±5σ ≈ ±0.082


def test_split_stable_under_repartition_and_append(images_df):
    base = {
        r.image_id: r.split
        for r in hash_split(images_df.repartition(1)).select("image_id", "split").collect()
    }
    shuffled = {
        r.image_id: r.split
        for r in hash_split(images_df.repartition(7)).select("image_id", "split").collect()
    }
    assert base == shuffled
    # append-invariance: a subset corpus assigns the same splits
    sub = images_df.limit(100)
    sub_map = {
        r.image_id: r.split
        for r in hash_split(sub).select("image_id", "split").collect()
    }
    assert all(base[k] == v for k, v in sub_map.items())


def test_sample_monotone_and_deterministic(images_df):
    kept20 = {r.image_id for r in deterministic_sample(images_df, 0.2).select("image_id").collect()}
    kept50 = {r.image_id for r in deterministic_sample(images_df, 0.5).select("image_id").collect()}
    kept20_again = {
        r.image_id
        for r in deterministic_sample(images_df.repartition(5), 0.2).select("image_id").collect()
    }
    assert kept20 == kept20_again
    assert kept20 <= kept50  # same seed: growing frac only adds rows
    n = images_df.count()
    assert 0.1 * n < len(kept20) < 0.3 * n
    assert deterministic_sample(images_df, 0.0).count() == 0
    assert deterministic_sample(images_df, 1.0).count() == n
    # frac<1 whose float product rounds to the full 2^32 span: must
    # keep everything, not emit a 9-char bound that keeps ~1/16
    assert deterministic_sample(images_df, 1 - 2**-53).count() == n


def test_split_plan_pure_codegen(images_df):
    """The op must stay a free map over the scan: no shuffle, no
    Python worker — at 10^12 rows anything else is a new job stage."""
    plan = _plan(hash_split(images_df).select("image_id", "split"))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # neither Batch- nor ArrowEvalPython
    plan_s = _plan(deterministic_sample(images_df, 0.25).select("image_id"))
    assert "Exchange" not in plan_s
    assert "EvalPython" not in plan_s


def test_split_matches_duckdb(spark):
    """Cross-engine determinism: the same hex literals yield the same
    assignment in DuckDB — the mechanism the driver oracle relies on."""
    ids = [(str(i),) for i in range(200)]
    df = spark.createDataFrame(ids, "image_id string")
    got = {r.image_id: r.split for r in hash_split(df).collect()}
    bounds = split_boundaries({"train": 0.8, "val": 0.1, "test": 0.1})
    assert bounds == [("train", "cccccccc"), ("val", "e6666666"), ("test", "g")]
    con = duckdb.connect()
    want = dict(
        con.execute(
            """
            SELECT CAST(i AS VARCHAR),
              CASE
                WHEN substring(md5('split:' || CAST(i AS VARCHAR)), 1, 8)
                     < 'cccccccc' THEN 'train'
                WHEN substring(md5('split:' || CAST(i AS VARCHAR)), 1, 8)
                     < 'e6666666' THEN 'val'
                ELSE 'test'
              END
            FROM range(200) t(i)
            """
        ).fetchall()
    )
    assert got == want


def test_split_boundaries_validation():
    with pytest.raises(ValueError, match="at least one"):
        split_boundaries({})
    with pytest.raises(ValueError, match="positive"):
        split_boundaries({"a": 0.5, "b": -0.5, "c": 1.0})
    with pytest.raises(ValueError, match="sum to 1"):
        split_boundaries({"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match="frac"):
        deterministic_sample(None, 1.5)


def test_stratified_sample_equals_per_stratum_deterministic(spark):
    """Per stratum, the kept set IS deterministic_sample of that
    stratum at the same (frac, seed); unlisted strata are dropped
    (sampleBy semantics); frac=1.0 keeps the stratum whole."""
    from dude_spark.functions.splits import stratified_sample

    rows = [(i, ["en", "de", "el", "zh"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.5, "de": 1.0, "el": 0.25}
    got = stratified_sample(df, fr, strata_col="lang", id_col="doc_id")
    by_lang = {
        lang: {r["doc_id"] for r in got.where(F.col("lang") == lang).collect()}
        for lang in ("en", "de", "el", "zh")
    }
    assert by_lang["zh"] == set()  # unlisted: dropped
    assert by_lang["de"] == {i for i in range(400) if i % 4 == 1}  # whole
    for lang in ("en", "el"):
        want = {
            r["doc_id"]
            for r in deterministic_sample(
                df.where(F.col("lang") == lang), fr[lang], id_col="doc_id"
            ).collect()
        }
        assert by_lang[lang] == want
    # monotone per stratum: raising en's fraction only adds rows
    bigger = {
        r["doc_id"]
        for r in stratified_sample(
            df, {"en": 0.9}, strata_col="lang", id_col="doc_id"
        ).collect()
    }
    assert by_lang["en"] <= bigger


def test_stratified_sample_plan_and_validation(spark):
    from dude_spark.functions.splits import stratified_sample

    df = spark.createDataFrame(
        [(1, "en")], "doc_id long, lang string"
    )
    with pytest.raises(ValueError, match="at least one stratum"):
        stratified_sample(df, {}, strata_col="lang", id_col="doc_id")
    with pytest.raises(ValueError, match="frac"):
        stratified_sample(df, {"en": 1.5}, strata_col="lang", id_col="doc_id")
    plan = _plan(
        stratified_sample(df, {"en": 0.5}, strata_col="lang", id_col="doc_id")
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_mix_fractions_math_and_validation():
    """Binding stratum kept whole; output mixture is exact; bad
    weights/missing strata raise."""
    from dude_spark.functions.splits import mix_fractions

    totals = {"en": 8000, "de": 900, "fr": 1100}
    fr = mix_fractions(totals, {"en": 0.5, "de": 0.3, "fr": 0.2})
    # de binds: 900/0.3 = 3000 is the smallest achievable output mass
    assert fr["de"] == 1.0
    kept = {d: totals[d] * fr[d] for d in fr}
    n = sum(kept.values())
    assert abs(kept["en"] / n - 0.5) < 1e-12
    assert abs(kept["fr"] / n - 0.2) < 1e-12
    with pytest.raises(ValueError, match="sum to 1"):
        mix_fractions(totals, {"en": 0.5, "de": 0.4})
    with pytest.raises(ValueError, match="positive"):
        mix_fractions(totals, {"en": 1.5, "de": -0.5})
    with pytest.raises(ValueError, match="no mass"):
        mix_fractions({"en": 10}, {"en": 0.5, "xx": 0.5})
    with pytest.raises(ValueError, match="no mass"):
        mix_fractions({"en": 10, "xx": 0}, {"en": 0.5, "xx": 0.5})


def test_mix_corpus_token_weighted(spark):
    """mix_corpus == stratified_sample at the derived fractions; the
    binding stratum survives whole; unlisted strata are dropped;
    realized token mixture lands near the target."""
    from dude_spark.functions.splits import mix_corpus, stratified_sample

    # en-heavy corpus: 600 en docs of 10 tokens, 60 de of 20, 80 fr of 5
    rows = (
        [(i, "en", 10) for i in range(600)]
        + [(1000 + i, "de", 20) for i in range(60)]
        + [(2000 + i, "fr", 5) for i in range(80)]
        + [(3000 + i, "zh", 7) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    mixed, fractions = mix_corpus(
        df, {"en": 0.6, "de": 0.3, "fr": 0.1},
        strata_col="lang", id_col="doc_id", weight_col="toks",
    )
    got = mixed.collect()
    langs = {r["lang"] for r in got}
    assert "zh" not in langs  # unlisted: dropped
    # fr binds: 400 tokens / 0.1 = 4000 target mass (en 6000, de 4000 tie
    # broken by de==fr at 4000 — both achievable whole)
    assert fractions["fr"] == 1.0
    # equality with stratified_sample at the same fractions + seed
    want = {
        r["doc_id"]
        for r in stratified_sample(
            df, fractions, strata_col="lang", id_col="doc_id", seed="mix"
        ).collect()
    }
    assert {r["doc_id"] for r in got} == want
    # realized token mixture ~ target (hash sampling: expectation only)
    mass = {
        lang: sum(r["toks"] for r in got if r["lang"] == lang)
        for lang in ("en", "de", "fr")
    }
    n = sum(mass.values())
    for lang, target in (("en", 0.6), ("de", 0.3), ("fr", 0.1)):
        assert abs(mass[lang] / n - target) < 0.08, (lang, mass, n)


def test_mix_corpus_doc_weighted_plan(spark):
    """weight_col=None measures mass in rows; the sampling pass itself
    stays pure codegen (no Python, no exchange below the filter)."""
    from dude_spark.functions.splits import mix_corpus

    rows = [(i, ["en", "de"][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    mixed, fractions = mix_corpus(
        df, {"en": 0.5, "de": 0.5}, strata_col="lang", id_col="doc_id"
    )
    assert set(fractions) == {"en", "de"}
    assert max(fractions.values()) == 1.0
    plan = _plan(mixed)
    assert "EvalPython" not in plan
    # the mixed frame is filter-over-scan: no exchange at all
    assert "Exchange" not in plan


def test_mix_plan_math_and_degenerate():
    from dude_spark.functions.splits import mix_fractions, mix_plan

    totals = {"a": 1000, "b": 100}
    plan = mix_plan(totals, {"a": 0.5, "b": 0.5}, max_repeat=4)
    # b binds at 4x: N = min(1000*4/.5, 100*4/.5) = 800; m = 400 each
    assert plan["b"] == (4, 1.0)
    rep_a, f_a = plan["a"]
    assert rep_a == 1 and abs(f_a - 0.4) < 1e-12
    # realized mixture is exact in expectation: totals * rep * frac
    mass = {d: totals[d] * r * f for d, (r, f) in plan.items()}
    n = sum(mass.values())
    assert abs(mass["a"] / n - 0.5) < 1e-12
    # max_repeat=1 degenerates to exactly mix_fractions
    fr = mix_fractions(totals, {"a": 0.5, "b": 0.5})
    assert mix_plan(totals, {"a": 0.5, "b": 0.5}, max_repeat=1) == {
        d: (1, f) for d, f in fr.items()
    }
    with pytest.raises(ValueError, match="max_repeat"):
        mix_plan(totals, {"a": 1.0}, max_repeat=0)


def test_mix_corpus_epochs_exact_kept_set(spark):
    """Epoch upsampling: the kept (doc, epoch) set equals a hashlib
    replication of the rule; binding stratum repeats at max and keeps
    every copy; epochs of a fractional stratum sample independently;
    unlisted strata drop."""
    import hashlib

    from dude_spark.functions.splits import fraction_bound, mix_corpus_epochs

    rows = (
        [(i, "en", 10) for i in range(600)]
        + [(1000 + i, "de", 7) for i in range(50)]
        + [(2000 + i, "fr", 5) for i in range(40)]
        + [(3000 + i, "zh", 9) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    mixed, plan = mix_corpus_epochs(
        df, {"en": 0.4, "de": 0.4, "fr": 0.2},
        strata_col="lang", id_col="doc_id", weight_col="toks",
        seed="s", max_repeat=3,
    )
    # de binds at 3x: N = min(6000*3/.4, 350*3/.4, 200*3/.2) = 2625
    assert plan["de"] == (3, 1.0)
    assert plan["en"][0] == 1 and abs(plan["en"][1] - 1050 / 6000) < 1e-12
    assert plan["fr"][0] == 3 and 0 < plan["fr"][1] < 1
    got = {(r["doc_id"], r["epoch"]) for r in mixed.collect()}
    want = set()
    for d, lang, _ in rows:
        if lang not in plan:
            continue
        rep, frac = plan[lang]
        bound = fraction_bound(frac)
        for e in range(1, rep + 1):
            h = hashlib.md5(f"s@{e}:{d}".encode()).hexdigest()[:8]
            if bound == "g" or h < bound:
                want.add((d, e))
    assert got == want
    assert not any(3000 <= d < 3020 for d, _ in got)  # zh: dropped
    # fr's three epochs are INDEPENDENT samples, not three copies of one
    fr_epochs = [
        {d for d, e in got if 2000 <= d < 2040 and e == k} for k in (1, 2, 3)
    ]
    assert fr_epochs[0] != fr_epochs[1] or fr_epochs[1] != fr_epochs[2]


def test_weighted_sample_matches_bruteforce(spark):
    """Membership == the literal per-row predicate: md5-u32(key) <
    floor(clamp(w) * 2^32), replayed in Python — covering the clamp
    branches (negative, zero, >1), the NULL-drop contract, and
    fractional weights."""
    import hashlib

    from dude_spark.functions.splits import weighted_sample

    weights = [None, -0.2, 0.0, 0.05, 0.3, 0.5, 0.77, 1.0, 1.5,
               float("nan")]
    rows = [(str(i), weights[i % len(weights)]) for i in range(600)]
    df = spark.createDataFrame(rows, "image_id string, w double")
    kept = {r["image_id"] for r in weighted_sample(df, "w").collect()}
    span = 16**8
    want = set()
    for i, w in rows:
        if w is None or w != w:  # NULL and NaN both drop
            continue
        scaled = math.floor(w * span)
        if scaled >= span:
            want.add(i)
        elif scaled > 0 and int(
            hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:8], 16
        ) < scaled:
            want.add(i)
    assert kept == want
    assert want  # the fixture keeps a non-trivial subset
    # w >= 1 rows are ALL kept (the 'g' branch), w <= 0 rows all dropped
    assert all(i in kept for i, w in rows if w is not None and w >= 1.0)
    assert all(i not in kept for i, w in rows if w is not None and w <= 0.0)


def test_weighted_sample_monotone_and_pure_plan(spark):
    """Raising every weight only ADDS rows (the re-scoring contract),
    and the op stays a zero-shuffle codegen filter like the rest of
    the module."""
    from dude_spark.functions.splits import weighted_sample

    rows = [(str(i), ((i * 31) % 100) / 100.0) for i in range(400)]
    df = spark.createDataFrame(rows, "image_id string, w double")
    lo = {r["image_id"] for r in weighted_sample(df, "w").collect()}
    hi = {
        r["image_id"]
        for r in weighted_sample(
            df, F.least(F.lit(1.0), F.col("w") + F.lit(0.25))
        ).collect()
    }
    assert lo <= hi and len(hi) > len(lo)
    plan = _plan(weighted_sample(df, "w"))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_weighted_sample_null_id_keep_all_branch(spark):
    """weight >= 1 means keep-probability 1 EVEN for NULL-id rows
    (deterministic_sample's frac==1.0 early-return, per row); a
    sub-1 weight with no identity still drops (no stable assignment)."""
    from dude_spark.functions.splits import weighted_sample

    df = spark.createDataFrame(
        [(None, 1.0), (None, 1.5), (None, 0.999), ("x", 1.0)],
        "image_id string, w double",
    )
    kept = {(r["image_id"], r["w"]) for r in weighted_sample(df, "w").collect()}
    assert kept == {(None, 1.0), (None, 1.5), ("x", 1.0)}
