"""D0 exact detector end-to-end vs. the pure-pandas DuDe-semantics oracle.

Ports the reference e2e assertions (SURVEY.md §5): with-dups exact
counts, all-unique → empty report, content-not-caption drives equality
(same-caption ignored, NFC/NFD captions with equal bytes ARE dups),
degenerate rows never fail the run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dude_spark import oracle
from dude_spark.detectors.exact import exact_buckets
from dude_spark.fixtures import IMAGES_COLUMNS, expected_pairs, generate_pdf
from dude_spark.operators.candidates import pairs_from_buckets
from dude_spark.operators.components import connected_components
from dude_spark.operators.report import assignments_to_report, flatten_pairs
from dude_spark.operators.verify import verify_exact


def run_exact(images_df, bucket_cap=64, paranoid=True):
    buckets = exact_buckets(images_df)
    pairs, overcap = pairs_from_buckets(buckets, bucket_cap)
    if paranoid:
        pairs = verify_exact(pairs, images_df)
    return connected_components(pairs)


def test_exact_matches_oracle(images_df, fixture_pdf):
    assignments = run_exact(images_df).toPandas()
    ora = oracle.exact_groups(fixture_pdf[IMAGES_COLUMNS])
    got = oracle.all_pairs(assignments)
    want = oracle.all_pairs(ora)
    assert got == want
    # cluster labels identical too (both are component minima)
    got_map = dict(zip(assignments.image_id, assignments.cluster_id))
    want_map = dict(zip(ora.image_id, ora.cluster_id))
    assert got_map == want_map


def test_exact_covers_planted_groups(images_df, truth_pdf):
    assignments = run_exact(images_df).toPandas()
    got = oracle.all_pairs(assignments)
    # exact groups, hot block (identical bytes), unicode (equal bytes,
    # different captions — content drives equality,
    # dual_folder_test.go:1083-1128) must all be found
    want = expected_pairs(truth_pdf, {"exact", "hot", "unicode"})
    assert want <= got
    # near/same-caption populations have distinct bytes — never reported
    forbidden = expected_pairs(
        truth_pdf, {"near_caption", "substring", "collision", "same_caption"}
    )
    assert not (forbidden & got)


def test_all_unique_empty_report(spark):
    pdf = generate_pdf(40)  # n < 20 threshold → everything unique-ish
    uniq = pdf[pdf.truth_kind == "unique"][IMAGES_COLUMNS]
    df = spark.createDataFrame(uniq)
    assignments = run_exact(df)
    assert assignments.count() == 0
    report = assignments_to_report(assignments, df)
    assert report.count() == 0


def test_star_fallback_equivalent(images_df, fixture_pdf):
    """bucket_cap=2 forces star edges everywhere; clusters must not change."""
    a_full = run_exact(images_df, bucket_cap=10**6).toPandas()
    a_star = run_exact(images_df, bucket_cap=2).toPandas()
    assert oracle.all_pairs(a_full) == oracle.all_pairs(a_star)


def test_overcap_buckets_reported(images_df):
    buckets = exact_buckets(images_df)
    _, overcap = pairs_from_buckets(buckets, bucket_cap=3)
    oc = overcap.toPandas()
    # hot block (10 identical rows) and size-4/5 exact groups exceed cap 3
    assert (oc.bucket_size > 3).all()
    assert oc.bucket_size.max() >= 6  # the hot block


def test_report_and_flatten(images_df):
    assignments = run_exact(images_df)
    report = assignments_to_report(assignments, images_df).toPandas()
    n_dups = assignments.where(F.col("image_id") != F.col("cluster_id")).count()
    assert len(report) == n_dups
    assert set(report.columns) == {
        "image_id", "caption", "dup_image_id", "dup_caption", "cluster_id"
    }
    assert (report.image_id == report.cluster_id).all()
    pairs = flatten_pairs(assignments).toPandas()
    assert len(pairs) == n_dups
    assert (pairs.a < pairs.b).all()  # rep is the minimum


def test_degenerate_rows_do_not_fail(spark):
    pdf = generate_pdf(600)
    deg = pdf[pdf.truth_kind == "degenerate"]
    assert len(deg) == 4  # incl. undecodable + empty bytes
    df = spark.createDataFrame(pd.concat([deg, pdf.head(30)])[IMAGES_COLUMNS])
    run_exact(df).count()  # must not raise
