"""PII detection/redaction (operators/pii.py).

Gates: redaction/count semantics over a mixed fixture, the
no-silent-mutation audit contract (touched docs only, untouched rows
byte-identical), NULL handling, pure-codegen plan (no shuffle, no
Python), and cross-engine md5/count agreement vs DuckDB — the driver
oracle's mechanism, run here over adversarial strings the corpus
doesn't contain (pathological digit runs, over-octet fake IPs).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dude_spark.operators.pii import (
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    pii_signals,
    redact_text,
    scrub_pii,
)

ROWS = [
    ("1", "Contact alice@example.com or call +1 555-123-4567 now."),
    ("2", "server 10.0.0.1 and 8.8.8.8 respond"),
    ("3", "no pii at all here"),
    ("4", "digits 123456789012 run"),          # digit run = phone by regex
    ("5", "999.999.999.999 over-octet"),       # still ip-shaped: redacted
    ("6", "v1.2.3.4000 trailing digits"),      # NOT ip (4000 breaks \b{1,3})
    ("7", None),
    ("8", ""),
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["image_id", "caption"]),
        "image_id string, caption string",
    )


def test_redact_and_counts(spark):
    got = {
        r["image_id"]: r
        for r in _df(spark)
        .select(
            "image_id",
            redact_text(F.col("caption")).alias("red"),
            *[c.alias(n) for n, c in pii_signals(F.col("caption"))],
        )
        .collect()
    }
    assert got["1"]["red"] == "Contact <EMAIL> or call <PHONE> now."
    assert (got["1"]["n_emails"], got["1"]["n_phones"], got["1"]["n_ips"]) == (1, 1, 0)
    assert got["2"]["red"] == "server <IP> and <IP> respond"
    assert got["2"]["n_ips"] == 2
    assert got["3"]["red"] == "no pii at all here"
    assert got["4"]["n_phones"] == 1  # documented: digit runs match
    assert got["5"]["n_ips"] == 1  # octet-range validation is out of scope
    assert got["6"]["n_ips"] == 0
    assert got["7"]["red"] is None and got["7"]["n_emails"] == 0
    assert got["8"]["red"] == ""


def test_scrub_contract(spark):
    docs = _df(spark)
    scrubbed, audit = scrub_pii(docs)
    assert scrubbed.columns == docs.columns
    s = {r["image_id"]: r["caption"] for r in scrubbed.collect()}
    # untouched rows byte-identical
    assert s["3"] == "no pii at all here"
    assert s["7"] is None and s["8"] == ""
    assert "<EMAIL>" in s["1"] and "<IP>" in s["2"]
    # audit lists exactly the touched docs with their counts
    a = {r["image_id"]: r for r in audit.collect()}
    assert set(a) == {"1", "2", "4", "5"}
    assert a["2"]["n_ips"] == 2 and a["1"]["n_emails"] == 1


def test_pii_plan_pure_codegen(spark):
    scrubbed, audit = scrub_pii(_df(spark))
    for df in (scrubbed, audit):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


def test_cross_engine_agreement(spark):
    """Same counts and same redacted bytes in DuckDB (RE2) — the
    driver-gate mechanism over strings chosen to stress the subset."""
    pdf = pd.DataFrame(
        [(i, t) for i, (_, t) in enumerate(ROWS) if t is not None]
        + [
            (100, "bob123456789012@x.co mixed"),
            (101, "(555) 123 4567 parens"),
            (102, "unicode αβγ 中文 +49 123-456-7890"),
            (103, "double alice@x.com bob@y.org 9.9.9.9"),
        ],
        columns=["i", "t"],
    )
    sdf = spark.createDataFrame(pdf, "i long, t string")
    got = (
        sdf.select(
            "i",
            *[c.alias(n) for n, c in pii_signals(F.col("t"))],
            F.md5(F.encode(redact_text(F.col("t")), "UTF-8")).alias("fp"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("v", pdf)
    ora = con.sql(
        f"""SELECT i,
              len(regexp_extract_all(t, '{EMAIL_RE}')) AS e,
              len(regexp_extract_all(t, '{PHONE_RE}')) AS p,
              len(regexp_extract_all(t, '{IP_RE}')) AS n,
              md5(regexp_replace(regexp_replace(regexp_replace(t,
                  '{EMAIL_RE}', '<EMAIL>', 'g'),
                  '{PHONE_RE}', '<PHONE>', 'g'),
                  '{IP_RE}', '<IP>', 'g')) AS fp
            FROM v ORDER BY i"""
    ).fetchall()
    assert [
        (r["i"], r["n_emails"], r["n_phones"], r["n_ips"], r["fp"]) for r in got
    ] == ora
