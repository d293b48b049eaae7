"""PII detection and redaction — the privacy-scrub curation stage.

Every production LLM corpus pipeline scrubs personally identifying
strings before training (emails, phone numbers, IP addresses are the
canonical trio).  This module detects and redacts them as pure JVM
``regexp`` Column expressions — whole-stage codegen over the scan, zero
shuffle, zero Python — so at 10^12 rows the scrub costs one map pass,
exactly like operators/filters.py.

Cross-engine exactness contract: the patterns use only the regex
subset with IDENTICAL semantics in Java regex (Spark) and RE2 (the
DuckDB oracle) — ASCII ``\\d``/``\\b``, explicit character classes,
bounded quantifiers, no lookaround, no backreferences.  RE2 implements
Perl leftmost-first matching for this subset, so match sets (and
therefore counts and replacements) agree byte-for-byte; the driver
query ``pii_counts`` hashes counts AND an md5 of the redacted text
against DuckDB to pin that claim.

Semantics:
  pii_signals   per-type match counts over the ORIGINAL text (a phone
                digit-run inside an email still counts as a phone —
                counts describe what detection saw, not what the
                sequential redaction removed).
  redact_text   sequential replace email -> phone -> ip with
                <EMAIL>/<PHONE>/<IP> placeholders; order is part of
                the contract (earlier redactions can consume text a
                later pattern would have matched).
  scrub_pii     (scrubbed, audit): scrubbed keeps the input schema
                with the text column rewritten; audit lists every
                touched doc with its per-type counts — the same
                no-silent-mutation rule as filter_corpus/decontaminate.

Reference analogue: none in DuDe (files are never content-rewritten);
the stage follows the public corpus-curation recipes (Dolma, FineWeb)
with deliberately simple, auditable patterns — swap in stricter ones
per deployment, the plumbing is pattern-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Single source of truth for the patterns — __spark_entry__'s DuckDB
# oracle embeds these same strings, so the two engines cannot drift.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "(\\+\\d{1,2}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}\\b"
IP_RE = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

# (name, pattern, placeholder) in redaction order
PII_KINDS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IP_RE, "<IP>"),
)


def pii_signals(text: Column) -> list[tuple[str, Column]]:
    """[(n_emails, col), (n_phones, col), (n_ips, col)] — non-overlapping
    match counts per type over the original text; NULL text counts 0."""
    return [
        (
            f"n_{name}s",
            F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0)),
        )
        for name, pat, _ in PII_KINDS
    ]


def redact_text(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder token,
    applied in PII_KINDS order.  NULL stays NULL (nothing to scrub)."""
    out = text
    for _, pat, token in PII_KINDS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii(
    docs: DataFrame, text_col: str = "caption", id_col: str = "image_id"
) -> tuple[DataFrame, DataFrame]:
    """(scrubbed, audit): ``scrubbed`` is the input with ``text_col``
    redacted in place (schema otherwise unchanged, untouched rows
    byte-identical); ``audit`` is one row per touched document —
    (id, n_emails, n_phones, n_ips) — so no rewrite is ever silent.

    Both outputs are plain codegen maps/filters over the scan; writing
    both re-reads the input twice (two cheap map-only passes — the
    filter_corpus cost model)."""
    t = F.col(text_col)
    sigs = pii_signals(t)
    scrubbed = docs.withColumn(text_col, redact_text(t))
    touched = sigs[0][1] + sigs[1][1] + sigs[2][1] > 0
    audit = docs.where(touched).select(
        F.col(id_col), *[c.alias(name) for name, c in sigs]
    )
    return scrubbed, audit
