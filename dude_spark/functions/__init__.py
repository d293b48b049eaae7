"""Scalar/column function library (text analysis, embeddings).

The reference has no scalar function surface (SURVEY.md §2.3 — only
filepath.Base and RFC3339 formatting); everything here comes from the
north-star's training-data-pipeline scope: language ID, quality
scoring, token counting, document fingerprinting, embedding
similarity.  All hot-path functions are JVM-side Column expressions
(whole-stage codegen) — no Python UDFs.
"""
