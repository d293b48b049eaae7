"""Detector registry.

Each detector maps the `images` DataFrame to a `buckets` DataFrame
`(image_id string, bucket string)` — possibly many buckets per row
(LSH bands, SimHash segments).  Rows sharing a bucket are candidate
duplicates; the shared candidate-pair stage (operators/candidates.py)
turns buckets into `(a, b)` edges with skew-safe capping, and each
detector supplies its verify predicate (operators/verify.py) for the
paranoid recheck — the generalization of DuDe's group-then-byte-verify
(/root/reference/internal/processing/hashing.go:321-382 then :135-239).
"""

from .exact import exact_buckets  # noqa: F401
