"""D1 — MinHash-LSH near-duplicate detector over caption shingles.

Generalizes the reference's fingerprint-then-group design (MD5 project →
group-by-hash, /root/reference/internal/processing/hashing.go:289-382)
to *near*-equality: the fingerprint becomes a MinHash signature over
character k-shingles, and the group key becomes an LSH band hash, so
rows with Jaccard-similar captions land in at least one shared bucket
with high probability.  Downstream is identical to D0: buckets →
candidate pairs (skew-capped, operators/candidates.py) → exact-Jaccard
verify (operators/verify.py — the ParanoidMode analogue that kills LSH
false positives) → connected components.

Spark-first layout:
  * the ONLY Python-side work is the signature projection — one
    vectorized ``pandas_udf`` (numpy universal hashing over Arrow
    batches; no per-row Python loops in the hash math);
  * banding/bucketing is JVM-side ``posexplode`` + string concat, so
    the wide (rows × bands) explode and the groupBy shuffle stay in
    whole-stage codegen;
  * the scan for this detector reads ONLY (image_id, caption) —
    Catalyst column pruning keeps the multi-TB `bytes` column out of
    both the scan and every shuffle.

Determinism (north_rule "same shingle/signature config"): all hash
parameters derive from `MinHashConfig.seed` via sha256 — never Python
``hash()`` — so signatures are reproducible across Python/numpy
versions and cluster runs (SURVEY.md §4 hard-part (a)).

Math: base shingle hash = rolling polynomial over unicode code points
mod 2^64 (natural uint64 wraparound).  The signature is **one-
permutation hashing** (Li, Owen, Zhang, "One Permutation Hashing",
NIPS'12): each shingle is hashed ONCE; its bin is h mod num_hashes and
its value is one universal hash (a·(h mod p) + b) mod p with
p = 2^31−1; each bin keeps its minimum; empty bins borrow the next
filled bin's value to the right, circularly (densification à la
Shrivastava/Li ICML'14, simple-rotation variant).  This is O(S + H)
per caption instead of classic minwise's O(S × H) — the difference
between ~180 KB and ~3 KB of memory traffic per row, which is what
lets the signature stage scale linearly with cores instead of
saturating the socket's memory bandwidth.  Band hash folds
rows_per_band bin values through the same polynomial.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig

NAME = "minhash"

_P31 = (1 << 31) - 1  # Mersenne prime modulus for universal hashing
_POLY_B = np.uint64(1099511628211)  # FNV-64 prime as polynomial base


def _params(cfg: MinHashConfig) -> tuple[int, int]:
    """Scalar (a, b) universal-hash coefficients, seeded
    deterministically from cfg.seed via sha256 (never Python hash())."""
    blob = f"minhash|{cfg.seed}|{cfg.num_hashes}".encode()
    rs = np.random.RandomState(int.from_bytes(hashlib.sha256(blob).digest()[:4], "big"))
    return int(rs.randint(1, _P31)), int(rs.randint(0, _P31))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit shingle hashes of one caption, fully vectorized.

    Shingles are *character* k-grams (matching verify.shingle_set); a
    caption shorter than k is its own single shingle; empty → empty.
    """
    if not text:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cp)
    kk = min(k, n)
    # windows[i, j] = cp[i + j]  (n-kk+1 rows) via sliding window view
    win = np.lib.stride_tricks.sliding_window_view(cp, kk)
    pows = np.empty(kk, dtype=np.uint64)
    pows[0] = 1
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        for j in range(1, kk):
            pows[j] = pows[j - 1] * _POLY_B
        h64 = (win * pows[::-1]).sum(axis=1, dtype=np.uint64)
    return np.unique(h64)


_EMPTY = np.uint64(1) << np.uint64(62)  # sentinel > any (value mod p)


def _oph_signature(
    shingles: np.ndarray, num_hashes: int, a: int, b: int
) -> np.ndarray | None:
    """One-permutation-hashing signature, shape (num_hashes,) uint64.

    bin(x) = x mod H;  value(x) = (a·(x mod p) + b) mod p;  each bin
    keeps its min; empty bins borrow the next filled bin rightward
    (circular rotation densification).  None for empty shingle sets.
    """
    if shingles.size == 0:
        return None
    bins = (shingles % np.uint64(num_hashes)).astype(np.intp)
    vals = (np.uint64(a) * (shingles % np.uint64(_P31)) + np.uint64(b)) % np.uint64(
        _P31
    )
    sig = np.full(num_hashes, _EMPTY, dtype=np.uint64)
    np.minimum.at(sig, bins, vals)
    empty = sig == _EMPTY
    if empty.any():
        pos = np.nonzero(~empty)[0]  # filled bins, ascending
        idx = np.searchsorted(pos, np.arange(num_hashes), side="left") % len(pos)
        sig = sig[pos[idx]]  # each empty bin ← next filled bin (circular)
    return sig


def _band_hashes(
    shingles: np.ndarray, a: int, b: int, num_hashes: int, bands: int, rpb: int
) -> np.ndarray | None:
    """OPH signature → per-band fold, shape (bands,) int64, or None
    for empty shingle sets (no shingles ⇒ no buckets ⇒ no candidates)."""
    sig = _oph_signature(shingles, num_hashes, a, b)
    if sig is None:
        return None
    folded = np.zeros(bands, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        for j in range(rpb):  # rpb is small (e.g. 3); wide axis vectorized
            folded = folded * _POLY_B + sig[j::rpb][:bands]
    return folded.astype(np.int64)


def minhash_bands_udf(cfg: MinHashConfig):
    """pandas_udf: caption → array<long> of band hashes (len = bands)."""
    a, b = _params(cfg)
    k, nh, bands, rpb = cfg.shingle_k, cfg.num_hashes, cfg.bands, cfg.rows_per_band

    @F.pandas_udf("array<long>")
    def bands_of(captions: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in captions:
            out = [
                None
                if c is None
                else _band_hashes(_shingle_hashes(c, k), a, b, nh, bands, rpb)
                for c in batch
            ]
            yield pd.Series(out, dtype=object)

    return bands_of


def minhash_signatures(images: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """images → (image_id, bands array<long>).  Scan reads only
    (image_id, caption) — verify with .explain() that ReadSchema
    excludes `bytes` (SURVEY.md §4: the biggest I/O lever at 10^12)."""
    udf = minhash_bands_udf(cfg)
    return images.select("image_id", "caption").select(
        "image_id", udf("caption").alias("bands")
    )


def minhash_buckets(signatures: DataFrame) -> DataFrame:
    """(image_id, bands) → (image_id, bucket) with bucket =
    xxhash64('mh', band_idx, band_hash) — a LONG key, not a string:
    the LSH blocking shuffle moves 8 bytes per row instead of a ~30
    char concat (the single widest shuffle in the pipeline at 10^12
    rows × bands).  Hash collisions across bands merely create extra
    candidates that the exact-Jaccard verify kills."""
    return (
        signatures.where(F.col("bands").isNotNull())
        .select("image_id", F.posexplode("bands").alias("band_idx", "band_hash"))
        .select(
            "image_id",
            F.xxhash64(F.lit("mh"), F.col("band_idx"), F.col("band_hash")).alias(
                "bucket"
            ),
        )
    )
