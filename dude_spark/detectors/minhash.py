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
mod 2^64 (natural uint64 wraparound); minhash_i = min over shingles of
(a_i·(x mod p) + b_i) mod p with p = 2^31−1, a_i,b_i < p — products
stay < 2^62, exact in uint64.  Band hash folds rows_per_band minhash
values through the same polynomial.

Rejected alternative, measured: one-permutation hashing (bin = h mod H,
min per bin, rotation- or offset-densified) is O(S+H) instead of
O(S×H), BUT in this workload's sparse regime (distinct shingles S ≈
num_hashes H, high baseline similarity between captions) its banded
collision rate was 7× classic minwise (93k vs 13k colliding pairs on
an 800-caption sample; 25.7M LSH candidate pairs at n=200k vs ~1M) —
the downstream verify cost dwarfed the signature savings.  Classic
minwise stays.
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


def _params(cfg: MinHashConfig) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) universal-hash coefficients, shape (num_hashes,), seeded
    deterministically from cfg.seed via sha256 (never Python hash())."""
    blob = f"minhash|{cfg.seed}|{cfg.num_hashes}".encode()
    rs = np.random.RandomState(int.from_bytes(hashlib.sha256(blob).digest()[:4], "big"))
    a = rs.randint(1, _P31, size=cfg.num_hashes).astype(np.uint64)
    b = rs.randint(0, _P31, size=cfg.num_hashes).astype(np.uint64)
    return a, b


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


def _band_hashes(
    shingles: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    num_hashes: int,
    bands: int,
    rpb: int,
) -> np.ndarray | None:
    """Classic minwise signature → per-band fold, shape (bands,) int64,
    or None for empty shingle sets (no shingles ⇒ no buckets ⇒ no
    candidates)."""
    if shingles.size == 0:
        return None
    x = shingles % np.uint64(_P31)
    # (num_hashes, n_shingles) universal hashes; min along shingles.
    sig = ((a[:, None] * x[None, :] + b[:, None]) % np.uint64(_P31)).min(axis=1)
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
