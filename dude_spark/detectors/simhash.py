"""D2 — SimHash near-duplicate detector over phash / caption-token features.

Same fingerprint-then-group skeleton as D0/D1 (reference: MD5 project →
group-by-hash, /root/reference/internal/processing/hashing.go:289-382),
with a 64-bit similarity-preserving signature and Hamming-ball
bucketing.  Two feature channels, each optional (SimHashConfig):

  phash    the input column `phash` IS a 64-bit perceptual signature
           (average-hash); used directly.  Catches visually-identical
           re-encodes whose captions differ (fixture kind `near_image`).
  caption  simhash over whitespace tokens: each token hashes to 64 bits
           (same deterministic polynomial as D1); bit j of the signature
           is the sign of Σ_tokens (±1 per token bit j).  Catches
           same-token-bag captions.

Bucketing — generalized pigeonhole (Manku/Jain/Sarma, "Detecting
Near-Duplicates for Web Crawling", WWW'07, multi-table scheme): split
the 64-bit signature into `segments` = m equal slices; for Hamming
radius r, every (m−r)-subset of segments becomes one bucket key.  If
two signatures differ in ≤ r bits, the errors touch ≤ r segments, so
at least one subset is error-free and the pair shares that bucket —
exact recall within the ball.  Key width is (m−r)·(64/m) bits: with
the default m=8, r=3 that is 40 bits — at 10^12 rows the expected
random bucket size stays O(1), unlike the naive m=r+1 scheme whose
16-bit keys would each hold ~10^7 rows.  C(m,r) subsets per row is the
candidate-generation cost knob.

Everything except the caption-simhash pandas_udf is JVM-side: segment
extraction is shiftright+mask, subset keys are concat, the explode is
one `posexplode` of a precomputed expression array — all inside
whole-stage codegen.  Verification is `bit_count(a^b) <= r` JVM-side
(operators/verify.verify_hamming).
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SimHashConfig

NAME = "simhash"

_POLY_B = np.uint64(1099511628211)  # FNV-64 prime, same base as D1


def segment_subsets(segments: int, radius: int) -> list[tuple[int, ...]]:
    """All (segments−radius)-subsets of segment indices — the bucket
    tables.  Deterministic order (lexicographic) for reproducibility."""
    return list(itertools.combinations(range(segments), segments - radius))


def pigeonhole_key_array(
    sig_col, segments: int, radius: int, tag: str = "ph", extra: tuple = ()
):
    """Column expression: 64-bit signature → array<long> of pigeonhole
    bucket keys, one xxhash64 per (segments−radius)-subset.  LONG keys
    so the explode shuffles 8 bytes/row; hash collisions only add
    candidates that downstream exact verification removes.  The SINGLE
    key-derivation implementation shared by the D2 detector
    (``extra=(channel,)`` salts keys per channel) and the embedding
    hyperplane-LSH dup-pair path — change subset order or hashing here
    and both move together."""
    width = 64 // segments
    mask = (1 << width) - 1

    def seg(i: int):
        return F.shiftright(sig_col, i * width).bitwiseAND(F.lit(mask))

    return F.array(
        *[
            F.xxhash64(F.lit(tag), *extra, F.lit(si), *[seg(i) for i in subset])
            for si, subset in enumerate(segment_subsets(segments, radius))
        ]
    )


_FNV_OFFSET = np.uint64(14695981039346656037)


def _token_hashes(text: str) -> np.ndarray:
    """64-bit polynomial hashes of whitespace tokens — SCALAR REFERENCE
    implementation (per-char loop), kept as the property-test oracle
    for the vectorized batch kernel below."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            h = _FNV_OFFSET
            for c in cp:
                h = h * _POLY_B + c
            out[i] = h
    return out


def simhash64(token_hashes: np.ndarray) -> int | None:
    """Classic simhash: bit j = sign of Σ_tokens (2·bit_j(tok) − 1)."""
    if token_hashes.size == 0:
        return None
    bits = (token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sig = np.uint64(0)
    for j in np.nonzero(votes > 0)[0]:
        sig |= np.uint64(1) << np.uint64(j)
    return int(sig.astype(np.int64))  # wrap into Spark LongType range


def _batch_simhash(captions) -> list[int | None]:
    """Whole-batch simhash — identical values to
    ``simhash64(_token_hashes(c))`` per caption, but every hash/vote
    operation is one numpy pass over ALL tokens of the batch (round-1
    VERDICT "what's wrong" #4: the per-char per-token Python loop is
    the hot path; this replaces it).

    Vectorization: all tokens of the batch are joined and encoded
    ONCE; each token's code points scatter into a right-aligned
    (n_tokens × max_len) matrix, so the polynomial hash
    h = OFFSET·B^len + Σ c_j·B^(len-1-j) is a single matrix-times-
    power-vector product (left-padding zeros contribute 0 to the sum).
    Per-caption bit votes are one ``np.add.reduceat`` over token rows.
    """
    toks_per: list[list[str]] = [
        None if c is None else c.split() for c in captions
    ]
    all_toks: list[str] = [t for toks in toks_per if toks for t in toks]
    out: list[int | None] = [None] * len(toks_per)
    if not all_toks:
        return out

    lens = np.fromiter((len(t) for t in all_toks), dtype=np.int64, count=len(all_toks))
    n = len(all_toks)

    # The scatter matrix is (n_short_tokens × K): ONE pathological
    # token (a 1 MB base64 blob in a scraped caption) must not set K
    # for the whole batch — n × K would be gigabytes.  Tokens longer
    # than _VEC_CAP take the scalar per-char path (bit-identical, and
    # they are rare by construction in natural text).
    _VEC_CAP = 256
    long_idx = np.nonzero(lens > _VEC_CAP)[0]
    short_mask = lens <= _VEC_CAP
    short_lens = lens[short_mask]
    hashes = np.empty(n, dtype=np.uint64)

    # Scratch budget PER CONCURRENT WORKER, not per process (the
    # minhash chunk lesson, SURVEY §10.2): at K=_VEC_CAP a whole-batch
    # scatter matrix is ~40 MB of uint64 — "L3-resident" for one
    # worker, DRAM-bound for 32.  Token rows are processed in slices
    # of ≤ _SCATTER_ELEMS elements (~0.5 MB) so every worker's
    # scatter/multiply/sum stays cached under full concurrency.
    _SCATTER_ELEMS = 1 << 16
    with np.errstate(over="ignore"):
        if short_lens.size:
            short_toks = (
                all_toks
                if long_idx.size == 0
                else [t for t, keep in zip(all_toks, short_mask) if keep]
            )
            ns, K = len(short_toks), int(short_lens.max())
            pows = np.empty(K + 1, dtype=np.uint64)
            pows[0] = 1
            for j in range(1, K + 1):  # K <= _VEC_CAP, tiny
                pows[j] = pows[j - 1] * _POLY_B
            pows_rev = pows[K - 1 :: -1]
            short_hashes = np.empty(ns, dtype=np.uint64)
            step = max(1, _SCATTER_ELEMS // K)
            for r0 in range(0, ns, step):
                r1 = min(ns, r0 + step)
                lens_c = short_lens[r0:r1]
                total_c = int(lens_c.sum())
                cp = np.frombuffer(
                    "".join(short_toks[r0:r1]).encode("utf-32-le"),
                    dtype=np.uint32,
                ).astype(np.uint64)
                # scatter code points right-aligned into (rows, K)
                row = np.repeat(np.arange(r1 - r0), lens_c)
                starts = np.concatenate(([0], np.cumsum(lens_c)[:-1]))
                within = np.arange(total_c) - np.repeat(starts, lens_c)
                col = K - np.repeat(lens_c, lens_c) + within
                M = np.zeros((r1 - r0, K), dtype=np.uint64)
                M[row, col] = cp
                h_c = (M * pows_rev[None, :]).sum(axis=1, dtype=np.uint64)
                short_hashes[r0:r1] = h_c + _FNV_OFFSET * pows[lens_c]
            hashes[short_mask] = short_hashes
        for i in long_idx:  # rare outliers — scalar reference math
            cp_i = np.frombuffer(
                all_toks[i].encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            h = _FNV_OFFSET
            for c in cp_i:
                h = h * _POLY_B + c
            hashes[i] = h

    # per-caption signed bit votes in one reduceat over token rows;
    # unpack/pack via byte views (explicit little-endian for
    # cross-platform determinism) instead of 64 shift-and-mask passes
    bits = np.unpackbits(
        hashes[:, None].astype("<u8").view(np.uint8), axis=1, bitorder="little"
    )
    counts = np.fromiter(
        (len(toks) for toks in toks_per if toks), dtype=np.int64
    )
    bounds = np.concatenate(([0], np.cumsum(counts)[:-1]))
    votes = 2 * np.add.reduceat(bits.astype(np.int32), bounds, axis=0) - counts[:, None]
    sigs = (
        np.packbits(votes > 0, axis=1, bitorder="little")
        .view("<u8")
        .ravel()
        .astype(np.int64)
    )

    si = 0
    for i, toks in enumerate(toks_per):
        if toks:  # None and empty-token captions stay None
            out[i] = int(sigs[si])
            si += 1
    return out


def caption_simhash_udf():
    """pandas_udf: caption → nullable long simhash (batch-vectorized)."""

    @F.pandas_udf("long")
    def sim(captions: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in captions:
            yield pd.Series(_batch_simhash(batch.tolist()), dtype="object")

    return sim


def simhash_signatures(images: DataFrame, cfg: SimHashConfig) -> DataFrame:
    """images → (image_id, channel, sig).  One row per enabled channel.

    The phash channel is a pure projection (no UDF at all); the caption
    channel is one vectorized pandas_udf.  Neither reads `bytes`.
    """
    parts = []
    if cfg.use_phash:
        parts.append(
            images.select(
                "image_id", F.lit("phash").alias("channel"),
                F.col("phash").alias("sig"),
            ).where(F.col("sig").isNotNull())
        )
    if cfg.use_caption:
        from ..session import ensure_min_partitions

        udf = caption_simhash_udf()
        parts.append(
            # spread an under-split scan before the signature UDF
            # (one row group = one task otherwise)
            ensure_min_partitions(images.select("image_id", "caption"))
            .select(
                "image_id", F.lit("caption").alias("channel"),
                udf("caption").alias("sig"),
            )
            .where(F.col("sig").isNotNull())
        )
    if not parts:
        raise ValueError("SimHashConfig enables no channels")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def simhash_buckets(signatures: DataFrame, cfg: SimHashConfig) -> DataFrame:
    """(image_id, channel, sig) → (image_id, bucket).

    bucket = xxhash64('sh', channel, subset_id, seg values…) for every
    (m−r)-subset — LONG keys so the C(m,r)-way explode shuffles 8
    bytes/row (hash collisions only add candidates; the exact Hamming
    verify removes them).  All JVM expressions; one explode per
    channel.  The subset-table count is per-channel
    (cfg.radius_for): the caption channel's radius-1 ball needs only
    C(m,1) tables.
    """
    parts = []
    for ch in ("phash", "caption"):
        chan = signatures.where(F.col("channel") == ch)
        keys = pigeonhole_key_array(
            F.col("sig"), cfg.segments, cfg.radius_for(ch),
            tag="sh", extra=(F.col("channel"),),
        )
        parts.append(
            chan.select("image_id", F.explode(keys).alias("bucket"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def simhash_pairs_verified(
    pairs: DataFrame, signatures: DataFrame, cfg: SimHashConfig
) -> DataFrame:
    """Exact Hamming recheck per channel: a pair survives if ANY enabled
    channel has bit_count(sig_a ^ sig_b) <= that channel's radius.
    JVM-side."""
    by_channel = []
    for ch in ("phash", "caption"):
        sigs = signatures.where(F.col("channel") == ch).select("image_id", "sig")
        j = (
            pairs.join(
                sigs.select(F.col("image_id").alias("a"), F.col("sig").alias("sig_a")), "a"
            )
            .join(
                sigs.select(F.col("image_id").alias("b"), F.col("sig").alias("sig_b")), "b"
            )
            .where(
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                <= F.lit(cfg.radius_for(ch))
            )
            .select("a", "b")
        )
        by_channel.append(j)
    out = by_channel[0]
    for p in by_channel[1:]:
        out = out.unionByName(p)
    return out.distinct()
