"""Seeded synthetic `images` fixture generator (FIXTURES.md §1).

Translates the reference's file-system test corpus
(/root/reference/tests/e2e_tests/e2e_utilities.go — deterministic-shape
random text/image/audio files, dup planting via copyFile :403-409,
formats :526-539) into table form with planted populations:

  exact        byte-identical groups of 2..5         (D0 targets)
  near_caption same image, perturbed captions, pairs (D1 MinHash targets)
  near_image   same pixels re-encoded png vs jpeg    (D2 SimHash targets)
  substring    captions sharing a >=L-char substring (D3 suffix targets)
  collision    equal weak fingerprint, different content — must NOT be
               reported with verify on (≅ MD5-collision paranoid tests,
               single_folder_test.go:264-325)
  same_caption identical caption, different image (exact must NOT group)
  hot          ~1% of rows share one caption+pixels — the hot-bucket
               skew block (north_rule salting fixture)
  unicode      NFC vs NFD captions over identical bytes (content, not
               caption, drives exact equality — dual_folder_test.go:1083-1128)
  degenerate   empty caption / 1x1 image / undecodable or empty bytes
               (skip-and-count, never fail — files.go:59-70)
  unique       bulk filler

Every row is a pure function of (row_index, n_rows, seed, img_size), so
generation is identical whether run driver-side (pandas) or distributed
(mapInPandas over spark.range) — no coordination, no skew in the
generator itself.
"""

from __future__ import annotations

import hashlib
import unicodedata
from collections.abc import Iterator

import numpy as np
import pandas as pd

from .imagecodec import MAGIC, encode, phash64

_BASE_WORDS = (
    "aurora harbor lantern meadow quartz ripple sable tundra velvet willow "
    "anchor bramble cinder drift ember flint grove hollow iris juniper "
    "ο ουρανός θάλασσα φεγγάρι αστέρι δέντρο πέτρα ποτάμι "
    "mañana über söze crème ☀ ☁ ✦ — … "
    "kernel tensor shard vector lattice prism cobalt onyx zephyr marble"
).split()

# Realistic lexical diversity: a ~49-word vocabulary makes RANDOM
# caption pairs land at char-shingle Jaccard ~0.2-0.3, where the LSH
# s-curve fires for a measurable fraction of all O(n^2) pairs — a pure
# fixture artifact (real caption corpora have far lower base overlap)
# that inflated candidate volume ~25x at n=200k.  Suffix-expanding to
# ~2k distinct words drops random-pair similarity to ~0 while leaving
# every planted population's similarity structure (word-replacement
# near-dups, shared substring cores, identical captions) unchanged.
VOCAB = _BASE_WORDS + [f"{w}{i}" for i in range(1, 41) for w in _BASE_WORDS]

HOT_CAPTION = "hot bucket caption shared by the skew block ☄"
SUBSTRING_CORE = "the quick brown fox jumps over the lazy dog near the river delta"

FMTS = ("png", "jpeg", "gif")

IMAGES_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
TRUTH_COLUMNS = ["image_id", "truth_group_id", "truth_kind", "source"]

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)
TRUTH_SCHEMA = "image_id string, truth_group_id string, truth_kind string, source string"

# population layout: (kind, fraction). Remainder is `unique`.
_LAYOUT = [
    ("exact", 0.10),
    ("near_caption", 0.08),
    ("near_image", 0.08),
    ("substring", 0.06),
    ("collision", 0.02),
    ("same_caption", 0.02),
    ("hot", 0.01),
]
_FIXED_UNICODE = 2
_FIXED_DEGENERATE = 4

_EXACT_CYCLE = [2, 3, 4, 5]
_EXACT_CUM = [0, 2, 5, 9, 14]


def _rs(seed: int, *tags) -> np.random.RandomState:
    """Stable RandomState from arbitrary tags — sha256-based so it is
    identical across Python/numpy versions (never Python hash())."""
    blob = ("|".join(str(t) for t in tags) + f"|{seed}").encode()
    return np.random.RandomState(
        int.from_bytes(hashlib.sha256(blob).digest()[:4], "big")
    )


def _caption(rs: np.random.RandomState, n_words: int = 12) -> str:
    return " ".join(rs.choice(VOCAB, size=n_words))


def _pixels(rs: np.random.RandomState, h: int, w: int) -> np.ndarray:
    return rs.randint(0, 256, (h, w, 3), dtype=np.uint8)


def _bounds(n: int) -> list[tuple[str, int, int]]:
    """[(kind, start, end)] covering [0, n). Fixed tiny populations get
    absolute counts; fractional ones scale with n; rest is unique."""
    out = []
    pos = 0
    for kind, frac in _LAYOUT:
        cnt = max(2, int(n * frac)) if n >= 20 else 0
        cnt -= cnt % 2  # pair-based populations need even counts
        out.append((kind, pos, pos + cnt))
        pos += cnt
    for kind, cnt in (("unicode", _FIXED_UNICODE), ("degenerate", _FIXED_DEGENERATE)):
        cnt = min(cnt, max(0, n - pos))
        out.append((kind, pos, pos + cnt))
        pos += cnt
    out.append(("unique", pos, n))
    return out


def build_row(i: int, n: int, seed: int = 42, img_size: int = 32) -> dict:
    """Pure function of (i, n, seed, img_size) → one fixture row."""
    kind, member, group = "unique", 0, i
    for k, start, end in _bounds(n):
        if start <= i < end:
            kind = k
            m = i - start
            if k == "exact":
                q, r = divmod(m, 14)
                for gi in range(4):
                    if _EXACT_CUM[gi] <= r < _EXACT_CUM[gi + 1]:
                        group, member = q * 4 + gi, r - _EXACT_CUM[gi]
                        break
            elif k in ("near_caption", "near_image", "substring", "collision",
                       "same_caption", "unicode"):
                group, member = m // 2, m % 2
            elif k == "hot":
                group, member = 0, m
            else:  # degenerate, unique
                group, member = m, 0
            break

    rs = _rs(seed, kind, group)           # group-shared randomness
    rs_m = _rs(seed, kind, group, member)  # member-specific randomness
    h = w = img_size
    fmt = FMTS[group % 3]
    image_id = f"img_{kind}_{group:06d}_{member}"
    truth_group = f"{kind}_{group:06d}" if kind not in ("unique", "degenerate") else None

    if kind == "exact":
        pix, cap = _pixels(rs, h, w), _caption(rs)
    elif kind == "near_caption":
        pix = _pixels(rs_m, h, w)          # different images
        words = _caption(rs).split()
        if member == 1:  # one word swapped + one replaced: shingle-J stays high
            widx = int(rs.randint(0, len(words)))
            words[widx] = str(rs.choice(VOCAB))
            words[0], words[1] = words[1], words[0]
        cap = " ".join(words)
    elif kind == "near_image":
        pix = _pixels(rs, h, w)            # same pixels...
        fmt = "png" if member == 0 else "jpeg"  # ...re-encoded lossily
        cap = _caption(rs_m)               # different captions: D2-only target
    elif kind == "substring":
        pix = _pixels(rs_m, h, w)
        cap = f"{_caption(rs_m, 4)} {SUBSTRING_CORE} {_caption(rs_m, 4)}"
    elif kind == "collision":
        # same dims/fmt and caption length, different content — the weak
        # (w,h,fmt,len) fingerprint collides; paranoid verify must drop.
        pix = _pixels(rs_m, h, w)
        base = _caption(rs)
        cap = base if member == 0 else base[:-1] + "§"[:1].ljust(1, "x")
        cap = cap[: len(base)].ljust(len(base), "x")
    elif kind == "same_caption":
        pix, cap = _pixels(rs_m, h, w), _caption(rs)
    elif kind == "hot":
        pix, cap = _pixels(rs, h, w), HOT_CAPTION
    elif kind == "unicode":
        pix = _pixels(rs, h, w)
        nfc = unicodedata.normalize("NFC", "café señor ανθός")
        cap = nfc if member == 0 else unicodedata.normalize("NFD", nfc)
    elif kind == "degenerate":
        which = group % 4
        if which == 0:
            pix, cap = _pixels(rs, h, w), ""          # empty caption
        elif which == 1:
            pix, cap = _pixels(rs, 1, 1), _caption(rs)  # 1x1 image
            h = w = 1
        elif which == 2:
            raw = bytes(rs.randint(0, 256, 64, dtype=np.uint8).tobytes())
            if raw[:4] in MAGIC.values():
                raw = b"\x00\x00\x00\x00" + raw[4:]
            return _row(image_id, raw, w, h, "png", _caption(rs), 0,
                        truth_group, kind, group)      # undecodable bytes
        else:
            return _row(image_id, b"", 0, 0, "png", _caption(rs), 0,
                        truth_group, kind, group)      # empty bytes
    else:  # unique
        pix, cap = _pixels(rs_m, h, w), _caption(rs_m) + f" #{i}"

    data = encode(pix, fmt)
    return _row(image_id, data, w, h, fmt, cap, phash64(pix), truth_group, kind, group)


def _row(image_id, data, w, h, fmt, cap, ph, truth_group, kind, group) -> dict:
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": cap,
        "phash": ph,
        "truth_group_id": truth_group,
        "truth_kind": kind,
        "source": f"src{group % 3 + 1}",
    }


def generate_pdf(n: int, seed: int = 42, img_size: int = 32) -> pd.DataFrame:
    """Driver-side generation (tests, small n)."""
    return pd.DataFrame([build_row(i, n, seed, img_size) for i in range(n)])


def generate_df(spark, n: int, seed: int = 42, img_size: int = 32,
                partitions: int | None = None):
    """Distributed generation: mapInPandas over spark.range — each
    partition derives its rows independently (scales to any n).
    Returns (images_df, truth_df)."""
    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [build_row(int(i), n, seed, img_size) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    full = rng.mapInPandas(gen, schema=IMAGES_SCHEMA + ", " + TRUTH_SCHEMA.replace(
        "image_id string, ", ""))
    return full.select(*IMAGES_COLUMNS), full.select(*TRUTH_COLUMNS)


def write_fixture(spark, out_dir: str, n: int, seed: int = 42,
                  img_size: int = 32, partitions: int | None = None) -> None:
    """Materialize images.parquet + images_truth.parquet under out_dir."""
    images, truth = generate_df(spark, n, seed, img_size, partitions)
    images.write.mode("overwrite").parquet(f"{out_dir}/images.parquet")
    truth.write.mode("overwrite").parquet(f"{out_dir}/images_truth.parquet")


def expected_pairs(truth_pdf: pd.DataFrame, kinds: set[str]) -> set[tuple[str, str]]:
    """Ground-truth dup pairs (a<b) for the given populations — the
    recall denominator (BASELINE.json: dup-pair recall >= 0.99)."""
    out: set[tuple[str, str]] = set()
    sel = truth_pdf[truth_pdf.truth_kind.isin(kinds) & truth_pdf.truth_group_id.notna()]
    for _, grp in sel.groupby("truth_group_id"):
        ids = sorted(grp.image_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.add((ids[i], ids[j]))
    return out
