"""Pure-pandas reference implementation of DuDe's duplicate semantics.

~50 lines re-stating /root/reference/internal/processing/hashing.go:
group rows by content fingerprint (:321-346), drop singleton groups
(:366-368), representative = group minimum id (deterministic version of
:370-376), optionally verify members byte-equal to the representative
and drop unequal ones (:135-239), then flatten to (rep, dup) pairs
(:384-409).  Used ONLY by tests as the recall oracle (SURVEY.md §5.2);
the engine never calls this.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def exact_groups(
    images: pd.DataFrame, paranoid: bool = True
) -> pd.DataFrame:
    """images pandas df → assignments(image_id, cluster_id), singletons
    dropped, cluster_id = min image_id of the group."""
    df = images[images["bytes"].notna()][["image_id", "bytes"]].copy()
    df["fp"] = df["bytes"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
    out = []
    for _, grp in df.groupby("fp"):
        if len(grp) < 2:
            continue  # hashing.go:366-368
        members = sorted(grp.itertuples(), key=lambda r: r.image_id)
        rep = members[0]
        kept = [rep.image_id]
        for m in members[1:]:
            if paranoid and bytes(m.bytes) != bytes(rep.bytes):
                continue  # hashing.go:224-228
            kept.append(m.image_id)
        if len(kept) < 2:
            continue  # empty-group delete, hashing.go:230-235
        out.extend({"image_id": i, "cluster_id": kept[0]} for i in kept)
    return pd.DataFrame(out, columns=["image_id", "cluster_id"])


def flatten(assignments: pd.DataFrame) -> set[tuple[str, str]]:
    """assignments → {(rep, dup)} pair set (hashing.go:384-409)."""
    dups = assignments[assignments.image_id != assignments.cluster_id]
    return {(r.cluster_id, r.image_id) for r in dups.itertuples()}


def all_pairs(assignments: pd.DataFrame) -> set[tuple[str, str]]:
    """Every unordered within-cluster pair (a<b) — the recall unit of
    BASELINE.json (dup-pair recall over reference groupings)."""
    out: set[tuple[str, str]] = set()
    for _, grp in assignments.groupby("cluster_id"):
        ids = sorted(grp.image_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.add((ids[i], ids[j]))
    return out
