"""Report construction + CSV sink.

Reference semantics reproduced (O9/O10, SURVEY.md §2.1):
  * groups flatten to (representative, duplicate) rows
    (/root/reference/internal/processing/hashing.go:384-409);
  * CSV written with a UTF-8 BOM, a fixed header, a timestamped
    filename, and NO file at all when there are zero duplicates
    (internal/processing/files.go:81-127, empty-skip :86-89, BOM :103,
    filename :166-178); the reference's OS-dependent delimiter
    (:154-164) is a config knob here (default ',').
  * the group-separator cosmetic rows (internal/common/strings.go:10)
    are reproduced only in the CSV writer, never in the DataFrame.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CSV_HEADER = ["image_id", "caption", "dup_image_id", "dup_caption", "cluster_id"]
SEPARATOR = "------"  # internal/common/strings.go:10


def assignments_to_report(assignments: DataFrame, images: DataFrame) -> DataFrame:
    """assignments(image_id, cluster_id) → report rows
    (image_id, caption, dup_image_id, dup_caption, cluster_id) where
    image_id is the representative (== cluster_id, the component min —
    deterministic fix of hashing.go:370)."""
    caps = images.select("image_id", "caption")
    dups = assignments.where(F.col("image_id") != F.col("cluster_id"))
    return (
        dups.join(
            caps.select(
                F.col("image_id").alias("cluster_id"),
                F.col("caption").alias("rep_caption"),
            ),
            "cluster_id",
        )
        .join(
            caps.select(
                F.col("image_id").alias("image_id"),
                F.col("caption").alias("dup_caption"),
            ),
            "image_id",
        )
        .select(
            F.col("cluster_id").alias("rep_image_id"),
            F.col("rep_caption").alias("caption"),
            F.col("image_id").alias("dup_image_id"),
            F.col("dup_caption"),
            F.col("cluster_id"),
        )
        .withColumnRenamed("rep_image_id", "image_id")
    )


def flatten_pairs(assignments: DataFrame) -> DataFrame:
    """assignments → (a=rep, b=dup) pair rows (O9 flatten)."""
    return assignments.where(F.col("image_id") != F.col("cluster_id")).select(
        F.col("cluster_id").alias("a"), F.col("image_id").alias("b")
    )


def write_csv_report(
    report: DataFrame,
    results_dir: str,
    delimiter: str = ",",
    now: _dt.datetime | None = None,
) -> str | None:
    """Write the report as a single BOM-prefixed CSV; returns the path,
    or None when the report is empty (no file written — files.go:86-89).

    Collects to the driver: the report is the final, already-reduced
    duplicate list (small relative to the input).  For huge reports use
    ``report.write.csv`` directly and skip the cosmetic separators.
    """
    rows = report.select(*CSV_HEADER).collect()
    if not rows:
        return None
    stamp = (now or _dt.datetime.now()).strftime("%Y_%m_%d_%H_%M_%S")
    path = os.path.join(results_dir, f"results_{stamp}.csv")  # files.go:166-178
    os.makedirs(results_dir, exist_ok=True)
    with open(path, "w", encoding="utf-8-sig", newline="") as f:  # BOM, files.go:103
        f.write(delimiter.join(CSV_HEADER) + "\n")
        last_cluster = None
        for r in sorted(rows, key=lambda r: (r["cluster_id"], r["dup_image_id"])):
            if last_cluster is not None and r["cluster_id"] != last_cluster:
                f.write(SEPARATOR + "\n")
            last_cluster = r["cluster_id"]
            f.write(
                delimiter.join(
                    str(r[c]).replace(delimiter, " ") for c in CSV_HEADER
                )
                + "\n"
            )
    return path
