"""Directory-of-files source — DuDe's literal input shape, distributed.

The reference walks directory trees with one goroutine per root,
emitting (path → FileHash{FilePath, ModTime, FileSize}) for every
non-directory entry including hidden files, skipping permission errors
(/root/reference/internal/processing/files.go:23-79,
internal/processing/runner.go:249-252).  Spark's ``binaryFile`` data
source is the exact distributed equivalent: it lists recursively,
parallelizes the listing across executors, and yields
(path, modificationTime, length, content) rows — the walk + stat + read
fused into one scan with partition-parallel I/O.

``read_file_tree`` adapts that row shape onto the engine's images
schema so a user can point the pipeline at a directory tree exactly
like pointing DuDe at a folder:

  image_id ← file path        (unique identity, ≅ TEXT UNIQUE path
                               column, internal/db/database.go:44)
  bytes    ← content
  caption  ← file name        (FileName ≅ caption, SURVEY.md §1.2)
  fmt      ← lowercased extension
  w/h/phash ← null/0          (decode-derived downstream via
                               operators.multimodal when needed)

Multiple roots union exactly like DuDe's multi-dir fan-in — cross-root
and intra-root duplicates are indistinguishable downstream
(multi_folder_test.go:62-109 semantics).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WALK_SCHEMA = (
    "path string, content binary, length long, mod_time_ns long, ok boolean"
)


def read_file_tree(
    spark: SparkSession,
    *roots: str,
    path_glob: str | None = None,
    include_hidden: bool = True,
) -> DataFrame:
    """Scan one or more directory trees into the images schema.

    Two physical paths, same output schema:

    * ``include_hidden=True`` (default — DuDe parity: files.go:74
      emits hidden files; e2e hidden-file contract): Spark's file
      index hard-filters dot/underscore names (Hadoop convention), so
      this mode lists paths with a driver-side walk — permission
      errors skipped like filepath.SkipDir (files.go:59-70) — and
      reads file bytes DISTRIBUTED via mapInPandas over the
      partitioned path list (unreadable files → dropped + countable,
      never fatal).  Listing 10^6+ files driver-side is fine (paths
      only); the byte I/O, which is the actual cost, is parallel.
    * ``include_hidden=False``: the built-in ``binaryFile`` source
      (recursive listing parallelized by Spark, Hadoop hidden-file
      convention applies).
    """
    if not roots:
        raise ValueError("at least one root directory is required")
    if include_hidden:
        df = _walk_read(spark, roots, path_glob)
    else:
        frames = []
        for root in roots:
            reader = spark.read.format("binaryFile")
            reader = reader.option("recursiveFileLookup", "true")
            if path_glob:
                reader = reader.option("pathGlobFilter", path_glob)
            frames.append(reader.load(root))
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        df = df.select(
            F.col("path"),
            F.col("content"),
            F.col("length"),
            (F.unix_timestamp("modificationTime") * F.lit(1_000_000_000)).alias(
                "mod_time_ns"
            ),
        )
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(name, r"\."), -1))
    return df.select(
        F.col("path").alias("image_id"),
        F.col("content").alias("bytes"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.when(name.contains("."), ext).otherwise(F.lit(None)).alias("fmt"),
        name.alias("caption"),
        F.lit(None).cast("long").alias("phash"),
        F.col("mod_time_ns"),
        F.col("length").alias("file_size"),
    )


def _walk_read(
    spark: SparkSession, roots: tuple[str, ...], path_glob: str | None
) -> DataFrame:
    """Driver-side walk (paths only) + executor-side byte reads."""
    import fnmatch

    paths: list[str] = []
    for root in roots:
        for dirpath, _dirs, files in os.walk(root, onerror=lambda e: None):
            for fn in files:
                if path_glob and not fnmatch.fnmatch(fn, path_glob):
                    continue
                paths.append(os.path.join(dirpath, fn))
    if not paths:
        return spark.createDataFrame([], _WALK_SCHEMA).select(
            "path", "content", "length", "mod_time_ns"
        )
    plist = spark.createDataFrame(
        pd.DataFrame({"path": sorted(paths)})
    ).repartition(min(len(paths), 64))

    def read_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                try:
                    stt = os.stat(p)
                    with open(p, "rb") as f:
                        rows.append(
                            (p, f.read(), stt.st_size, stt.st_mtime_ns, True)
                        )
                except OSError:
                    # skip-and-count, never fail (files.go:59-70)
                    rows.append((p, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["path", "content", "length", "mod_time_ns", "ok"]
            )

    return (
        plist.mapInPandas(read_files, _WALK_SCHEMA)
        .where(F.col("ok"))
        .select("path", "content", "length", "mod_time_ns")
    )
