"""dude_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of AndreasGkizis/DuDe
(reference snapshot at /root/reference, Go + Wails desktop app) as a
Spark-first distributed pipeline over a table of image+caption pairs:

    images(image_id string, bytes binary, w int, h int,
           fmt string, caption string, phash long)

The reference defines the *semantics* (what counts as a duplicate, how
groups form, what the report contains, cache/verify/incremental
behaviors — see SURVEY.md §2 for the operator-by-operator mapping with
file:line citations); the architecture here is idiomatic PySpark:
DataFrame/SQL plans optimized by Catalyst, vectorized pandas/Arrow UDFs
only where built-ins cannot express the semantics, explicit
partitioning/salting for skew, and parquet-dir checkpoints (Iceberg
table layout, hadoop-catalog-compatible) for idempotent resume.
"""

__version__ = "0.1.0"

from .config import JobConfig, MinHashConfig, SimHashConfig, SuffixConfig  # noqa: E402,F401
from .pipeline import PipelineResult, cancel_run, run_pipeline  # noqa: E402,F401
from .progress import ProgressEvent, ProgressReporter  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
from .storage import (  # noqa: E402,F401
    IcebergStageStore,
    ParquetManifestStore,
    StageStore,
)
