"""Input connectors: parquet/Iceberg tables, directory-of-files scans
(binaryfile.py), and JSONL/CSV/parquet text corpora with skip-and-count
error tolerance (corpus.py)."""

from .corpus import read_corpus, write_corpus  # noqa: F401
