from .ingest import start_incremental_dedup  # noqa: F401
