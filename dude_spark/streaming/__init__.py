from .ingest import minhash_ingest, start_incremental_dedup  # noqa: F401
