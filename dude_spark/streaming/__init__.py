from .ingest import minhash_ingest, start_incremental_dedup  # noqa: F401
from .windows import start_session_stats, start_windowed_stats  # noqa: F401
