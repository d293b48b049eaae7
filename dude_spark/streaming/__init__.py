from .components import (  # noqa: F401
    assignment_stores,
    current_assignments,
    update_assignments,
)
from .ingest import (  # noqa: F401
    embedding_ingest,
    minhash_ingest,
    simhash_ingest,
    start_incremental_dedup,
    suffix_ingest,
    tilephash_hamming_ingest,
    tilephash_ingest,
)
from .migrate import migrate_embedding_centroids  # noqa: F401
from .monitor import hot_bucket_alerts  # noqa: F401
from .windows import start_session_stats, start_windowed_stats  # noqa: F401
