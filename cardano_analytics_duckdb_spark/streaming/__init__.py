from .ingest import (
    compact_lake,
    extract_tables,
    ingest_blocks,
    ingest_blocks_streaming,
    rollback_lake,
)
from .materialize import (
    deregister_materialization,
    registered_materializations,
)

__all__ = [
    "compact_lake",
    "deregister_materialization",
    "extract_tables",
    "ingest_blocks",
    "ingest_blocks_streaming",
    "registered_materializations",
    "rollback_lake",
]
