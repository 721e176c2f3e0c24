from .ingest import (
    compact_lake,
    extract_tables,
    ingest_blocks,
    ingest_blocks_streaming,
    rollback_lake,
)

__all__ = [
    "compact_lake",
    "extract_tables",
    "ingest_blocks",
    "ingest_blocks_streaming",
    "rollback_lake",
]
