from .ingest import compact_lake, extract_tables, ingest_blocks

__all__ = ["compact_lake", "extract_tables", "ingest_blocks"]
