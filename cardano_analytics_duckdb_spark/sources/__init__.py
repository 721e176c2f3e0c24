from .blocks import BLOCK_SCHEMA, blocks_to_dataframe

__all__ = ["BLOCK_SCHEMA", "blocks_to_dataframe"]
