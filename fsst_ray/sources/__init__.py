from .tokens import (
    TOKENS_SCHEMA,
    tokens_table,
    ensure_tokens_parquet,
    read_tokens_dataset,
)

__all__ = ["TOKENS_SCHEMA", "tokens_table", "ensure_tokens_parquet", "read_tokens_dataset"]
