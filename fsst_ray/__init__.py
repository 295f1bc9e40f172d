"""fsst_ray: a Ray-Data-native per-column lightweight-compression engine.

Brand-new implementation (not a port) with the codec semantics of FSST
(Boncz/Neumann/Leis, VLDB vol 13 p2649; reference implementation
spiraldb/fsst at /root/reference) plus dict / RLE / bit-pack /
frame-of-reference codecs with per-chunk auto-selection, a two-pass
streaming encode pipeline over Parquet tables of pre-tokenized
sequences, skew-aware bucketing, resumable manifests, and a verified
decode pass.
"""

from .pipelines import (
    EncodeResult,
    append_dataset,
    compact_corpus,
    decode_dataset,
    decode_generation,
    decode_ntok_range,
    decode_select,
    decode_source,
    encode_dataset,
    read_encoded,
    verify_roundtrip,
)
from .state.tombstones import delete_docs, purge_deletes, resume_upsert, upsert_docs
from .sources import ensure_tokens_parquet, read_tokens_dataset, tokens_table

__all__ = [
    "EncodeResult",
    "encode_dataset",
    "append_dataset",
    "compact_corpus",
    "delete_docs",
    "purge_deletes",
    "resume_upsert",
    "upsert_docs",
    "decode_dataset",
    "decode_select",
    "decode_ntok_range",
    "decode_generation",
    "decode_source",
    "read_encoded",
    "verify_roundtrip",
    "tokens_table",
    "ensure_tokens_parquet",
    "read_tokens_dataset",
]
