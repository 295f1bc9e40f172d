from .encode_job import append_dataset, encode_dataset, EncodeResult
from .compact_job import compact_corpus, repair_compaction
from .decode_job import read_encoded, decode_dataset, decode_generation, decode_ntok_range, decode_select, decode_source, verify_roundtrip

__all__ = [
    "encode_dataset",
    "append_dataset",
    "EncodeResult",
    "read_encoded",
    "decode_dataset",
    "decode_select",
    "decode_generation",
    "decode_ntok_range",
    "decode_source",
    "verify_roundtrip",
    "compact_corpus",
    "repair_compaction",
]
