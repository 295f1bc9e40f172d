"""Pluggable per-column-chunk codecs with auto-selection.

Every codec encodes one column chunk — a contiguous int32 token values
array (an Arrow list<int32> child values buffer slice) — into a
self-describing payload: `[codec_id u8][version u8][codec header][data]`.
Payloads are self-contained (dictionaries / FSST symbol tables are
embedded), so any chunk can be decoded without a manifest lookup.

Registry mirrors the reference's user-extension surface
(reference: src/lib.rs:313-323 hand-built tables are the only plugin
point); the engine generalizes it to a codec registry per the north
rule: dict, RLE, FSST, bit-pack, frame-of-reference.
"""

from __future__ import annotations

from .base import Codec, decode_payload, decode_payload_into, CODEC_BY_ID, CODEC_BY_NAME, register
from .simple import PlainCodec, BitPackCodec, ForCodec, RleCodec, DictCodec
from .fsst_codec import FsstCodec
from .select import select_codec, encode_chunk, chunk_stats

__all__ = [
    "Codec",
    "decode_payload",
    "decode_payload_into",
    "CODEC_BY_ID",
    "CODEC_BY_NAME",
    "register",
    "PlainCodec",
    "BitPackCodec",
    "ForCodec",
    "RleCodec",
    "DictCodec",
    "FsstCodec",
    "select_codec",
    "encode_chunk",
    "chunk_stats",
]
