"""Integer chunk codecs: plain, bit-pack, frame-of-reference, RLE, dict.

All vectorized numpy; no Python loops over values. These are the
[ENGINE] codecs required by the north rule beyond the reference's FSST
(the reference implements only FSST; see SURVEY.md §2.6).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Codec, register


def bit_width(max_value: int) -> int:
    """Bits needed for values in [0, max_value]."""
    return int(max_value).bit_length() if max_value > 0 else 0


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative int64 values into `width`-bit little-endian
    lanes (C kernel; numpy bits-matrix fallback)."""
    if width == 0 or len(values) == 0:
        return b""
    from ..kernel import native

    lib = native.get_lib()
    v = np.ascontiguousarray(values, dtype=np.int64)
    if lib is not None and width <= 57:
        import ctypes

        out = np.empty((len(v) * width + 7) // 8, dtype=np.uint8)
        written = lib.bitpack(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(v),
            width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out[:written].tobytes()
    u = v.astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((u[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(data: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_bits; returns uint64 values."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if len(data) * 8 < n * width:
        raise ValueError(
            f"bit-packed body too short: {len(data)} bytes cannot hold "
            f"{n} values of width {width} (corrupt or truncated chunk)"
        )
    from ..kernel import native

    lib = native.get_lib()
    if lib is not None and width <= 57:
        import ctypes

        raw = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(n, dtype=np.int64)
        lib.bitunpack(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out.astype(np.uint64, copy=False)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width, bitorder="little")
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.reshape(n, width).astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


class PlainCodec(Codec):
    """Raw little-endian int32 bytes — the always-applicable baseline."""

    name = "plain"
    codec_id = 0

    def estimate(self, stats, state):
        return 4 * stats["n"]

    def encode_values(self, values, state):
        return values.astype("<i4", copy=False).tobytes()

    def decode_values(self, body, n_values):
        return np.frombuffer(body, dtype="<i4", count=n_values).astype(np.int32, copy=False)


class BitPackCodec(Codec):
    """Fixed-width bit packing; applicable to non-negative values only."""

    name = "bitpack"
    codec_id = 1

    def estimate(self, stats, state):
        if stats["min"] < 0:
            return float("inf")
        return 1 + (stats["n"] * bit_width(stats["max"]) + 7) // 8

    def encode_values(self, values, state):
        assert len(values) == 0 or int(values.min()) >= 0, "bitpack requires non-negative values"
        width = bit_width(int(values.max())) if len(values) else 0
        return struct.pack("<B", width) + pack_bits(values.astype(np.int64), width)

    def decode_values(self, body, n_values):
        (width,) = struct.unpack_from("<B", body, 0)
        return unpack_bits(body[1:], n_values, width).astype(np.int32)


class ForCodec(Codec):
    """Frame-of-reference: subtract the chunk min, bit-pack the deltas."""

    name = "for"
    codec_id = 2

    def estimate(self, stats, state):
        width = bit_width(stats["max"] - stats["min"])
        return 9 + (stats["n"] * width + 7) // 8

    def encode_values(self, values, state):
        if len(values) == 0:
            return struct.pack("<qB", 0, 0)
        base = int(values.min())
        deltas = values.astype(np.int64) - base
        width = bit_width(int(deltas.max()))
        return struct.pack("<qB", base, width) + pack_bits(deltas, width)

    def decode_values(self, body, n_values):
        base, width = struct.unpack_from("<qB", body, 0)
        deltas = unpack_bits(body[9:], n_values, width)
        return (deltas.astype(np.int64) + base).astype(np.int32)


class RleCodec(Codec):
    """Run-length encoding: run values + run lengths (both FOR-packed)."""

    name = "rle"
    codec_id = 3

    def estimate(self, stats, state):
        # run values ~FOR width of value range, run lengths ~32 bits
        width = bit_width(stats["max"] - stats["min"]) + 32
        return 32 + (stats["n_runs"] * width + 7) // 8

    def encode_values(self, values, state):
        if len(values) == 0:
            return struct.pack("<q", 0)
        boundaries = np.flatnonzero(np.diff(values)) + 1
        starts = np.concatenate([[0], boundaries])
        run_values = values[starts]
        run_lengths = np.diff(np.concatenate([starts, [len(values)]]))
        n_runs = len(run_values)
        vbase = int(run_values.min())
        vwidth = bit_width(int(run_values.max()) - vbase)
        lwidth = bit_width(int(run_lengths.max()))
        packed_v = pack_bits(run_values.astype(np.int64) - vbase, vwidth)
        packed_l = pack_bits(run_lengths.astype(np.int64), lwidth)
        return (
            struct.pack("<qqBB", n_runs, vbase, vwidth, lwidth)
            + struct.pack("<q", len(packed_v))
            + packed_v
            + packed_l
        )

    def decode_values(self, body, n_values):
        (n_runs,) = struct.unpack_from("<q", body, 0)
        if n_runs == 0:
            return np.empty(0, dtype=np.int32)
        _, vbase, vwidth, lwidth, v_len = struct.unpack_from("<qqBBq", body, 0)
        off = 8 + 8 + 1 + 1 + 8
        run_values = (unpack_bits(body[off : off + v_len], n_runs, vwidth).astype(np.int64) + vbase)
        run_lengths = unpack_bits(body[off + v_len :], n_runs, lwidth).astype(np.int64)
        return np.repeat(run_values, run_lengths).astype(np.int32)


class DictCodec(Codec):
    """Per-chunk dictionary: sorted unique values + bit-packed indices."""

    name = "dict"
    codec_id = 4

    def estimate(self, stats, state):
        card = stats["card"]
        return 16 + 4 * card + (stats["n"] * bit_width(max(card - 1, 0)) + 7) // 8

    def encode_values(self, values, state):
        if len(values) == 0:
            return struct.pack("<qB", 0, 0)
        dict_values, indices = np.unique(values, return_inverse=True)
        width = bit_width(len(dict_values) - 1)
        return (
            struct.pack("<qB", len(dict_values), width)
            + dict_values.astype("<i4").tobytes()
            + pack_bits(indices.astype(np.int64), width)
        )

    def decode_values(self, body, n_values):
        card, width = struct.unpack_from("<qB", body, 0)
        if card == 0:
            return np.empty(0, dtype=np.int32)
        off = 9
        dict_values = np.frombuffer(body, dtype="<i4", count=card, offset=off)
        indices = unpack_bits(body[off + 4 * card :], n_values, width)
        return dict_values[indices.astype(np.int64)].astype(np.int32)


def zigzag(v: np.ndarray) -> np.ndarray:
    """Map signed int64 to unsigned (0,-1,1,-2 -> 0,1,2,3)."""
    return ((v << 1) ^ (v >> 63)).astype(np.int64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.int64)
    return (u >> 1) ^ -(u & 1)


class ZigzagCodec(Codec):
    """Zigzag + bit-pack: the negative-friendly cousin of bitpack."""

    name = "zigzag"
    codec_id = 6

    def estimate(self, stats, state):
        width = bit_width(
            max(
                int(zigzag(np.array([stats["min"]], dtype=np.int64))[0]),
                int(zigzag(np.array([stats["max"]], dtype=np.int64))[0]),
            )
        )
        return 1 + (stats["n"] * width + 7) // 8

    def encode_values(self, values, state):
        z = zigzag(values.astype(np.int64))
        width = bit_width(int(z.max())) if len(z) else 0
        return struct.pack("<B", width) + pack_bits(z, width)

    def decode_values(self, body, n_values):
        (width,) = struct.unpack_from("<B", body, 0)
        return unzigzag(unpack_bits(body[1:], n_values, width)).astype(np.int32)


class DeltaCodec(Codec):
    """Delta + zigzag + bit-pack: wins on sorted / slowly varying
    sequences (e.g. id columns, timestamps as ints)."""

    name = "delta"
    codec_id = 7

    def estimate(self, stats, state):
        width = stats.get("delta_zz_width")
        if width is None:
            return float("inf")
        return 9 + (stats["n"] * width + 7) // 8

    def encode_values(self, values, state):
        if len(values) == 0:
            return struct.pack("<qB", 0, 0)
        v = values.astype(np.int64)
        deltas = np.empty_like(v)
        deltas[0] = 0
        deltas[1:] = np.diff(v)
        z = zigzag(deltas)
        width = bit_width(int(z.max()))
        return struct.pack("<qB", int(v[0]), width) + pack_bits(z, width)

    def decode_values(self, body, n_values):
        first, width = struct.unpack_from("<qB", body, 0)
        if n_values == 0:
            return np.empty(0, dtype=np.int32)
        deltas = unzigzag(unpack_bits(body[9:], n_values, width))
        deltas[0] = first
        return np.cumsum(deltas, dtype=np.int64).astype(np.int32)


PLAIN = register(PlainCodec())
BITPACK = register(BitPackCodec())
FOR = register(ForCodec())
RLE = register(RleCodec())
DICT = register(DictCodec())
ZIGZAG = register(ZigzagCodec())
DELTA = register(DeltaCodec())
