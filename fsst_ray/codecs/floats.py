"""Lossless float codecs: byte-plane transpose + ALP-style decimal ints.

The reference crate compresses only byte strings (spiraldb/fsst
src/lib.rs); the engine's north rule asks for a columnar codec family
beyond it. Real tables carry float columns (embeddings `list<float>`,
metric doubles), and the two public designs that compress them
losslessly without an entropy coder are:

- **byte-plane transpose** (Blosc shuffle / BtrBlocks): split each
  float into its bytes, group byte i of every value into one plane,
  and encode each plane independently — the sign/exponent plane of
  normalized data has tiny cardinality (17 distinct bytes on the
  embeddings table) and dict-bitpacks to ~5 bits/value while the
  full-entropy mantissa planes stay plain;
- **decimal-int promotion** (the ALP idea): when every value in a
  chunk is exactly `i / 10^p` for integers i, store the integers
  through the existing int chunk codecs (bitpack/FOR/delta/...) —
  engages on human-scaled metrics like `events.value` (2 decimals).

Both are bit-exact (NaN payloads, -0.0, infinities preserved): the
plane path is a pure byte permutation and the decimal path verifies
bitwise reconstruction before engaging, falling back to planes.

All vectorized numpy — no Python loops over values.
"""

from __future__ import annotations

import struct

import numpy as np

from .simple import bit_width, pack_bits, unpack_bits

_VERSION = 1
_MODE_PLANES = 0
_MODE_DECIMAL = 1

# plane sub-modes
_P_PLAIN = 0
_P_CONST = 1
_P_DICT = 2
_P_RLE = 3

_HEADER = struct.Struct("<BBBbI")  # version, mode, itemsize, pexp, n


# ---------------------------------------------------------------------------
# per-plane byte encodings


def _encode_plane(plane: np.ndarray) -> bytes:
    """Encode one uint8 plane with the cheapest of plain / constant /
    dict-bitpack / RLE (exact sizes, not estimates — bytes are cheap
    to measure)."""
    n = len(plane)
    if n == 0:
        return struct.pack("<BI", _P_PLAIN, 0)
    uniq, inv = np.unique(plane, return_inverse=True)
    card = len(uniq)
    if card == 1:
        return struct.pack("<BI", _P_CONST, 1) + bytes([int(uniq[0])])

    sizes = {_P_PLAIN: n}
    w = max(bit_width(card - 1), 1)
    sizes[_P_DICT] = 1 + card + (n * w + 7) // 8

    breaks = np.flatnonzero(np.diff(plane)) + 1
    n_runs = len(breaks) + 1
    starts = np.concatenate(([0], breaks))
    lengths = np.diff(np.concatenate((starts, [n])))
    lw = max(bit_width(int(lengths.max())), 1)
    sizes[_P_RLE] = 4 + 1 + n_runs + (n_runs * lw + 7) // 8

    mode = min(sizes, key=lambda k: (sizes[k], k))
    if mode == _P_PLAIN:
        body = plane.tobytes()
    elif mode == _P_DICT:
        body = bytes([card - 1]) + uniq.tobytes() + pack_bits(inv.astype(np.int64), w)
    else:  # _P_RLE
        body = (
            struct.pack("<IB", n_runs, lw)
            + plane[starts].tobytes()
            + pack_bits(lengths.astype(np.int64), lw)
        )
    return struct.pack("<BI", mode, len(body)) + body


def _decode_plane(buf: memoryview, off: int, n: int) -> tuple[np.ndarray, int]:
    mode, body_len = struct.unpack_from("<BI", buf, off)
    off += 5
    body = buf[off : off + body_len]
    if len(body) != body_len:
        raise ValueError("corrupt float chunk: truncated plane body")
    off += body_len
    if n == 0:
        return np.zeros(0, dtype=np.uint8), off
    if mode == _P_PLAIN:
        if body_len != n:
            raise ValueError("corrupt float chunk: plain plane length mismatch")
        return np.frombuffer(body, dtype=np.uint8), off
    if mode == _P_CONST:
        return np.full(n, body[0], dtype=np.uint8), off
    if mode == _P_DICT:
        card = body[0] + 1
        uniq = np.frombuffer(body[1 : 1 + card], dtype=np.uint8)
        w = max(bit_width(card - 1), 1)
        idx = unpack_bits(bytes(body[1 + card :]), n, w).astype(np.int64)
        if idx.max(initial=0) >= card:
            raise ValueError("corrupt float chunk: dict index out of range")
        return uniq[idx], off
    if mode == _P_RLE:
        n_runs, lw = struct.unpack_from("<IB", body, 0)
        vals = np.frombuffer(body[5 : 5 + n_runs], dtype=np.uint8)
        lengths = unpack_bits(bytes(body[5 + n_runs :]), n_runs, lw).astype(np.int64)
        if int(lengths.sum()) != n:
            raise ValueError("corrupt float chunk: RLE lengths do not sum to n")
        return np.repeat(vals, lengths), off
    raise ValueError(f"corrupt float chunk: unknown plane mode {mode}")


# ---------------------------------------------------------------------------
# decimal-int promotion (ALP-style)


def _try_decimal(values: np.ndarray) -> tuple[int, np.ndarray] | None:
    """Find the smallest p in [0, 7] such that every value is exactly
    int32(i) / 10^p (bitwise, computed in float64 then cast back).
    Returns (p, int64 scaled) or None."""
    if len(values) == 0 or not np.isfinite(values).all():
        return None
    v64 = values.astype(np.float64)
    for p in range(8):
        scaled = np.rint(v64 * 10.0**p)
        if np.abs(scaled).max() >= 2**31:
            return None
        # verify through the integers actually stored (not the float
        # rint result): int64(-0.0) == 0 reconstructs +0.0, so a -0.0
        # chunk must fall through to the plane path
        ints = scaled.astype(np.int64)
        rec = (ints.astype(np.float64) / 10.0**p).astype(values.dtype)
        if rec.tobytes() == values.tobytes():
            return p, ints
    return None


# ---------------------------------------------------------------------------
# public API


def encode_float_chunk(values: np.ndarray) -> tuple[bytes, dict]:
    """Encode one float32/float64 chunk losslessly. Returns
    (framed payload, meta)."""
    if values.dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        raise TypeError(f"encode_float_chunk expects f32/f64, got {values.dtype}")
    values = np.ascontiguousarray(values)
    n = len(values)
    itemsize = values.dtype.itemsize

    dec = _try_decimal(values)
    if dec is not None:
        from .select import encode_chunk

        p, scaled = dec
        body, inner = encode_chunk(scaled.astype(np.int32))
        payload = _HEADER.pack(_VERSION, _MODE_DECIMAL, itemsize, p, n) + body
        meta = {
            "codec": f"fdecimal{p}:{inner['codec']}",
            "n_values": n,
            "bytes_in": itemsize * n,
            "bytes_out": len(payload),
        }
        return payload, meta

    planes = values.view(np.uint8).reshape(n, itemsize) if n else np.zeros(
        (0, itemsize), dtype=np.uint8
    )
    parts = [_encode_plane(np.ascontiguousarray(planes[:, i])) for i in range(itemsize)]
    payload = _HEADER.pack(_VERSION, _MODE_PLANES, itemsize, 0, n) + b"".join(parts)
    meta = {
        "codec": "fplane",
        "n_values": n,
        "bytes_in": itemsize * n,
        "bytes_out": len(payload),
        "plane_modes": [p[0] for p in parts],
    }
    return payload, meta


def decode_float_payload(payload: bytes) -> np.ndarray:
    """Inverse of encode_float_chunk — bit-exact. Raises ValueError on
    any corrupt or truncated frame."""
    try:
        return _decode_float_payload(payload)
    except struct.error as exc:
        raise ValueError(f"corrupt float chunk: {exc}") from exc


def _decode_float_payload(payload: bytes) -> np.ndarray:
    version, mode, itemsize, pexp, n = _HEADER.unpack_from(payload, 0)
    if version != _VERSION:
        raise ValueError(f"corrupt float chunk: unknown version {version}")
    if itemsize not in (4, 8):
        raise ValueError(f"corrupt float chunk: itemsize {itemsize}")
    dtype = np.float32 if itemsize == 4 else np.float64
    off = _HEADER.size
    if mode == _MODE_DECIMAL:
        from .base import decode_payload

        scaled = decode_payload(payload[off:]).astype(np.float64)
        return (scaled / 10.0**pexp).astype(dtype)
    if mode != _MODE_PLANES:
        raise ValueError(f"corrupt float chunk: unknown mode {mode}")
    buf = memoryview(payload)
    out = np.empty((n, itemsize), dtype=np.uint8)
    for i in range(itemsize):
        plane, off = _decode_plane(buf, off, n)
        out[:, i] = plane
    return out.view(dtype).ravel()
