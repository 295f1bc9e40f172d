"""ctypes loader for the C FSST kernel, with compile-on-first-use.

The shared library is built from fsst_native.c with the system C
compiler into a content-addressed path under /tmp, so every Ray worker
process on a node shares one cached build. If no compiler is available
the caller falls back to the pure-Python oracle in fsst.py (same
results, much slower).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

import numpy as np

_SRC = pathlib.Path(__file__).parent / "fsst_native.c"
_LOCK = threading.Lock()
_LIB = None
_LOAD_FAILED = False


def _build_and_load():
    # test hook: tools/sanitize_check.py points this at an
    # ASan/UBSan-instrumented build (with libasan LD_PRELOADed) so the
    # whole parity/property suite runs under the sanitizers
    override = os.environ.get("FSST_NATIVE_SO")
    if override:
        return _bind(ctypes.CDLL(override))
    src = _SRC.read_bytes()
    digest = hashlib.sha256(src).hexdigest()[:16]
    so_path = pathlib.Path(f"/tmp/fsst_ray_native_{digest}.so")
    if not so_path.exists():
        tmp = so_path.with_suffix(f".{os.getpid()}.tmp")
        subprocess.run(
            ["cc", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)  # atomic: concurrent workers race safely
    return _bind(ctypes.CDLL(str(so_path)))


def _bind(lib):
    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.fsst_compress_bulk.restype = i64
    lib.fsst_compress_bulk.argtypes = [
        u8p, i64p, i64, u16p, u64p, u16p, u16p, ctypes.c_uint8, u8p, i64p,
    ]
    lib.fsst_decompress_bulk.restype = i64
    lib.fsst_decompress_bulk.argtypes = [u8p, i64p, i64, u64p, u8p, u8p, i64, i64p]
    lib.fsst_decompress_bulk_at.restype = i64
    lib.fsst_decompress_bulk_at.argtypes = [u8p, i64p, i64, u64p, u8p, u8p, i64p]
    lib.bitpack.restype = i64
    lib.bitpack.argtypes = [i64p, i64, ctypes.c_int32, u8p]
    lib.bitunpack.restype = None
    lib.bitunpack.argtypes = [u8p, i64, ctypes.c_int32, i64p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vbyte_encode.restype = i64
    lib.vbyte_encode.argtypes = [i32p, i64, u8p]
    lib.vbyte_decode.restype = i64
    lib.vbyte_decode.argtypes = [u8p, i64, i64, i32p]
    lib.row_checksums.restype = None
    lib.row_checksums.argtypes = [
        ctypes.POINTER(ctypes.c_int32), i64p, i64, ctypes.POINTER(ctypes.c_uint64),
    ]
    return lib


def get_lib():
    """Return the loaded C library, or None if unavailable."""
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _LOAD_FAILED:
            try:
                _LIB = _build_and_load()
            except Exception:
                _LOAD_FAILED = True
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def compress_bulk(data: np.ndarray, offsets: np.ndarray, comp) -> tuple[np.ndarray, np.ndarray]:
    """Compress rows of `data` (uint8, concatenated; `offsets` int64
    n_rows+1) with a trained fsst.Compressor. Returns (codes, out_offsets).

    Falls back to the Python oracle when the C library is unavailable.
    """
    n_rows = len(offsets) - 1
    lib = get_lib()
    if lib is None:
        payload = bytearray()
        out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        raw = data.tobytes()
        for r in range(n_rows):
            payload += comp.compress(raw[offsets[r] : offsets[r + 1]])
            out_offsets[r + 1] = len(payload)
        return np.frombuffer(bytes(payload), dtype=np.uint8), out_offsets

    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    total = int(offsets[-1]) - int(offsets[0])
    if int(offsets[0]) != 0:
        # normalize a sliced view to zero-based offsets
        data = data[int(offsets[0]) : int(offsets[-1])]
        offsets = offsets - offsets[0]
    # lane-slotted worst-case layout: 2 bytes/input byte + 8 per row
    out = np.empty(2 * total + 8 * n_rows + 8, dtype=np.uint8)
    out_offsets = np.empty(n_rows + 1, dtype=np.int64)
    written = lib.fsst_compress_bulk(
        _ptr(data, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        n_rows,
        _ptr(comp.codes_two_byte, ctypes.c_uint16),
        _ptr(comp.pht_symbol, ctypes.c_uint64),
        _ptr(comp.pht_code, ctypes.c_uint16),
        _ptr(comp.pht_ignored, ctypes.c_uint16),
        comp.has_suffix_code,
        _ptr(out, ctypes.c_uint8),
        _ptr(out_offsets, ctypes.c_int64),
    )
    return out[:written].copy(), out_offsets


def _pad_tables(symbols: np.ndarray, lengths: np.ndarray):
    symbols = np.ascontiguousarray(symbols, dtype=np.uint64)
    lengths = np.ascontiguousarray(lengths, dtype=np.uint8)
    if len(symbols) < 256:  # C indexes blindly by code byte
        symbols = np.concatenate(
            [symbols, np.zeros(256 - len(symbols), dtype=np.uint64)]
        )
        lengths = np.concatenate(
            [lengths, np.zeros(256 - len(lengths), dtype=np.uint8)]
        )
    return symbols, lengths


def decompress_bulk_at(
    codes: np.ndarray,
    offsets: np.ndarray,
    symbols: np.ndarray,
    lengths: np.ndarray,
    out: np.ndarray,
    out_offsets: np.ndarray,
) -> int:
    """Decompress rows into KNOWN disjoint regions of `out`: row r
    decodes into out[out_offsets[r]:out_offsets[r+1]].

    Unlike decompress_bulk, out_offsets is an INPUT — the caller knows
    every row's decoded size up front (fsst_codec compresses fixed-raw-
    size segments), which lets the C kernel run N_LANES rows in
    lockstep with a branchless body. No byte is ever written outside a
    row's region, so `out` needs NO slack bytes. Returns total decoded
    bytes; raises if any row does not decode to exactly its region
    (corrupt stream)."""
    n_rows = len(offsets) - 1
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    if n_rows and int(offsets[0]) != 0:
        codes = codes[int(offsets[0]) : int(offsets[-1])]
        offsets = offsets - offsets[0]
    out_offsets = np.ascontiguousarray(out_offsets, dtype=np.int64)
    assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    lib = get_lib()
    if lib is None:
        from . import fsst as _fsst

        dec = _fsst.Decompressor(np.asarray(symbols, dtype=np.uint64),
                                 np.asarray(lengths, dtype=np.uint8))
        raw = codes.tobytes()
        for r in range(n_rows):
            piece = dec.decompress(raw[int(offsets[r]) : int(offsets[r + 1])])
            lo, hi = int(out_offsets[r]), int(out_offsets[r + 1])
            if len(piece) != hi - lo:
                raise ValueError(
                    "fsst segment decoded to unexpected size (corrupt stream)"
                )
            out[lo:hi] = np.frombuffer(piece, dtype=np.uint8)
        return int(out_offsets[-1] - out_offsets[0]) if n_rows else 0

    symbols, lengths = _pad_tables(symbols, lengths)
    written = lib.fsst_decompress_bulk_at(
        _ptr(codes, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        n_rows,
        _ptr(symbols, ctypes.c_uint64),
        _ptr(lengths, ctypes.c_uint8),
        _ptr(out, ctypes.c_uint8),
        _ptr(out_offsets, ctypes.c_int64),
    )
    if written < 0:
        raise ValueError(
            "fsst segment decoded to unexpected size (corrupt stream)"
        )
    return int(written)


def decompress_bulk(
    codes: np.ndarray, offsets: np.ndarray, symbols: np.ndarray, lengths: np.ndarray,
    decoded_size_hint: int | None = None, out: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decompress rows of `codes` back to plaintext bytes.

    decoded_size_hint, when known exactly (tokens: 4*sum(n_tok)), sizes
    the output buffer tightly; otherwise worst case 8x is used.

    `out`, when given, is the destination uint8 buffer: the decoded
    bytes are written in place (no allocation, no copy-out) and the
    returned array is a view of it. The CALLER must guarantee 8
    writable bytes of memory beyond out's end (the kernel's symbol
    writes are full 8-byte stores) — e.g. slices of a batch-level
    buffer allocated with 8 spare bytes, filled in ascending order so
    each slice's overshoot lands in the not-yet-decoded next slice.
    """
    n_rows = len(offsets) - 1
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    if int(offsets[0]) != 0:
        codes = codes[int(offsets[0]) : int(offsets[-1])]
        offsets = offsets - offsets[0]
    total = int(offsets[-1])
    lib = get_lib()
    if lib is None:
        from . import fsst as _fsst

        buf = bytearray()
        out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        dec = _fsst.Decompressor(symbols, lengths)
        raw = codes.tobytes()
        for r in range(n_rows):
            buf += dec.decompress(raw[offsets[r] : offsets[r + 1]])
            out_offsets[r + 1] = len(buf)
        decoded = np.frombuffer(bytes(buf), dtype=np.uint8)
        if out is not None:
            out[: len(decoded)] = decoded
            return out[: len(decoded)], out_offsets
        return decoded, out_offsets

    symbols, lengths = _pad_tables(symbols, lengths)
    if out is not None:
        assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
        dest, cap = out, len(out) + 8  # +8: caller-guaranteed slack
    else:
        cap = (decoded_size_hint if decoded_size_hint is not None else 8 * total) + 8
        dest = np.empty(cap, dtype=np.uint8)
    out_offsets = np.empty(n_rows + 1, dtype=np.int64)
    written = lib.fsst_decompress_bulk(
        _ptr(codes, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        n_rows,
        _ptr(symbols, ctypes.c_uint64),
        _ptr(lengths, ctypes.c_uint8),
        _ptr(dest, ctypes.c_uint8),
        cap,
        _ptr(out_offsets, ctypes.c_int64),
    )
    if written < 0:
        raise ValueError("fsst decode exceeded output capacity (bad size hint or corrupt stream)")
    if out is not None:
        return dest[:written], out_offsets
    # exact size hint: hand back a view (8-byte slack retained);
    # worst-case sizing: copy out so the 8x buffer can be freed
    if decoded_size_hint is not None and written >= cap - 8:
        return dest[:written], out_offsets
    return dest[:written].copy(), out_offsets
