"""Zero-copy bridges between Arrow list<int32> token columns and the
numpy byte/values views the kernels operate on.

The serialized form of a row is the little-endian int32 values buffer
of its tokens array — exactly the reference's notion of a "line"
(reference compresses raw byte strings: src/lib.rs:518, 416).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def tokens_views(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(values int32, offsets int64) views of the tokens column.

    Values are the concatenated tokens of all rows in the batch;
    offsets[i] is row i's start. Zero-copy where Arrow allows.
    """
    col = batch["tokens"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.flatten()  # respects array offset/length
    np_values = values.to_numpy(zero_copy_only=False)
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    return np.ascontiguousarray(np_values, dtype=np.int32), offsets


def row_byte_views(values: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Per-row serialized byte strings (for training samples)."""
    raw = values.astype("<i4", copy=False).tobytes()
    return [raw[4 * offsets[i] : 4 * offsets[i + 1]] for i in range(len(offsets) - 1)]


def tokens_from_values(values: np.ndarray, n_tok: np.ndarray) -> pa.ListArray:
    """Rebuild a list<int32> array from concatenated values + lengths."""
    offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    assert offsets[-1] == len(values), "n_tok does not cover values"
    if offsets[-1] >= 2**31:
        raise ValueError(
            f"batch holds {offsets[-1]} token values — exceeds list<int32> "
            "offset range; reduce the decode batch/block size"
        )
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()),
        pa.array(np.ascontiguousarray(values, dtype=np.int32), type=pa.int32()),
    )
