"""Edit-distance-1 similarity join over a short-string column.

The entity-resolution shape (typo'd names, near-identical ids): all
unordered pairs of DISTINCT values of a column whose Levenshtein
distance is <= 1, computed without any all-pairs product.

Candidate generation is the published deletion-neighborhood method
(SymSpell / FastSS family): D(w) = {w} ∪ {w with one char deleted}.
d(a,b) <= 1  ⇒  D(a) ∩ D(b) ≠ ∅, so grouping (variant, value) rows by
variant surfaces every true pair — |D(w)| = len(w)+1 rows per value vs
|V|^2 comparisons. Sharing a variant does NOT imply d <= 1 (e.g. "ab"
and "ba" share "a"), so every candidate pair is verified with a
vectorized specialized check: equal lengths -> hamming <= 1; lengths
differing by 1 -> longest-common-prefix + longest-common-suffix >=
shorter length.

Scale shape:
  - pair pass is map-side over per-batch DISTINCT values; the exchange
    moves (variant, value) short-string rows — neighborhood-sized
    (sum of len+1 over distinct values), never corpus-sized.
  - variants are md5-parity hash-bucketed into `n_buckets` groups so
    map_groups dispatch is BOUNDED by n_buckets (the token_histogram
    lesson, vocab.py:101).
  - inside a bucket everything is numpy over padded byte matrices;
    the only Python loop is over multi-value variant runs (bounded by
    distinct shared variants, each iteration a vectorized block via
    dedup.py's _pair_blocks).
  - a verified pair is emitted EXACTLY ONCE globally with no dedup
    exchange: for a true d<=1 pair the shared variant is unique
    (substitution at position p shares only the deletion-at-p variant;
    an insertion/deletion pair shares only the shorter word itself),
    and each variant lives in exactly one bucket. Duplicate candidates
    within a bucket (false pairs like "ab"/"ba" can share two
    variants) are np.unique'd before verification. Pytest pins global
    uniqueness on randomized inputs.

Byte-level semantics: values must be ASCII (loud ValueError otherwise)
so numpy byte comparisons agree with the DuckDB `levenshtein` oracle's
character semantics. Strings longer than `max_len` raise — the
operator targets short entity columns; a long-text column would
explode the neighborhood (len+1 variants per value) by design.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .classify import _bucket_distinct
from .dedup import _pair_blocks


def _byte_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint8 zero-padded matrix + int64 lengths of a string
    array, built from the Arrow buffers (no per-row Python)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("fuzzy_pairs: null values are not comparable")
    if len(arr) == 0:
        return np.zeros((0, 1), dtype=np.uint8), np.zeros(0, dtype=np.int64)
    barr = arr.cast(pa.binary())
    n = len(barr)
    off = np.frombuffer(barr.buffers()[1], dtype=np.int32)[
        barr.offset : barr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(barr.buffers()[2], dtype=np.uint8)
    lens = np.diff(off)
    total = int(lens.sum())
    gather = np.repeat(off[:-1], lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    flat = data[gather]
    if len(flat) and flat.max() >= 128:
        raise ValueError(
            "fuzzy_pairs: non-ASCII value — byte-level edit distance would "
            "disagree with character-level semantics"
        )
    L = int(lens.max()) if n else 0
    mat = np.zeros((n, max(L, 1)), dtype=np.uint8)
    mask = np.arange(mat.shape[1])[None, :] < lens[:, None]
    mat[mask] = flat
    return mat, lens


def _strings_from_matrix(mat: np.ndarray, lens: np.ndarray) -> pa.Array:
    """StringArray from a padded byte matrix (row-major mask gather)."""
    mask = np.arange(mat.shape[1])[None, :] < lens[:, None]
    data = np.ascontiguousarray(mat)[mask]
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.string(),
        len(lens),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _deletion_rows(batch: pa.Table, column: str, max_len: int) -> pa.Table:
    """(variant, value) rows for the batch's DISTINCT values: the value
    itself plus every one-char deletion, deduped per value. One
    vectorized pass per deletion position (<= max_len passes)."""
    col = batch[column]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    distinct = pc.unique(arr)
    mat, lens = _byte_matrix(distinct)
    if len(lens) and int(lens.max()) > max_len:
        raise ValueError(
            f"fuzzy_pairs: value longer than max_len={max_len}; this "
            "operator targets short entity columns"
        )
    var_parts: list[pa.Array] = []
    val_idx_parts: list[np.ndarray] = []
    # identity variant (catches insertion/deletion pairs)
    var_parts.append(distinct)
    val_idx_parts.append(np.arange(len(lens), dtype=np.int64))
    L = mat.shape[1]
    for p in range(L):
        rows = np.nonzero(lens > p)[0]
        if len(rows) == 0:
            break
        sub = np.concatenate([mat[rows, :p], mat[rows, p + 1 :]], axis=1)
        # dedupe within-word: deleting either of two equal adjacent
        # chars yields the same variant; keep only the FIRST deletion
        # position (skip when byte p == byte p+1 within the word)
        keep = ~((lens[rows] > p + 1) & (mat[rows, p] == mat[rows, min(p + 1, L - 1)]))
        rows = rows[keep]
        sub = sub[keep]
        var_parts.append(_strings_from_matrix(sub, lens[rows] - 1))
        val_idx_parts.append(rows)
    variants = pa.concat_arrays(var_parts)
    val_idx = np.concatenate(val_idx_parts)
    return pa.table(
        {
            "variant": variants,
            "value": distinct.take(pa.array(val_idx, type=pa.int64())),
        }
    )


def _lev1_verify(
    mat: np.ndarray, lens: np.ndarray, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Boolean mask: d(value[ia], value[ib]) <= 1, vectorized over
    candidate pairs (specialized: candidates already satisfy
    |len diff| <= 1 by construction)."""
    la, lb = lens[ia], lens[ib]
    A, B = mat[ia], mat[ib]
    minl = np.minimum(la, lb)
    cols = np.arange(mat.shape[1], dtype=np.int64)[None, :]
    inb = cols < minl[:, None]
    eq = (A == B) & inb
    same = la == lb
    # equal length: hamming distance over the common span
    ham_ok = (inb.sum(axis=1) - eq.sum(axis=1)) <= 1
    # length +-1: lcp + lcs >= shorter length
    lcp = np.cumprod(eq | ~inb, axis=1).sum(axis=1)
    lcp = np.minimum(lcp, minl)
    # aligned-at-end equality: shift the longer string's columns by 1
    longer_is_a = la > lb
    Al = np.where(longer_is_a[:, None], A, B)
    Bs = np.where(longer_is_a[:, None], B, A)
    eq_end = (Al[:, 1:] == Bs[:, :-1]) & (cols[:, 1:] < np.maximum(la, lb)[:, None])
    # suffix run ending at the last column of the LONGER string:
    # reverse, cumprod, but each row ends at a different column — use
    # a reversed-index gather
    lcs = np.zeros(len(ia), dtype=np.int64)
    if eq_end.shape[1]:
        rev = eq_end[:, ::-1]
        pad = eq_end.shape[1] - np.maximum(la, lb) + 1
        pad = np.clip(pad, 0, eq_end.shape[1])
        seeded = rev | (cols[:, : eq_end.shape[1]] < pad[:, None])
        lcs = np.cumprod(seeded, axis=1).sum(axis=1) - pad
        lcs = np.clip(lcs, 0, minl)
    return np.where(same, ham_ok, (lcp + lcs) >= minl)


def _bucket_pairs(group: pa.Table, column: str, max_bucket_pairs: int) -> pa.Table:
    variants = group["variant"]
    values = group["value"]
    enc_v = pc.dictionary_encode(
        variants.combine_chunks() if isinstance(variants, pa.ChunkedArray) else variants
    )
    enc_w = pc.dictionary_encode(
        values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    )
    vc = enc_v.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    wc = enc_w.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_w = len(enc_w.dictionary)
    key = np.unique(vc * np.int64(n_w) + wc)  # distinct (variant, value)
    v_of = key // n_w
    w_of = key % n_w
    # runs of equal variant (key is sorted, so v_of is sorted)
    starts = np.nonzero(np.diff(v_of, prepend=-1))[0]
    bounds = np.concatenate([starts, [len(v_of)]])
    sizes = np.diff(bounds)
    total_pairs = int((sizes.astype(np.int64) * (sizes - 1) // 2).sum())
    if total_pairs > max_bucket_pairs:
        raise ValueError(
            f"fuzzy_pairs: bucket generates {total_pairs} candidate pairs "
            f"(> max_bucket_pairs={max_bucket_pairs}); a flood variant "
            "indicates a degenerate column for edit-distance joining"
        )
    cand_a: list[np.ndarray] = []
    cand_b: list[np.ndarray] = []
    for r in np.nonzero(sizes >= 2)[0]:  # bounded by multi-value variants
        members = w_of[bounds[r] : bounds[r + 1]]
        for ia, ib in _pair_blocks(len(members)):
            cand_a.append(members[ia])
            cand_b.append(members[ib])
    empty = pa.table(
        {
            f"{column}_a": pa.array([], type=pa.string()),
            f"{column}_b": pa.array([], type=pa.string()),
        }
    )
    if not cand_a:
        return empty
    a = np.concatenate(cand_a)
    b = np.concatenate(cand_b)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    pk = np.unique(lo * np.int64(n_w) + hi)  # dedupe within-bucket candidates
    ia = pk // n_w
    ib = pk % n_w
    mat, lens = _byte_matrix(enc_w.dictionary)
    ok = _lev1_verify(mat, lens, ia, ib)
    ia, ib = ia[ok], ib[ok]
    if len(ia) == 0:
        return empty
    # order each pair lexicographically by VALUE (codes are
    # first-appearance order, not lexicographic)
    sa = enc_w.dictionary.take(pa.array(ia, type=pa.int64()))
    sb = enc_w.dictionary.take(pa.array(ib, type=pa.int64()))
    swap = pc.greater(sa, sb).to_numpy(zero_copy_only=False)
    out_a = pc.if_else(pa.array(swap), sb, sa)
    out_b = pc.if_else(pa.array(swap), sa, sb)
    return pa.table({f"{column}_a": out_a, f"{column}_b": out_b})


def fuzzy_pairs(
    ds,
    column: str,
    max_len: int = 128,
    n_buckets: int = 32,
    max_bucket_pairs: int = 1 << 24,
):
    """All unordered pairs of distinct `column` values within
    Levenshtein distance 1, as ({column}_a, {column}_b) with a < b.
    See the module docstring for the shape and uniqueness argument."""
    if n_buckets <= 0:
        raise ValueError("fuzzy_pairs: n_buckets must be positive")

    def attach_bucket(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            batch["variant"].combine_chunks()
            if isinstance(batch["variant"], pa.ChunkedArray)
            else batch["variant"]
        )
        buckets = _bucket_distinct(enc.dictionary, n_buckets)
        per_row = buckets[enc.indices.to_numpy(zero_copy_only=False)]
        return batch.append_column("bucket", pa.array(per_row, type=pa.int64()))

    return (
        ds.map_batches(
            _deletion_rows,
            batch_format="pyarrow",
            fn_kwargs={"column": column, "max_len": max_len},
        )
        .map_batches(attach_bucket, batch_format="pyarrow")
        .groupby("bucket")  # group count BOUNDED by n_buckets
        .map_groups(
            _bucket_pairs,
            batch_format="pyarrow",
            fn_kwargs={"column": column, "max_bucket_pairs": max_bucket_pairs},
        )
    )
