"""Distributed cardinality sketch: KMV (k-minimum-values / bottom-k).

The classic distinct-count sketch (Bar-Yossef et al., "Counting
distinct elements in a data stream"): keep the k smallest hash values
of the key set; the k-th minimum estimates the distinct count as
(k-1) * HASH_SPACE / kth_min. Bottom-k sets are trivially mergeable
(union -> bottom-k), which is what makes the sketch distributed: each
batch emits at most k (group, hash) rows, the shuffle is k x groups
sized regardless of corpus size, and the merge is associative.

Unlike most sketches this one is DETERMINISTIC given the hash — and the
hash is DuckDB's own (`hash(key)`, the murmur64 finalizer already used
by corpus_split/stratified_sample) — so the oracle can recompute the
sketch EXACTLY with window functions: every output row, including the
approximate estimate, is hash-checkable. When a group's true distinct
count is under k the merged sketch holds every hash and the estimate
degrades to the exact count (standard KMV behavior, matched by the
oracle's CASE).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .curate import _murmur64

_HASH_SPACE = 1 << 63  # hashes are (murmur64 >> 1): uniform on [0, 2^63)


def kmv_distinct(ds, key_col: str, group_col: str, k: int = 16):
    """(group, n_hashes, kth_min, est_distinct) per group: bottom-k
    distinct-count sketch of `key_col` within each `group_col` value.

    Map side: per batch, distinct (group, hash) pairs reduced to the
    group's bottom-k — at most k rows per group leave a batch. Reduce
    side: groupby(group) merges by union -> unique -> bottom-k.
    est_distinct is exact integer arithmetic ((k-1) * 2^63 // kth_min,
    done in Python ints to avoid int64 overflow) so both engines
    compute the identical BIGINT.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = (_murmur64(key) >> np.uint64(1)).astype(np.int64)
        out_g, out_h = [], []
        for grp in np.unique(g):
            hu = np.unique(hv[g == grp])
            bot = np.sort(hu)[:k] if len(hu) > k else hu
            out_g.append(np.full(len(bot), grp))
            out_h.append(bot)
        return pa.table(
            {
                group_col: pa.array(
                    np.concatenate(out_g) if out_g else np.empty(0, object),
                    type=pa.string(),
                ),
                "hv": pa.array(
                    np.concatenate(out_h) if out_h else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        u = np.unique(group["hv"].to_numpy(zero_copy_only=False))
        m = min(k, len(u))
        kth = int(u[m - 1])  # np.unique returns sorted
        est = len(u) if len(u) < k else (k - 1) * _HASH_SPACE // kth
        return pa.table(
            {
                group_col: group[group_col].slice(0, 1),
                "n_hashes": pa.array([m], type=pa.int64()),
                "kth_min": pa.array([kth], type=pa.int64()),
                "est_distinct": pa.array([int(est)], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finalize, batch_format="pyarrow")
    )
