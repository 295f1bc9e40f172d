"""Vocabulary statistics over a pre-tokenized corpus (tokens table).

The hot path is a per-batch partial histogram (np.unique over the
list-column's flat values — no row iteration); the shuffle moves only
(token, partial_count) rows, which are vocabulary-sized, not
corpus-sized. The final top-k runs on the driver over the aggregated
vocabulary table (a corpus's distinct-token count is bounded by the
tokenizer's vocab, e.g. tens of thousands — orders of magnitude smaller
than the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.serialize import tokens_views


def _partial_counts(batch: pa.Table) -> pa.Table:
    values, _ = tokens_views(batch)
    if len(values) == 0:
        return pa.table(
            {
                "token": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    uniq, counts = np.unique(values, return_counts=True)
    return pa.table(
        {
            "token": pa.array(uniq.astype(np.int64), type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def token_histogram(ds, k: int = 100) -> pa.Table:
    """Top-k most frequent token ids: (token, n), ties broken by token
    ascending. Partial per-batch histograms -> vocabulary-sized groupby
    -> driver top-k."""
    agg = (
        ds.map_batches(_partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .sum("n")
    )
    rows = agg.take_all()
    tokens = np.array([r["token"] for r in rows], dtype=np.int64)
    counts = np.array([r["sum(n)"] for r in rows], dtype=np.int64)
    # top-k by (count desc, token asc)
    order = np.lexsort((tokens, -counts))[:k]
    return pa.table(
        {
            "token": pa.array(tokens[order], type=pa.int64()),
            "n": pa.array(counts[order], type=pa.int64()),
        }
    )
