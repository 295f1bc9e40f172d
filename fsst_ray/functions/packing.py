"""Sequence packing for LLM training: assign every document a slot in
the concatenated fixed-length training-sequence stream.

Semantics (deterministic, order = doc_id ascending): concatenate all
documents' tokens into one global stream; training sequences are
consecutive `seq_len`-token windows of that stream (documents may span
sequence boundaries — the standard "packed" pretraining layout). Each
doc gets its global token `offset` and the [seq_first, seq_last]
sequence-index range it lands in.

Scale shape: the token bytes NEVER move. The global exclusive
prefix-sum runs over the (doc_id, n_tok) projection only (~16 bytes a
row vs the ~KB token payload):

  1. project + range-sort by doc_id (the one shuffle — metadata-sized,
     0.3% of corpus bytes; packing inherently needs a total order)
  2. per-block partials: (block min doc_id, block token total) — one
     row per block to the driver
  3. driver exclusive-scans the per-block totals (rows = #blocks) and
     broadcasts {block_min_doc_id: base_offset} via ray.put
  4. second pass over the SAME materialized blocks adds the block base
     to a local cumsum — embarrassingly parallel

The projection is materialized between passes so both see identical
block boundaries; at 100 TB that materialized projection is ~0.3% of
the corpus and spills to the object store if needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(ds, seq_len: int = 4096):
    """(doc_id, offset, seq_first, seq_last): global token offset and
    sequence span per document, order = doc_id ascending. `offset` is
    the exclusive prefix sum of n_tok; seq_first = offset // seq_len,
    seq_last = (offset + n_tok - 1) // seq_len (== seq_first for empty
    docs so the span stays well-formed)."""
    import ray

    proj = ds.select_columns(["doc_id", "n_tok"]).sort("doc_id").materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        total = (
            int(np.sum(batch["n_tok"].to_numpy(zero_copy_only=False), dtype=np.int64))
            if n
            else 0
        )
        first = batch["doc_id"][0].as_py() if n else ""
        return pa.table(
            {
                "first_id": pa.array([first], type=pa.string()),
                "total": pa.array([total], type=pa.int64()),
                "rows": pa.array([n], type=pa.int64()),
            }
        )

    # one row per block; blocks hold disjoint doc_id ranges after the
    # range sort, so sorting summaries by first_id reproduces block order
    summaries = proj.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    summaries = summaries[summaries["rows"] > 0].sort_values("first_id")
    bases = {}
    run = 0
    for first_id, total in zip(summaries["first_id"], summaries["total"]):
        bases[first_id] = run
        run += int(total)
    bases_ref = ray.put(bases)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "offset": pa.array([], type=pa.int64()),
                    "seq_first": pa.array([], type=pa.int64()),
                    "seq_last": pa.array([], type=pa.int64()),
                }
            )
        base = ray.get(bases_ref)[batch["doc_id"][0].as_py()]
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = base + np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        seq_first = off // seq_len
        seq_last = np.maximum(off + n_tok - 1, off) // seq_len
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "offset": pa.array(off, type=pa.int64()),
                "seq_first": pa.array(seq_first, type=pa.int64()),
                "seq_last": pa.array(seq_last, type=pa.int64()),
            }
        )

    return proj.map_batches(assign, batch_format="pyarrow", batch_size=None)
