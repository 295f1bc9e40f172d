"""pack_sequences: global exclusive prefix-scan semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from fsst_ray.functions.packing import pack_sequences


def _toy_ds(n_tok_by_id: dict[str, int], blocks: int = 3):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(n_tok_by_id), type=pa.string()),
            "n_tok": pa.array(list(n_tok_by_id.values()), type=pa.int32()),
            "source": pa.array(["t"] * len(n_tok_by_id), type=pa.string()),
        }
    )
    # shuffled input: packing order must come from doc_id, not block order
    perm = np.random.default_rng(7).permutation(len(tbl))
    return rd.from_arrow(tbl.take(pa.array(perm))).repartition(blocks)


def test_pack_sequences_offsets_and_spans(ray_session):
    docs = {f"d{i:03d}": ln for i, ln in enumerate([5, 10, 3, 4096, 1, 4095, 2, 7])}
    out = pack_sequences(_toy_ds(docs), seq_len=16).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    run = 0
    for _, row in out.iterrows():
        n = docs[row["doc_id"]]
        assert row["offset"] == run
        assert row["seq_first"] == run // 16
        assert row["seq_last"] == max(run + n - 1, run) // 16
        run += n


def test_pack_sequences_block_boundaries(ray_session):
    # many single-token docs across several blocks: offsets must be the
    # global rank regardless of how the sort range-partitions them
    docs = {f"x{i:04d}": 1 for i in range(500)}
    out = pack_sequences(_toy_ds(docs, blocks=8), seq_len=64).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert (out["offset"].to_numpy() == np.arange(500)).all()
    assert (out["seq_first"].to_numpy() == np.arange(500) // 64).all()
    assert (out["seq_last"] == out["seq_first"]).all()
