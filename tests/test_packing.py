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


def test_split_windows_edges(ray_session):
    import ray.data as rd

    from fsst_ray.functions.packing import split_windows

    docs = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "tokens": pa.array(
                [list(range(10)), list(range(8)), [], [5]],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([10, 8, 0, 1], pa.int32()),
            "source": pa.array(["s"] * 4, pa.string()),
        }
    )
    out = (
        split_windows(rd.from_arrow(docs), seq_len=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "win_idx"])
        .reset_index(drop=True)
    )

    def ref(tokens, seq_len=4, stride=3):
        wins = []
        for w in range(0, -(-len(tokens) // stride)):
            s = w * stride
            win = tokens[s : s + seq_len]
            wins.append(
                (w, s, len(win), sum((t + 1) * (i + 1) for i, t in enumerate(win)))
            )
        return wins

    want = []
    for did, toks in [("a", list(range(10))), ("b", list(range(8))), ("d", [5])]:
        for w, s, l, c in ref(toks):
            want.append((did, w, s, l, c))
    got = list(
        zip(out["doc_id"], out["win_idx"], out["win_start"], out["win_len"], out["win_checksum"])
    )
    assert got == want
    # doc "a" (10 toks, stride 3) -> 4 windows, last is length 1
    assert sum(1 for g in got if g[0] == "a") == 4
    assert [g for g in got if g[0] == "a"][-1][3] == 1
    # empty doc "c" emits nothing
    assert not any(g[0] == "c" for g in got)
