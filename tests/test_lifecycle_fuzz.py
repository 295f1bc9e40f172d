"""Model-based lifecycle fuzz: a seeded random walk of
append / delete / purge / compact / upsert operations on an encoded
corpus, validated against a plain-dict reference model after EVERY
step — the interactions (tombstones over generations, compaction of
purged files, upsert after compact, ...) are where lifecycle bugs
live, not in any single operation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fsst_ray import (
    compact_corpus,
    decode_dataset,
    delete_docs,
    encode_dataset,
    purge_deletes,
    upsert_docs,
)
from fsst_ray.state import manifest as mf


def _mk_rows(rng, ids):
    toks = [
        rng.integers(0, 50000, size=int(rng.integers(1, 120))).astype(np.int32)
        for _ in ids
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in toks], pa.int32()),
            "source": pa.array(
                [f"src{int(rng.integers(0, 3))}" for _ in ids], pa.string()
            ),
        }
    )


def _snapshot(out) -> dict[str, list[int]]:
    rows = pa.concat_tables(
        pa.table(b) for b in decode_dataset(out).iter_batches(batch_format="pyarrow")
    )
    ids = rows["doc_id"].to_pylist()
    # duplicate-blindness guard: a dict would silently collapse a
    # double-decoded row — assert id uniqueness before keying
    assert len(ids) == len(set(ids)), "duplicate doc_ids decoded"
    return dict(zip(ids, rows["tokens"].to_pylist()))


@pytest.mark.parametrize("seed", [101, 202])
def test_lifecycle_random_walk(seed, ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    out = str(tmp_path / f"walk{seed}")
    next_id = 0

    def fresh_ids(n):
        nonlocal next_id
        ids = [f"doc-{i:06d}" for i in range(next_id, next_id + n)]
        next_id += n
        return ids

    base = _mk_rows(rng, fresh_ids(60))
    encode_dataset(
        rd.from_arrow(base), out, chunk_tokens=1 << 12, bucket_tokens=1 << 13
    )
    model = dict(zip(base["doc_id"].to_pylist(), base["tokens"].to_pylist()))
    pending_deletes: set[str] = set()
    trace = []

    for step in range(14):
        live = sorted(set(model) - pending_deletes)
        op = rng.choice(["append", "delete", "purge", "compact", "upsert"])
        trace.append(op)
        if op == "append":
            rows = _mk_rows(rng, fresh_ids(int(rng.integers(3, 15))))
            # precondition: an append may not re-add a pending-deleted id
            # (fresh ids by construction)
            from fsst_ray import append_dataset

            append_dataset(rd.from_arrow(rows), out)
            model.update(zip(rows["doc_id"].to_pylist(), rows["tokens"].to_pylist()))
        elif op == "delete" and live:
            k = int(rng.integers(1, max(2, len(live) // 4)))
            victims = list(rng.choice(live, size=min(k, len(live)), replace=False))
            delete_docs(out, victims)
            for v in victims:
                del model[v]
            pending_deletes.update(victims)
        elif op == "purge":
            purge_deletes(out)
            pending_deletes.clear()
        elif op == "compact":
            compact_corpus(out, target_bytes=512 << 20)
        elif op == "upsert" and live:
            k = int(rng.integers(1, 5))
            replace = list(rng.choice(live, size=min(k, len(live)), replace=False))
            rows = _mk_rows(rng, replace + fresh_ids(2))
            upsert_docs(rd.from_arrow(rows), out)
            model.update(zip(rows["doc_id"].to_pylist(), rows["tokens"].to_pylist()))
            pending_deletes.clear()  # upsert purges internally
        got = _snapshot(out)
        assert got == model, f"divergence after step {step} ({trace})"

    # end state: manifest row count reconciles once tombstones purge
    purge_deletes(out)
    sums = mf.summarize(mf.load_manifest(out))
    assert sums["rows"] == len(model)
