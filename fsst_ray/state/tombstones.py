"""Row deletion for encoded corpora: tombstones.

Deleting documents from a 100-TB encoded corpus must not rewrite
payload bytes — a delete batch lands as one parquet sidecar under
`<out>/tombstones/` (atomic tmp+rename, one file per batch, the same
uncoordinated-append discipline as manifest entries), and EVERY decode
path (full scan, point lookup, length range, per-source) filters
decoded rows against the broadcast tombstone set. Cost: O(delete-set)
storage + one vectorized membership test per decoded batch.

Contract:
- the tombstone set is assumed broadcastable (deletes are a tiny
  fraction of the corpus; the purge below resets it to empty);
- a deleted doc_id must NOT be re-appended before a purge — tombstones
  filter by id over the union corpus, so the new row would be hidden
  too (`delete_docs` of an id currently visible, then append of a
  fresh id, is the supported order);
- `verify` against the ORIGINAL input will (correctly) mismatch once
  rows are deleted — the corpus no longer equals that input. The
  driver query compares against the SQL-filtered oracle instead.

`purge_deletes` materializes the deletions: bucket files whose zone
range can contain a tombstoned id are decoded, filtered and re-encoded
with the corpus's saved per-source states (chunk payloads are
self-contained, so this is a per-file local rewrite — no shuffle, no
retraining), their manifest entries updated, and the tombstone files
cleared. Files that cannot contain a deleted id are never touched.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pyarrow as pa

from . import manifest as mf


def tombstones_dir(out_dir: str) -> pathlib.Path:
    return pathlib.Path(out_dir) / "tombstones"


def delete_docs(out_dir: str, doc_ids) -> dict:
    """Append one delete batch (sorted, deduped). Returns counts."""
    import pyarrow.parquet as pq

    ids = sorted({str(d) for d in doc_ids})
    tdir = tombstones_dir(out_dir)
    tdir.mkdir(parents=True, exist_ok=True)
    seq = len(list(tdir.glob("del_*.parquet")))
    final = tdir / f"del_{seq:05d}.parquet"
    tmp = final.with_suffix(".parquet.tmp")
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.string())}), tmp)
    os.replace(tmp, final)
    return {"deleted": len(ids), "batch_file": final.name}


def load_tombstones(out_dir: str) -> np.ndarray:
    """Sorted unique doc_id array of every delete batch (empty when
    none). Driver-side and broadcast once per job — delete-set-sized,
    never corpus-sized."""
    import pyarrow.parquet as pq

    tdir = tombstones_dir(out_dir)
    if not tdir.exists():
        return np.array([], dtype=str)
    parts = [
        pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy(
            zero_copy_only=False
        )
        for f in sorted(tdir.glob("del_*.parquet"))
    ]
    if not parts:
        return np.array([], dtype=str)
    return np.unique(np.concatenate(parts))


def tombstone_filter(out_dir: str):
    """None when the corpus has no tombstones, else a map_batches fn
    dropping tombstoned rows (vectorized sorted membership on the
    broadcast set)."""
    import ray

    dead = load_tombstones(out_dir)
    if len(dead) == 0:
        return None
    ref = ray.put(dead)

    def drop(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(d, ids), 0, len(d) - 1)
        return batch.filter(pa.array(~(d[pos] == ids)))

    return drop


def purge_deletes(out_dir: str) -> dict:
    """Materialize tombstones: re-write only the bucket files that can
    contain a deleted id (zone-map pruned), dropping those rows, then
    clear the tombstone files. Each victim file is an independent
    decode -> filter -> re-encode task (the corpus's saved per-source
    states broadcast once; chunk payloads are self-contained) fanned
    out as one Ray Data map — no shuffle, no retraining, and files
    whose zone range cannot contain a deleted id are never touched.
    Returns counts."""
    import json

    import ray
    import ray.data as rd

    from ..stages.encoder import encode_rows_to_chunks
    from ..stages.decoder import decode_chunks_batch

    from ..pipelines.compact_job import assert_readable

    # an interrupted compaction's manifest may reference superseded
    # files — rewriting one would fork the corpus; replay it first
    assert_readable(out_dir)
    dead = load_tombstones(out_dir)
    if len(dead) == 0:
        return {"purged_rows": 0, "files_rewritten": 0}
    states, _, _, config = mf.load_plan(out_dir)
    entries = mf.load_manifest(out_dir)
    cdir = mf.chunks_dir(out_dir)

    def may_hit(e: dict) -> bool:
        dmin, dmax = e.get("doc_min"), e.get("doc_max")
        if dmin is None or dmax is None:
            return True
        i = int(np.searchsorted(dead, dmin, side="left"))
        return i < len(dead) and dead[i] <= dmax

    victims = [
        {"key": k, "entry_json": json.dumps(e)}
        for k, e in sorted(entries.items())
        if may_hit(e)
    ]
    if not victims:
        for f in tombstones_dir(out_dir).glob("del_*.parquet"):
            f.unlink()
        return {"purged_rows": 0, "files_rewritten": 0}
    states_ref = ray.put(states)
    dead_ref = ray.put(dead)
    chunk_tokens = config["chunk_tokens"]
    codecs = tuple(config["codecs"])
    cdir_s = str(cdir)

    def rewrite(df):
        import pandas as pd
        import pyarrow.parquet as pq

        d = ray.get(dead_ref)
        out_rows = []
        for rec in df.to_dict("records"):
            key, e = rec["key"], json.loads(rec["entry_json"])
            path = pathlib.Path(cdir_s) / e["file"]
            rows = decode_chunks_batch(pq.read_table(path))
            ids = rows["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(d, ids), 0, len(d) - 1)
            hit = d[pos] == ids
            if not hit.any():
                out_rows.append({"key": key, "entry_json": "", "purged": 0})
                continue
            keep = rows.filter(pa.array(~hit))
            chunks = encode_rows_to_chunks(
                keep, ray.get(states_ref), None, chunk_tokens, codecs
            )
            n = chunks.num_rows
            chunks = chunks.set_column(
                chunks.schema.get_field_index("part_key"),
                "part_key",
                pa.array([key] * n, pa.string()),
            )
            chunks = chunks.set_column(
                chunks.schema.get_field_index("chunk_seq"),
                "chunk_seq",
                pa.array(range(n), pa.int32()),
            )
            tmp = path.with_suffix(".parquet.tmp")
            pq.write_table(chunks, tmp, compression="none")
            os.replace(tmp, path)
            new_e = dict(e)
            new_e.update(
                rows=keep.num_rows,
                chunks=n,
                tokens=int(pa.compute.sum(chunks["n_values"]).as_py() or 0),
                bytes_in=int(pa.compute.sum(chunks["bytes_in"]).as_py() or 0),
                bytes_out=int(pa.compute.sum(chunks["bytes_out"]).as_py() or 0),
                codecs={},
            )
            for c in chunks["codec"].to_pylist():
                new_e["codecs"][c] = new_e["codecs"].get(c, 0) + 1
            if keep.num_rows and "doc_min" in e:
                kept_ids = sorted(keep["doc_id"].to_pylist())
                new_e["doc_min"], new_e["doc_max"] = kept_ids[0], kept_ids[-1]
            out_rows.append(
                {"key": key, "entry_json": json.dumps(new_e), "purged": int(hit.sum())}
            )
        return pd.DataFrame(out_rows)

    results = (
        rd.from_items(victims)
        .map_batches(rewrite, batch_size=1, batch_format="pandas")
        .take_all()
    )
    purged_rows = 0
    rewritten = 0
    for r in results:
        purged_rows += int(r["purged"])
        if r["entry_json"]:
            entries[r["key"]] = json.loads(r["entry_json"])
            rewritten += 1
    mf.write_json_atomic(mf.compact_path(out_dir), entries)
    for p2 in mf.manifest_dir(out_dir).glob("*.json"):
        if p2.name != mf.compact_path(out_dir).name:
            p2.unlink()
    for f in tombstones_dir(out_dir).glob("del_*.parquet"):
        f.unlink()
    return {"purged_rows": purged_rows, "files_rewritten": rewritten}


def upsert_docs(ds, out_dir: str) -> dict:
    """Replace-or-insert: delete any existing rows with the incoming
    doc_ids, MATERIALIZE the deletion (purge — required because a
    tombstone would hide the re-appended id, see the module contract),
    then append the new rows as a fresh generation. Cost: one
    zone-pruned purge over the hit files + O(appended bytes) encode.
    Returns the combined metrics."""
    ids = []
    for b in ds.select_columns(["doc_id"]).iter_batches(batch_format="pyarrow"):
        ids += pa.table(b)["doc_id"].to_pylist()
    from ..pipelines.encode_job import append_dataset

    delete_docs(out_dir, ids)
    purged = purge_deletes(out_dir)
    res = append_dataset(ds, out_dir)
    return {
        "upserted": len(ids),
        "replaced_rows": purged["purged_rows"],
        "files_rewritten": purged["files_rewritten"],
        "generation": res.metrics["generation"],
    }
