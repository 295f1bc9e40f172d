"""Decode pass + round-trip verification."""

from __future__ import annotations

from ..stages.decoder import dataset_checksum, decode_chunks_batch
from ..state import manifest as mf


def read_encoded(out_dir: str):
    """Ray Dataset of encoded-chunk rows.

    Encoded chunk rows are a few MB each, so the default 128 MB block
    target would bundle many bucket files into one read task and cap
    decode parallelism; split to roughly one block per bucket file.
    """
    import pathlib

    import ray
    import ray.data as rd

    from .compact_job import assert_readable

    assert_readable(out_dir)
    path = mf.chunks_dir(out_dir)
    nbytes = sum(f.stat().st_size for f in pathlib.Path(path).glob("*.parquet"))
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # bytes-aware block count (same rule as read_parquet_bundled but
    # 4x CPUs): decode blocks are heavy (payload decode writes ~2x the
    # encoded bytes), so ~2 blocks/CPU quantizes badly — a 33-block
    # read on 16 CPUs gives some workers 3 blocks and a 50% tail
    # (measured: the 16-CPU decode leg swung 10.5-18.9 s on it)
    blocks = max(4 * cpus, -(-nbytes // (256 << 20)))
    return rd.read_parquet(
        str(path),
        file_extensions=["parquet"],
        override_num_blocks=blocks,
    )


def decode_dataset(encoded_or_dir, out_dir: str | None = None):
    """Encoded chunks -> original (doc_id, tokens, n_tok, source) rows.

    Tombstone contract (state/tombstones.py: "EVERY decode path
    filters"): given a directory — or a Dataset plus `out_dir` — the
    corpus tombstone set is applied and deleted rows never surface. A
    bare Dataset carries no pointer to its corpus directory, so callers
    composing `read_encoded(d)` with `decode_dataset(ds)` MUST pass
    `out_dir=d`, otherwise deleted rows resurrect."""
    if isinstance(encoded_or_dir, str):
        out_dir = encoded_or_dir
        encoded = read_encoded(encoded_or_dir)
    else:
        encoded = encoded_or_dir
    rows = encoded.map_batches(
        decode_chunks_batch, batch_format="pyarrow", batch_size=None
    )
    if out_dir is not None:
        rows = _apply_tombstones(out_dir, rows)
    return rows


def verify_roundtrip(original_ds, encoded_or_dir) -> dict:
    """Streaming checksum comparison: decoded content == original content
    (order-insensitive, per-row order-sensitive within tokens)."""
    left = dataset_checksum(original_ds)
    right = dataset_checksum(decode_dataset(encoded_or_dir))
    return {
        "match": left == right,
        "original": left,
        "decoded": right,
    }


def _empty_rows_table():
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "tokens": pa.array([], type=pa.list_(pa.int32())),
            "n_tok": pa.array([], type=pa.int32()),
            "source": pa.array([], type=pa.string()),
        }
    )


def _collect_hits(scan_files, columns, find_hits):
    """Phase A of a selective decode: projected scan of chunk-index
    columns (the payload column — ~99% of encoded bytes — is never
    read), returning the small (part_key, chunk_seq) hits table on the
    driver (bounded: at most one row per hit chunk)."""
    import pyarrow as pa
    import ray.data as rd

    index = rd.read_parquet(
        scan_files, file_extensions=["parquet"], columns=columns
    ).map_batches(find_hits, batch_format="pyarrow")
    batches = [pa.table(b) for b in index.iter_batches(batch_format="pyarrow")]
    if batches:
        return pa.concat_tables(batches)
    # iter_batches yields nothing when every block filtered empty
    return pa.table(
        {
            "part_key": pa.array([], type=pa.string()),
            "chunk_seq": pa.array([], type=pa.int32()),
        }
    )


def _apply_tombstones(out_dir: str, rows_ds):
    from ..state.tombstones import tombstone_filter

    drop = tombstone_filter(out_dir)
    return rows_ds if drop is None else rows_ds.map_batches(
        drop, batch_format="pyarrow"
    )


def _phase_b_decode(path, entries, hits, stats, trim_fn):
    """Phase B of a selective decode: re-read just the HIT bucket files
    (file-level pruning from the manifest's part->file map), decode only
    the hit (part_key, chunk_seq) chunks, and trim decoded rows with
    `trim_fn`. Shared by decode_select and decode_ntok_range."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    hit_parts = set(hits["part_key"].to_pylist())
    hit_files = [str(path / e["file"]) for k, e in entries.items() if k in hit_parts]
    if stats is not None:
        stats["files_total"] = len(entries)
        stats["files_read"] = len(hit_files)
        stats["chunks_total"] = sum(e["chunks"] for e in entries.values())
        stats["chunks_decoded"] = hits.num_rows
    if not hit_files:
        return rd.from_arrow(_empty_rows_table())

    # composite key (part_key, chunk_seq) membership, vectorized
    hit_keys = pa.array(
        [
            f"{k}#{s}"
            for k, s in zip(hits["part_key"].to_pylist(), hits["chunk_seq"].to_pylist())
        ],
        type=pa.string(),
    )
    hit_keys_ref = ray.put(hit_keys)

    def decode_hit_chunks(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            batch["part_key"],
            pc.cast(batch["chunk_seq"], pa.string()),
            "#",
        )
        batch = batch.filter(pc.is_in(keys, value_set=ray.get(hit_keys_ref)))
        if batch.num_rows == 0:
            return _empty_rows_table()
        return trim_fn(decode_chunks_batch(batch))

    return rd.read_parquet(
        hit_files, file_extensions=["parquet"]
    ).map_batches(decode_hit_chunks, batch_format="pyarrow", batch_size=None)


def decode_select(out_dir: str, doc_ids, stats: dict | None = None):
    """Selective decode: the original rows for exactly `doc_ids`.

    The point-lookup path over an encoded corpus — decodes only the
    chunks that contain requested docs instead of scanning everything.
    Two-phase pruned read:

    - **Phase A** scans ONLY the chunk-index columns (`part_key`,
      `chunk_seq`, `doc_id`) — parquet column projection never touches
      the `payload` column, which is ~99% of the encoded bytes — and
      collects the hit chunk keys (driver-bounded: at most one key per
      requested doc per chunk, i.e. <= len(doc_ids)).
    - **Phase B** re-reads just the HIT bucket files (file-level
      pruning from the manifest's part->file map), filters to the hit
      chunk_seqs, decodes only those chunks, and trims the decoded
      rows to the requested ids.

    At cluster scale the same shape holds: phase A is a cheap
    projected scan over index columns, phase B reads O(hits) files.
    If `stats` is passed, records files_total / files_read /
    chunks_decoded for pruning assertions.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    wanted_sorted = sorted({str(d) for d in doc_ids})
    wanted = pa.array(wanted_sorted, type=pa.string())
    wanted_ref = ray.put(wanted)
    path = mf.chunks_dir(out_dir)

    # zone-map pruning BEFORE phase A: skip files whose lexicographic
    # [doc_min, doc_max] range (recorded in the manifest at encode
    # time) cannot contain any requested id. Entries from older
    # manifests without zone fields are always scanned.
    from .compact_job import assert_readable

    assert_readable(out_dir)
    entries = mf.load_manifest(out_dir)
    wanted_np = np.array(wanted_sorted)

    def _zone_may_hit(e: dict) -> bool:
        dmin, dmax = e.get("doc_min"), e.get("doc_max")
        if dmin is None or dmax is None or not len(wanted_np):
            return True
        i = int(np.searchsorted(wanted_np, dmin, side="left"))
        return i < len(wanted_np) and wanted_np[i] <= dmax

    scan_entries = {k: e for k, e in entries.items() if _zone_may_hit(e)}
    scan_files = [str(path / e["file"]) for e in scan_entries.values()]
    if stats is not None:
        stats["files_zone_scanned"] = len(scan_files)

    if not scan_files:
        if stats is not None:
            stats["files_total"] = len(entries)
            stats["files_read"] = 0
            stats["chunks_total"] = sum(e["chunks"] for e in entries.values())
            stats["chunks_decoded"] = 0
        return rd.from_arrow(_empty_rows_table())

    def find_hits(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        col = batch["doc_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        isin = pc.is_in(pc.list_flatten(col), value_set=w)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        hit_rows = np.unique(parents[isin.to_numpy(zero_copy_only=False)])
        mask = np.zeros(batch.num_rows, dtype=bool)
        mask[hit_rows] = True
        return batch.select(["part_key", "chunk_seq"]).filter(pa.array(mask))

    hits = _collect_hits(scan_files, ["part_key", "chunk_seq", "doc_id"], find_hits)

    def trim(rows: pa.Table) -> pa.Table:
        return rows.filter(pc.is_in(rows["doc_id"], value_set=ray.get(wanted_ref)))

    return _apply_tombstones(out_dir, _phase_b_decode(path, entries, hits, stats, trim))


def decode_ntok_range(out_dir: str, lo: int, hi: int, stats: dict | None = None):
    """Selective decode by sequence length: rows with lo <= n_tok <= hi.

    The length-predicate sibling of `decode_select` — the read pattern
    of a curriculum / length-bucketed training selection ("decode only
    the long documents"). Same two-phase pruned shape:

    - **Phase A** scans ONLY (part_key, chunk_seq, n_tok) — parquet
      projection never touches the payload column. A chunk is hit iff
      it contains at least one row in range (exact test over the
      flattened per-row n_tok index, not a min/max approximation).
    - **Phase B** re-reads just the hit bucket files, decodes only hit
      chunks, and trims decoded rows to the range.

    File-level doc-id zone maps cannot help here by design (buckets are
    doc-hash assigned for write balance, so every bucket spans most of
    the length distribution) — but whole files are still skipped when
    none of their chunks hit, which is exactly the selective-tail case
    (n_tok above p99) where this read matters at 100 TB.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    path = mf.chunks_dir(out_dir)
    from .compact_job import assert_readable

    assert_readable(out_dir)
    entries = mf.load_manifest(out_dir)
    scan_files = [str(path / e["file"]) for e in entries.values()]
    if not scan_files:
        if stats is not None:
            stats["files_total"] = 0
            stats["files_read"] = 0
            stats["chunks_total"] = 0
            stats["chunks_decoded"] = 0
        return rd.from_arrow(_empty_rows_table())

    def find_hits(batch: pa.Table) -> pa.Table:
        col = batch["n_tok"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        in_range = (flat >= lo) & (flat <= hi)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        hit_rows = np.unique(parents[in_range])
        mask = np.zeros(batch.num_rows, dtype=bool)
        mask[hit_rows] = True
        return batch.select(["part_key", "chunk_seq"]).filter(pa.array(mask))

    hits = _collect_hits(scan_files, ["part_key", "chunk_seq", "n_tok"], find_hits)

    def trim(rows: pa.Table) -> pa.Table:
        n = rows["n_tok"]
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        keep = pc.and_(
            pc.greater_equal(n, pa.scalar(lo, type=n.type)),
            pc.less_equal(n, pa.scalar(hi, type=n.type)),
        )
        return rows.filter(keep)

    return _apply_tombstones(out_dir, _phase_b_decode(path, entries, hits, stats, trim))


def generation_of_key(part_key: str) -> int:
    """Append generation encoded in a part key: base buckets
    ('{source}:{bucket}') are generation 0, appended buckets
    ('{source}:g{N}-{bucket}') are N. Compacted keys
    ('{source}:c{gen}-{seq}') RAISE — compaction folds generations
    into one file set, so as-of-generation reads are no longer
    possible (the documented trade of compact_corpus)."""
    seg = part_key.split(":", 1)[1]
    if seg[:1] == "c":
        raise ValueError(
            f"part key {part_key!r} is compacted: generations were folded "
            "by compact_corpus, so generation time travel is unavailable "
            "on this corpus"
        )
    if seg[:1] == "g":
        return int(seg[1 : seg.index("-")])
    return 0


def decode_generation(out_dir: str, max_gen: int, stats: dict | None = None):
    """As-of-generation decode (time travel over incremental appends):
    only rows ingested at append generation <= `max_gen` (base encode =
    generation 0). Pruning is purely manifest-level, like
    `decode_source`: generations are encoded in part keys and buckets
    never span generations, so ONLY the selected generations' bucket
    files are opened. Tombstones still apply (current deletes filter
    every decode path — "as of generation g, minus rows since deleted";
    documented). Raises on a compacted corpus (generations folded)."""
    import ray.data as rd

    from .compact_job import assert_readable

    assert_readable(out_dir)
    path = mf.chunks_dir(out_dir)
    entries = mf.load_manifest(out_dir)
    files = [
        str(path / e["file"])
        for key, e in entries.items()
        if generation_of_key(key) <= max_gen
    ]
    if stats is not None:
        stats["files_total"] = len(entries)
        stats["files_read"] = len(files)
    if not files:
        return rd.from_arrow(_empty_rows_table())
    rows = rd.read_parquet(
        files, override_num_blocks=max(len(files), 1)
    ).map_batches(decode_chunks_batch, batch_format="pyarrow", batch_size=None)
    return _apply_tombstones(out_dir, rows)


def decode_source(out_dir: str, sources, stats: dict | None = None):
    """Selective decode by SOURCE: the per-source export read ("give me
    the english split"). Buckets are per-source by construction
    (part_key = '{source}:...'), so the pruning is purely manifest-
    level — only the requested sources' bucket files are ever opened;
    no phase-A scan is needed at all. At 100 TB this reads exactly the
    selected sources' share of the corpus."""
    import pyarrow.compute as pc
    import ray.data as rd

    wanted = set(sources) if not isinstance(sources, str) else {sources}
    path = mf.chunks_dir(out_dir)
    from .compact_job import assert_readable

    assert_readable(out_dir)
    entries = mf.load_manifest(out_dir)
    files = [
        str(path / e["file"])
        for key, e in entries.items()
        if key.split(":", 1)[0] in wanted
    ]
    if stats is not None:
        stats["files_total"] = len(entries)
        stats["files_read"] = len(files)
    if not files:
        return rd.from_arrow(_empty_rows_table())
    import pyarrow as pa

    rows = rd.read_parquet(
        files, override_num_blocks=max(len(files), 1)
    ).map_batches(decode_chunks_batch, batch_format="pyarrow", batch_size=None)
    value_set = pa.array(sorted(wanted), pa.string())

    def enforce(batch: pa.Table) -> pa.Table:
        # belt-and-braces: buckets are per-source, but enforce the
        # predicate on decoded rows anyway
        return batch.filter(pc.is_in(batch["source"], value_set=value_set))

    return _apply_tombstones(out_dir, rows.map_batches(enforce, batch_format="pyarrow"))
