"""The two-pass encode job (flagship pipeline).

Pass 1 (one streaming read): per-source deterministic sampling + token
mass -> tiny groupby -> FSST symbol tables per source + bucket plan.
Pass 2: assign (source, bucket) part keys (skew-aware: bucket count
proportional to source token mass), shuffle once on part_key, encode
each bucket into ~chunk_tokens-sized auto-selected codec chunks, write
one atomic parquet file + manifest entry per bucket.

At 100 TB: the only all-to-all exchange is the pass-2 bucket exchange
(default: a direct hash exchange onto per-bucket writer actors;
"bucketed_groupby" keeps the declarative Dataset groupby expression);
the small side (symbol tables, ~2.3 KB/source) is broadcast via the
plan / object store; no stage materializes the dataset. "streaming"
mode skips the exchange entirely (chunks follow input block
boundaries) for maximum throughput when balanced, resumable per-bucket
output files don't matter.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..codecs.select import DEFAULT_CODECS
from ..stages.encoder import (
    assign_partitions,
    build_bucket_plan,
    encode_rows_to_chunks,
)
from ..stages.trainer import train_states
from ..state import manifest as mf

MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("part_key", pa.string()),
        ("chunks", pa.int64()),
        ("rows", pa.int64()),
        ("tokens", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("codec_names", pa.list_(pa.string())),
        ("codec_counts", pa.list_(pa.int64())),
    ]
)


@dataclass
class EncodeResult:
    out_dir: str
    metrics: dict = field(default_factory=dict)
    bucket_plan: dict = field(default_factory=dict)
    mode: str = "bucketed"

    @property
    def chunks_path(self) -> str:
        return str(mf.chunks_dir(self.out_dir))


def _write_bucket_file(chunks: pa.Table, out_dir: str) -> dict:
    """Write one bucket's encoded chunk rows atomically + manifest entry."""
    import pyarrow.parquet as pq

    part_key = chunks["part_key"][0].as_py()
    chunks = chunks.set_column(
        chunks.schema.get_field_index("chunk_seq"),
        "chunk_seq",
        pa.array(np.arange(chunks.num_rows, dtype=np.int32), type=pa.int32()),
    )
    cdir = mf.chunks_dir(out_dir)
    cdir.mkdir(parents=True, exist_ok=True)
    fname = cdir / f"{mf.sanitize_part(part_key)}.parquet"
    tmp = fname.with_suffix(f".{os.getpid()}.tmp")
    pq.write_table(chunks, tmp, compression="none")  # payloads are already compressed
    os.replace(tmp, fname)

    codec_hist: dict[str, int] = {}
    for c in chunks["codec"].to_pylist():
        codec_hist[c] = codec_hist.get(c, 0) + 1
    entry = {
        "part_key": part_key,
        "status": "done",
        "chunks": chunks.num_rows,
        "rows": int(pa.compute.sum(chunks["n_rows"]).as_py() or 0),
        "tokens": int(pa.compute.sum(chunks["n_values"]).as_py() or 0),
        "bytes_in": int(pa.compute.sum(chunks["bytes_in"]).as_py() or 0),
        "bytes_out": int(pa.compute.sum(chunks["bytes_out"]).as_py() or 0),
        "codecs": codec_hist,
        "file": fname.name,
    }
    mf.write_part_entry(out_dir, entry)
    return entry


def _encode_part(
    rows: pa.Table, out_dir: str, states, chunk_tokens: int, codecs
) -> dict:
    """Reduce-side encode of one bucket: dedup retried rows (uid =
    doc_id), sort by doc_id (deterministic chunking regardless of
    arrival order), encode into full-size chunks, write + manifest."""
    part_key = rows["part_key"][0].as_py()
    doc_ids = rows["doc_id"].to_numpy(zero_copy_only=False)
    _, keep = np.unique(doc_ids, return_index=True)  # dedup + sorted by doc_id
    rows = rows.take(pa.array(keep))
    chunks = encode_rows_to_chunks(rows, states, part_key, chunk_tokens, codecs)
    return _write_bucket_file(chunks, out_dir)


def _write_part_group(group: pa.Table, *, out_dir, states, chunk_tokens, codecs) -> pa.Table:
    """groupby-reduce wrapper around _encode_part (bucketed_groupby)."""
    entry = _encode_part(group, out_dir, states, chunk_tokens, codecs)
    return pa.table(
        {
            "part_key": [entry["part_key"]],
            "chunks": [entry["chunks"]],
            "rows": [entry["rows"]],
            "tokens": [entry["tokens"]],
            "bytes_in": [entry["bytes_in"]],
            "bytes_out": [entry["bytes_out"]],
            "codec_names": [list(entry["codecs"])],
            "codec_counts": [list(entry["codecs"].values())],
        },
        schema=MANIFEST_ROW_SCHEMA,
    )


class _BucketWriter:
    """Reduce-side encoder/writer actor for the custom hash exchange.

    The Dataset API's only keyed exchange is a sort-based groupby, which
    drags every row through sort machinery and does not scale on one
    node; this actor pool implements a direct hash-partitioned exchange
    instead: map tasks push each bucket's raw rows straight to its
    writer, and the writer sorts/chunks/encodes/writes the bucket at
    finalize. Encoding reduce-side keeps chunks full-size (fragmenting
    chunks map-side multiplied per-chunk overhead ~30x). Buffers one
    bucket's raw rows until finalize — size bucket_tokens so
    (buckets/actor x bucket bytes) fits the writer heap.
    """

    def __init__(self, out_dir: str, states, chunk_tokens: int, codecs):
        self.out_dir = out_dir
        self.states = states
        self.chunk_tokens = chunk_tokens
        self.codecs = codecs
        self.buffers: list[pa.Table] = []

    def add(self, table: pa.Table) -> int:
        # O(1): just buffer — all splitting happens once in finalize, so
        # the routing tasks' delivery acks return immediately
        self.buffers.append(table)
        return table.num_rows

    def finalize(self, expected: dict[str, int]) -> list[dict]:
        if not self.buffers:
            return []
        table = pa.concat_tables(self.buffers)
        self.buffers = []
        keys = table["part_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(skeys[1:] != skeys[:-1]) + 1, [len(skeys)]]
        )
        entries = []
        for g in range(len(bounds) - 1):
            idx = order[bounds[g] : bounds[g + 1]]
            part_key = skeys[bounds[g]]
            rows = table.take(pa.array(idx))
            entry = _encode_part(
                rows, self.out_dir, self.states, self.chunk_tokens, self.codecs
            )
            want = expected.get(part_key)
            if want is not None and entry["rows"] != want:
                raise RuntimeError(
                    f"bucket {part_key}: wrote {entry['rows']} rows, expected {want} "
                    "(writer actor lost state — rerun with resume=True)"
                )
            entries.append(entry)
        return entries


def _make_streaming_encoder(states_ref, chunk_tokens, codecs):
    """Stateless task encoder for mode="streaming": no shuffle, no actor
    ramp-up; the states dict rides the object store (ray.put once) and
    is fetched zero-copy per task."""

    def encode_batch(batch: pa.Table) -> pa.Table:
        import ray

        states = ray.get(states_ref)
        return encode_rows_to_chunks(batch, states, None, chunk_tokens, codecs)

    return encode_batch


def encode_dataset(
    ds,
    out_dir: str,
    *,
    mode: str = "bucketed",
    chunk_tokens: int = 1 << 19,
    bucket_tokens: int = 16 << 20,
    codecs: tuple[str, ...] = DEFAULT_CODECS,
    resume: bool = False,
    encode_concurrency: int | None = None,
) -> EncodeResult:
    """Run the two-pass encode job over a tokens dataset."""
    import ray

    config = {
        "mode": mode,
        "chunk_tokens": chunk_tokens,
        "bucket_tokens": bucket_tokens,
        "codecs": list(codecs),
    }

    import time

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    if resume and mf.plan_path(out_dir).exists():
        states, bucket_plan, mass, saved_config = mf.load_plan(out_dir)
        assert saved_config == config, (
            f"resume config mismatch: {saved_config} != {config}"
        )
    else:
        states, mass = train_states(ds)
        bucket_plan = build_bucket_plan(mass, bucket_tokens)
        mf.save_plan(out_dir, states, bucket_plan, mass, config)
    timings["pass1_train"] = time.perf_counter() - t0

    if mode == "streaming":
        states_ref = ray.put(states)
        encoded = ds.map_batches(
            _make_streaming_encoder(states_ref, chunk_tokens, codecs),
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: chunk sizing is token-driven
        )
        cdir = mf.chunks_dir(out_dir)
        cdir.mkdir(parents=True, exist_ok=True)
        encoded.write_parquet(str(cdir), compression="none")
        timings["pass2_encode"] = time.perf_counter() - t0 - timings["pass1_train"]
        entries = _entries_from_chunks(str(cdir))
        for entry in entries.values():
            mf.write_part_entry(out_dir, entry)
        metrics = mf.summarize(entries)
        metrics["timings"] = {k: round(v, 3) for k, v in timings.items()}
        return EncodeResult(out_dir, metrics, bucket_plan, mode)

    assert mode in ("bucketed", "bucketed_groupby"), f"unknown mode {mode}"
    done = mf.completed_parts(out_dir) if resume else set()

    keyed = ds.map_batches(
        lambda b: assign_partitions(b, bucket_plan), batch_format="pyarrow", batch_size=None
    )
    if done:
        done_list = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            keys = batch["part_key"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(keys, done_list)
            return batch.filter(pa.array(keep))

        keyed = keyed.map_batches(drop_done, batch_format="pyarrow")

    if mode == "bucketed_groupby":
        # Dataset-native keyed exchange (sort shuffle); slower on one
        # node than the actor exchange below but fully declarative.
        manifest_rows = keyed.groupby("part_key").map_groups(
            lambda g: _write_part_group(
                g, out_dir=out_dir, states=states, chunk_tokens=chunk_tokens, codecs=codecs
            ),
            batch_format="pyarrow",
        )
        manifest_rows.to_pandas()  # tiny: one row per bucket
    else:
        # custom hash exchange: push each bucket's raw rows directly to
        # its writer actor (no sort); writers encode + write at
        # finalize; delivery verified by per-bucket row counts
        import zlib

        n_writers = encode_concurrency or max(
            2, int(ray.cluster_resources().get("CPU", 8))
        )
        # num_cpus=0: writers only buffer table refs until finalize, so
        # they must not steal task slots from the routing map stage
        writer_pool = [
            ray.remote(num_cpus=0)(_BucketWriter).remote(
                out_dir, states, chunk_tokens, codecs
            )
            for _ in range(n_writers)
        ]

        def route(batch: pa.Table) -> pa.Table:
            keys = batch["part_key"].to_numpy(zero_copy_only=False)
            wid = np.array(
                [zlib.crc32(k.encode()) % n_writers for k in keys], dtype=np.int64
            )
            refs = []
            for w in np.unique(wid):
                sub = batch.filter(pa.array(wid == w))
                refs.append(writer_pool[int(w)].add.remote(sub))
            # ack before the task finishes: guarantees every send is
            # processed before finalize's delivery check can run
            ray.get(refs)
            counts: dict[str, int] = {}
            for k in keys:
                counts[k] = counts.get(k, 0) + 1
            return pa.table(
                {
                    "part_key": pa.array(list(counts), type=pa.string()),
                    "n_rows": pa.array(list(counts.values()), type=pa.int64()),
                }
            )

        count_rows = keyed.map_batches(
            route, batch_format="pyarrow", batch_size=None
        ).take_all()
        expected: dict[str, int] = {}
        for r in count_rows:
            expected[r["part_key"]] = expected.get(r["part_key"], 0) + int(r["n_rows"])
        for entries_list in ray.get([w.finalize.remote(expected) for w in writer_pool]):
            del entries_list  # entries are persisted in the manifest dir
        for w in writer_pool:
            ray.kill(w)

    timings["pass2_encode"] = time.perf_counter() - t0 - timings["pass1_train"]

    entries = mf.load_manifest(out_dir)
    metrics = mf.summarize(entries)
    metrics["timings"] = {k: round(v, 3) for k, v in timings.items()}
    return EncodeResult(out_dir, metrics, bucket_plan, mode)


def _entries_from_chunks(chunks_path: str) -> dict[str, dict]:
    """Build manifest entries by scanning chunk files (streaming mode)."""
    import pyarrow.parquet as pq
    import pathlib

    entries: dict[str, dict] = {}
    for f in sorted(pathlib.Path(chunks_path).glob("*.parquet")):
        t = pq.read_table(
            f, columns=["part_key", "codec", "n_rows", "n_values", "bytes_in", "bytes_out"]
        )
        for part_key in set(t["part_key"].to_pylist()):
            sel = t.filter(pa.compute.equal(t["part_key"], part_key))
            hist: dict[str, int] = {}
            for c in sel["codec"].to_pylist():
                hist[c] = hist.get(c, 0) + 1
            entry = entries.setdefault(
                part_key,
                {
                    "part_key": part_key,
                    "status": "done",
                    "chunks": 0,
                    "rows": 0,
                    "tokens": 0,
                    "bytes_in": 0,
                    "bytes_out": 0,
                    "codecs": {},
                    "file": f.name,
                },
            )
            entry["chunks"] += sel.num_rows
            entry["rows"] += int(pa.compute.sum(sel["n_rows"]).as_py() or 0)
            entry["tokens"] += int(pa.compute.sum(sel["n_values"]).as_py() or 0)
            entry["bytes_in"] += int(pa.compute.sum(sel["bytes_in"]).as_py() or 0)
            entry["bytes_out"] += int(pa.compute.sum(sel["bytes_out"]).as_py() or 0)
            for c, n in hist.items():
                entry["codecs"][c] = entry["codecs"].get(c, 0) + n
    return entries

