"""The two-pass encode job (flagship pipeline).

Pass 1 (one streaming read): per-source deterministic sampling + token
mass -> tiny groupby -> FSST symbol tables per source + bucket plan.
Pass 2: assign (source, bucket) part keys (skew-aware: bucket count
proportional to source token mass), shuffle once on part_key, encode
each bucket into ~chunk_tokens-sized auto-selected codec chunks, write
one atomic parquet file + manifest entry per bucket.

At 100 TB: the only all-to-all exchange is the part_key groupby; the
small side (symbol tables, ~2.3 KB/source) is broadcast via plan
serialization; no stage materializes the dataset. "streaming" mode
skips the shuffle entirely (chunks follow input block boundaries) for
maximum throughput when balanced output files don't matter.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..codecs.select import DEFAULT_CODECS
from ..stages.encoder import (
    ENCODED_CHUNK_SCHEMA,
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


def _encode_and_write_group(
    group: pa.Table, *, states, chunk_tokens, codecs, out_dir
) -> pa.Table:
    """Encode one bucket and write its parquet file atomically."""
    import pyarrow.parquet as pq

    part_key = group["part_key"][0].as_py()
    order = pa.compute.sort_indices(group["doc_id"])  # deterministic chunking
    group = group.take(order)
    chunks = encode_rows_to_chunks(
        group, states, part_key, chunk_tokens, codecs
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
    return pa.table(
        {
            "part_key": [part_key],
            "chunks": [entry["chunks"]],
            "rows": [entry["rows"]],
            "tokens": [entry["tokens"]],
            "bytes_in": [entry["bytes_in"]],
            "bytes_out": [entry["bytes_out"]],
            "codec_names": [list(codec_hist)],
            "codec_counts": [list(codec_hist.values())],
        },
        schema=MANIFEST_ROW_SCHEMA,
    )


class _StreamingEncoder:
    """Actor-pool encoder for mode="streaming": no shuffle; chunks follow
    input block boundaries. States fetched once per actor."""

    def __init__(self, states_ref, chunk_tokens, codecs):
        import ray

        self.states = ray.get(states_ref) if not isinstance(states_ref, dict) else states_ref
        self.chunk_tokens = chunk_tokens
        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        return encode_rows_to_chunks(batch, self.states, None, self.chunk_tokens, self.codecs)


def encode_dataset(
    ds,
    out_dir: str,
    *,
    mode: str = "bucketed",
    chunk_tokens: int = 1 << 20,
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

    if resume and mf.plan_path(out_dir).exists():
        states, bucket_plan, mass, saved_config = mf.load_plan(out_dir)
        assert saved_config == config, (
            f"resume config mismatch: {saved_config} != {config}"
        )
    else:
        states, mass = train_states(ds)
        bucket_plan = build_bucket_plan(mass, bucket_tokens)
        mf.save_plan(out_dir, states, bucket_plan, mass, config)

    if mode == "streaming":
        states_ref = ray.put(states)
        encoded = ds.map_batches(
            _StreamingEncoder,
            batch_format="pyarrow",
            fn_constructor_args=(states_ref, chunk_tokens, codecs),
            concurrency=encode_concurrency or (1, 32),
        )
        cdir = mf.chunks_dir(out_dir)
        cdir.mkdir(parents=True, exist_ok=True)
        encoded.write_parquet(str(cdir), compression="none")
        entries = _entries_from_chunks(str(cdir))
        for entry in entries.values():
            mf.write_part_entry(out_dir, entry)
        metrics = mf.summarize(entries)
        return EncodeResult(out_dir, metrics, bucket_plan, mode)

    assert mode == "bucketed", f"unknown mode {mode}"
    done = mf.completed_parts(out_dir) if resume else set()

    keyed = ds.map_batches(
        lambda b: assign_partitions(b, bucket_plan), batch_format="pyarrow"
    )
    if done:
        done_list = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            keys = batch["part_key"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(keys, done_list)
            return batch.filter(pa.array(keep))

        keyed = keyed.map_batches(drop_done, batch_format="pyarrow")

    manifest_rows = keyed.groupby("part_key").map_groups(
        lambda g: _encode_and_write_group(
            g, states=states, chunk_tokens=chunk_tokens, codecs=codecs, out_dir=out_dir
        ),
        batch_format="pyarrow",
    )
    # consume the tiny manifest dataset (one row per bucket)
    manifest_rows.to_pandas()

    entries = mf.load_manifest(out_dir)
    metrics = mf.summarize(entries)
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


def _states_digest(states: dict[str, bytes]) -> str:
    h = hashlib.sha256()
    for s in sorted(states):
        h.update(s.encode())
        h.update(states[s])
    return h.hexdigest()[:16]
