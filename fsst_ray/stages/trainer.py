"""Pass 1: distributed per-source sampling + symbol-table training.

The reference trains one table per corpus from a <=16 KiB pseudo-random
sample (make_sample, reference src/builder.rs:535-584). Distributed
adaptation: every block contributes its K lowest-priority 512-byte row
chunks per source (priority = stable hash of doc_id), a tiny
groupby("source") selects the global K lowest, and the kernel's own
make_sample/train runs on those. Because each block emits its full
top-K, the global top-K is independent of how rows are split into
blocks — sampling is deterministic under any partitioning.

The same scan also emits per-(block, source) token-mass partials used
for skew-aware bucket planning, so pass 1 is a single read of the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.fsst_codec import train_with_ratio
from ..kernel.fsst import FSST_SAMPLELINE, FSST_SAMPLEMAX, fsst_hash
from .serialize import tokens_views

SAMPLE_K = 64  # per-source chunks kept per block AND globally (64*512B = 32 KiB = FSST_SAMPLEMAX)


def _doc_priorities(doc_ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable u64 priority per doc_id (vectorized via polars hash)."""
    import polars as pl

    s = pl.from_arrow(doc_ids if not isinstance(doc_ids, pa.ChunkedArray) else doc_ids.combine_chunks())
    return s.hash(seed=4637947).to_numpy().astype(np.uint64)


def sample_and_mass_batch(batch: pa.Table) -> pa.Table:
    """Emit per-source sample-chunk rows + one token-mass row per source."""
    values, offsets = tokens_views(batch)
    raw = values.astype("<i4", copy=False).tobytes()
    sources = batch["source"].to_numpy(zero_copy_only=False)
    n_tok = offsets[1:] - offsets[:-1]
    priorities = _doc_priorities(batch["doc_id"])

    out_source, out_priority, out_chunk, out_mass, out_rows = [], [], [], [], []
    order = np.argsort(sources, kind="stable")
    sorted_sources = sources[order]
    boundaries = np.flatnonzero(sorted_sources[1:] != sorted_sources[:-1]) + 1
    group_starts = np.concatenate([[0], boundaries, [len(sources)]])
    for g in range(len(group_starts) - 1):
        idx = order[group_starts[g] : group_starts[g + 1]]
        source = sorted_sources[group_starts[g]]
        # mass row (priority=0 marks it; chunk empty)
        out_source.append(source)
        out_priority.append(0)
        out_chunk.append(b"")
        out_mass.append(int(n_tok[idx].sum()))
        out_rows.append(len(idx))
        # sample rows: K lowest priorities among non-empty rows
        nonempty = idx[n_tok[idx] > 0]
        if len(nonempty) == 0:
            continue
        pr = priorities[nonempty]
        take = nonempty[np.argsort(pr, kind="stable")[:SAMPLE_K]]
        for i in take:
            start, end = 4 * int(offsets[i]), 4 * int(offsets[i + 1])
            row_len = end - start
            n_chunks = 1 + (row_len - 1) // FSST_SAMPLELINE
            chunk_no = fsst_hash(int(priorities[i])) % n_chunks
            lo = start + FSST_SAMPLELINE * chunk_no
            out_source.append(source)
            out_priority.append(int(priorities[i]) or 1)
            out_chunk.append(raw[lo : min(lo + FSST_SAMPLELINE, end)])
            out_mass.append(0)
            out_rows.append(0)
    return pa.table(
        {
            "source": pa.array(out_source, type=pa.string()),
            "priority": pa.array(out_priority, type=pa.uint64()),
            "chunk": pa.array(out_chunk, type=pa.large_binary()),
            "mass": pa.array(out_mass, type=pa.int64()),
            "rows": pa.array(out_rows, type=pa.int64()),
        }
    )


def train_source_group(group: pa.Table) -> pa.Table:
    """Reduce one source's sample+mass rows to (source, state, mass, rows)."""
    source = group["source"][0].as_py()
    mass = int(pa.compute.sum(group["mass"]).as_py() or 0)
    rows = int(pa.compute.sum(group["rows"]).as_py() or 0)
    pr = group["priority"].to_numpy(zero_copy_only=False)
    chunks = group["chunk"].to_pylist()
    sample_rows = [(p, c) for p, c in zip(pr, chunks) if p != 0]
    sample_rows.sort(key=lambda t: t[0])
    lines, total = [], 0
    for _, c in sample_rows:
        if total >= FSST_SAMPLEMAX:
            break
        lines.append(c)
        total += len(c)
    state = train_with_ratio(lines)
    return pa.table(
        {
            "source": pa.array([source], type=pa.string()),
            "state": pa.array([state["fsst"]], type=pa.large_binary()),
            "ratio": pa.array([state["ratio"]], type=pa.float64()),
            "mass": pa.array([mass], type=pa.int64()),
            "rows": pa.array([rows], type=pa.int64()),
        }
    )


AUTO_GROUPBY_BLOCKS = 512  # driver reduce holds ~blocks x 32 KiB of samples


def train_states(ds, reduce: str = "auto") -> tuple[dict[str, bytes], dict[str, dict]]:
    """Run pass 1. Returns ({source: fsst state blob},
    {source: {"tokens": n, "rows": n}}).

    reduce="driver": collect the bounded sample output
    (<= blocks x sources-per-block x 32 KiB) and train per source in
    parallel ray tasks — no shuffle, ~seconds of latency saved.
    reduce="groupby": distributed groupby reduce — driver memory is then
    bounded by #sources, not #blocks.
    reduce="auto" (default): driver for small inputs, groupby once the
    input has enough blocks that the sample set would strain the driver.
    """
    if reduce == "auto":
        try:
            n_blocks = len(ds.input_files())
        except Exception:
            n_blocks = 0
        reduce = "groupby" if n_blocks > AUTO_GROUPBY_BLOCKS else "driver"
    tiny = ds.map_batches(
        sample_and_mass_batch, batch_format="pyarrow", batch_size=None
    )
    if reduce == "groupby":
        reduced = tiny.groupby("source").map_groups(train_source_group, batch_format="pyarrow")
        out = reduced.to_pandas()  # one row per source — tiny
        states = {
            r.source: {"fsst": bytes(r.state), "ratio": float(r.ratio)}
            for r in out.itertuples()
        }
        mass = {r.source: {"tokens": int(r.mass), "rows": int(r.rows)} for r in out.itertuples()}
        return states, mass

    import ray

    rows = tiny.take_all()
    by_source: dict[str, dict] = {}
    for r in rows:
        info = by_source.setdefault(r["source"], {"tokens": 0, "rows": 0, "samples": []})
        if r["priority"] == 0:
            info["tokens"] += int(r["mass"])
            info["rows"] += int(r["rows"])
        else:
            info["samples"].append((int(r["priority"]), r["chunk"]))

    @ray.remote(num_cpus=1)
    def _train(samples: list[tuple[int, bytes]]) -> dict:
        from fsst_ray.codecs.fsst_codec import train_with_ratio

        samples.sort(key=lambda t: t[0])
        lines, total = [], 0
        for _, c in samples:
            if total >= FSST_SAMPLEMAX:
                break
            lines.append(bytes(c))
            total += len(c)
        return train_with_ratio(lines)

    sources = sorted(by_source)
    futures = {s: _train.remote(by_source[s]["samples"]) for s in sources}
    states = {s: ray.get(f) for s, f in futures.items()}
    mass = {s: {"tokens": by_source[s]["tokens"], "rows": by_source[s]["rows"]} for s in sources}
    return states, mass
