"""Scale benchmark for the iterative graph operators (pagerank,
hop_distance) — the evidence that the per-iteration exchange shape and
the `_bounded_snapshot` hygiene hold at tens of millions of edges, not
just the sf0.01 driver graphs.

Graph: deterministic synthetic expander — each node i gets
`EDGES_PER_NODE` out-edges to splitmix-hashed targets, so the diameter
is O(log N) and BFS exercises a genuinely growing frontier. Built as a
streaming Dataset map (no driver-side edge list).

Usage:  python tools/graph_bench.py          # one JSON line
Env:    FSST_GRAPHBENCH_NODES (default 8_000_000)
        FSST_GRAPHBENCH_EDGES_PER_NODE (default 3)
        RAY_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from llm_bench import MemSampler, _spilled_mb  # noqa: E402  (tools sibling)


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray

    from bench import _window_probe

    n_nodes = int(os.environ.get("FSST_GRAPHBENCH_NODES", str(8_000_000)))
    k = int(os.environ.get("FSST_GRAPHBENCH_EDGES_PER_NODE", "3"))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    probe_before = _window_probe()

    ctx = ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    session_dir = ctx.address_info["session_dir"]
    import ray.data as rd

    def to_edges(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        srcs, dsts = [], []
        for j in range(k):
            x = ids + np.uint64(0x9E3779B97F4A7C15) * np.uint64(j + 1)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            srcs.append(ids.astype(np.int64))
            dsts.append((x % np.uint64(n_nodes)).astype(np.int64))
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs)),
                "dst": pa.array(np.concatenate(dsts)),
            }
        )

    def edges():
        return rd.range(n_nodes).map_batches(to_edges, batch_format="pyarrow")

    sampler = MemSampler()
    sampler.start()
    results = {}

    from fsst_ray.functions.graph import hop_distance, pagerank

    t0 = time.monotonic()
    pr = pagerank(edges(), iterations=3)
    n_ranked = pr.count()
    pr_s = time.monotonic() - t0
    spill1 = _spilled_mb(session_dir)
    results["pagerank_3iter"] = {
        "wall_sec": round(pr_s, 2),
        "edges": n_nodes * k,
        "nodes_ranked": n_ranked,
        "edges_per_sec": round(n_nodes * k * 3 / pr_s),
        "spilled_mb": spill1,
    }

    t0 = time.monotonic()
    hd = hop_distance(edges(), [0], max_hops=64)
    n_reached = hd.count()
    import pyarrow.compute as pc

    max_hops = 0
    for b in hd.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            max_hops = max(max_hops, pc.max(b["hops"]).as_py())
    bfs_s = time.monotonic() - t0
    results["hop_distance"] = {
        "wall_sec": round(bfs_s, 2),
        "edges": n_nodes * k,
        "nodes_reached": n_reached,
        "eccentricity": max_hops,
        "spilled_mb": _spilled_mb(session_dir) - spill1,
    }

    peak_gb = sampler.stop()
    out = {
        "metric": "graph_ops_scale_bench",
        "n_nodes": n_nodes,
        "edges_per_node": k,
        "num_cpus": num_cpus,
        "peak_machine_mem_gb": round(peak_gb, 2),
        "legs": results,
        "window_probe_before": probe_before,
        "window_probe_after": _window_probe(),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    main()
