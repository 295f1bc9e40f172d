"""Headline benchmark: two-pass encode + decode/verify of the synthetic
pre-tokenized corpus (input_hint schema) on Ray Data.

Usage:
    python bench.py              # one JSON line with per-stage seconds
    python bench.py --scaling    # same pipeline at num_cpus=8 and 32 in
                                 # fresh processes; reports throughputs +
                                 # scaling efficiency (N vs 4N stand-in)

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default
/root/testdata/sf0.1; only its sf suffix is used to size the synthetic
corpus — scale = sf*SCALE_PER_SF), FSST_BENCH_SCALE (explicit scale
override).
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time

# sf0.1 -> scale 300 (~520M tokens / ~2.1 GB): big enough that
# per-stage fixed overheads do not dominate the scaling signal
SCALE_PER_SF = 3000.0


def _bench_scale(sf_dir: str) -> float:
    if os.environ.get("FSST_BENCH_SCALE"):
        return float(os.environ["FSST_BENCH_SCALE"])
    name = pathlib.Path(sf_dir).name
    try:
        return float(name.replace("sf", "")) * SCALE_PER_SF
    except ValueError:
        return 300.0


def run_bench() -> dict:
    # cap per-worker polars threads: the vectorized hash calls are small
    # and a full thread pool per worker oversubscribes the node
    os.environ.setdefault("POLARS_MAX_THREADS", "2")
    # large runs: input + routed bucket tables can pin ~2x the corpus in
    # the object store; default 42.9% of RAM spills at the biggest scale
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = _bench_scale(sf_dir)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from fsst_ray import decode_dataset, encode_dataset, verify_roundtrip
    from fsst_ray.sources.tokens import ensure_tokens_parquet
    from fsst_ray.stages.decoder import dataset_checksum
    import ray.data as rd

    # corpus generation is cached; warm the page cache with an untimed scan
    path = ensure_tokens_parquet(scale)
    from fsst_ray.sources.tokens import read_parquet_bundled

    ds = read_parquet_bundled(path)
    total_tokens = int(ds.sum("n_tok"))

    # headline stages always run; the streaming stages are skipped when
    # FSST_BENCH_STAGES=headline (the --scaling runs: fewer /dev/shm +
    # object-store leftovers polluting the timed stages)
    stages = os.environ.get("FSST_BENCH_STAGES", "all")
    queries: dict[str, float] = {}
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out_root = tempfile.mkdtemp(prefix="bench_", dir=scratch)
    metrics = {}
    try:
        t0 = time.perf_counter()
        result = encode_dataset(
            ds,
            f"{out_root}/bucketed",
            mode="bucketed",
            chunk_tokens=1 << 19,
            bucket_tokens=1 << 22,  # ~4M tokens/bucket: >=2 tasks per core at sf0.1
            input_path=path,  # pruned pass 1: mass/sample reads skip token bytes
        )
        queries["encode_bucketed"] = time.perf_counter() - t0
        metrics = result.metrics

        if stages == "all":
            t0 = time.perf_counter()
            encode_dataset(
                ds,
                f"{out_root}/streaming",
                mode="streaming",
                chunk_tokens=1 << 19,
                input_path=path,
            )
            queries["encode_streaming"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        check = dataset_checksum(decode_dataset(f"{out_root}/bucketed"))
        queries["decode_verify"] = time.perf_counter() - t0
        assert check["tokens"] == total_tokens, "decode token count mismatch"

        if stages == "all":
            t0 = time.perf_counter()
            v = verify_roundtrip(ds, f"{out_root}/streaming")
            assert v["match"], v
            queries["roundtrip_verify_streaming"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(out_root, ignore_errors=True)

    headline = queries["encode_bucketed"] + queries["decode_verify"]
    out = {
        "metric": "encode+decode wall time (synthetic tokens corpus)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": scale / SCALE_PER_SF,
        "num_cpus": num_cpus,
        "tokens": total_tokens,
        "encode_tokens_per_sec": round(total_tokens / queries["encode_bucketed"]),
        "decode_tokens_per_sec": round(total_tokens / queries["decode_verify"]),
        "bytes_per_token": round(metrics.get("bytes_per_token", 0.0), 4),
        "compression_ratio": round(metrics.get("compression_ratio", 0.0), 3),
        "encode_timings": metrics.get("timings", {}),
    }
    if "encode_streaming" in queries:
        out["streaming_tokens_per_sec"] = round(
            total_tokens / queries["encode_streaming"]
        )
    return out


def run_scaling() -> dict:
    """Same input + pipeline at 8 and 32 CPUs in fresh processes."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # scaling runs use a much larger corpus (~4.2B tokens) so fixed
        # per-stage latencies do not dominate the 8-cpu leg (same input
        # at both levels; this is the configuration recorded in
        # BASELINE.md — expect ~15-20 min total). Only the headline
        # stages run: the streaming stages would leave ~8 GB of extra
        # /dev/shm output polluting the timed stages.
        env.setdefault("FSST_BENCH_SCALE", "2400")
        env.setdefault("FSST_BENCH_STAGES", "headline")
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best of two: single-node wall times are noisy (page cache,
        # object-store placement); min is the standard noise filter
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["value"] <= b["value"] else b

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    thr_lo = r_lo["tokens"] / r_lo["value"]
    thr_hi = r_hi["tokens"] / r_hi["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    stage_eff = {
        k: round((r_lo["queries"][k] / r_hi["queries"][k]) / (hi / lo), 3)
        for k in r_hi["queries"]
        if k in r_lo["queries"]
    }
    return {
        "metric": "scaling efficiency (headline encode+decode, 8 vs 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "stage_efficiency": stage_eff,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "tokens_per_sec_8": round(thr_lo),
        "tokens_per_sec_32": round(thr_hi),
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "sf": r_hi["sf"],
        "tokens": r_hi["tokens"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
    import ray

    if ray.is_initialized():
        ray.shutdown()
