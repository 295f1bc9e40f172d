"""Scale benchmark for the LLM-data-operator suite (VERDICT r4 item 7).

BENCH_r*.json times only the codec pipelines; this tool times the
text-curation operators at a documents volume hundreds of times the
driver's sf0.1 table (5,000 docs): a synthetic multi-language corpus
with planted exact duplicates and near-duplicates, streamed through

  1. `curate`        — quality + langid filter + exact-dedup winners
  2. `minhash_dedup` — forced onto the distributed-CC closure path
                       (driver_edge_limit=0), i.e. shingle -> 64-perm
                       minhash -> banded LSH buckets -> in-bucket
                       verification -> large-star/small-star connected
                       components -> cluster assignment
  3. the same dedup over the LEAN band exchange (16 B/row band rows +
     candidate-only signature recompute; summary must match leg 2)
  4. `score_documents` — batched linear-model inference (broadcast
     weights, autoscaling actor pool)
  5. `segment_dedup`   — segment-level exact substring dedup (hashed
     projection range sort + map-side rebuild)

and records wall time, rows in/out, text bytes, docs/sec, peak machine
memory (MemSampler from tools/bigrun.py), and the host window probes
(this VM has multi-hour degraded tmpfs windows; a probe next to every
number keeps it honest — see BASELINE.md "Round-3 finding").

The corpus is deterministic (seeded per shard, cached under /tmp and
keyed by a generation version + doc count), so reruns are comparable.
Planted structure: every 97th doc has an exact copy, every 40th a
near-copy (one word changed), both at id + 100M — so exact-dedup and
near-dedup both do real work and output sizes are checkable.

Usage:  python tools/llm_bench.py            # one JSON line
Env:    FSST_LLMBENCH_DOCS  (default 2,400,000 base docs = 480x sf0.1)
        RAY_GRAFT_CPUS      (default 32)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.bigrun import MemSampler  # noqa: E402

_GEN_VERSION = 1
_DUP_OFFSET = 100_000_000
_SHARD_DOCS = 100_000

# per-language word pools: that language's stopwords dominate so the
# stopword-vote langid has real signal, plus a shared content vocab
_CONTENT_VOCAB = [f"w{i:04d}" for i in range(4000)]


def docs_dir(n_docs: int) -> pathlib.Path:
    return pathlib.Path(f"/tmp/fsst_ray_docs/v{_GEN_VERSION}_n{n_docs}")


def _gen_shard(shard: int, n: int, start_id: int):
    """Deterministic shard: numpy-seeded by shard index alone."""
    import numpy as np
    import pyarrow as pa

    from fsst_ray.functions.textstats import LANGS, STOPWORDS

    rng = np.random.default_rng(1_000_003 + shard)
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    # 60% en, 10% each other language
    lang_idx = rng.choice(
        len(LANGS), size=n, p=[0.1 if l != "en" else 0.6 for l in LANGS]
    )
    lengths = rng.integers(40, 120, size=n)
    # zipf-ish content word draw shared across languages
    zipf = rng.zipf(1.3, size=int(lengths.sum())) % len(_CONTENT_VOCAB)
    texts = []
    pos = 0
    stop_lists = [list(STOPWORDS[l]) for l in LANGS]
    for i in range(n):
        L = int(lengths[i])
        words = [_CONTENT_VOCAB[j] for j in zipf[pos : pos + L]]
        pos += L
        # interleave that doc's language stopwords at every 3rd slot
        sw = stop_lists[lang_idx[i]]
        for j in range(0, L, 3):
            words[j] = sw[(i + j) % len(sw)]
        texts.append(" ".join(words))
    base = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[j] for j in lang_idx], pa.string()),
        }
    )
    # planted copies land at id + _DUP_OFFSET (disjoint id space)
    extra_ids, extra_text, extra_lang = [], [], []
    for i in range(n):
        did = int(ids[i])
        if did % 97 == 0:  # exact duplicate
            extra_ids.append(did + _DUP_OFFSET)
            extra_text.append(texts[i])
            extra_lang.append(LANGS[lang_idx[i]])
        elif did % 40 == 0:  # near duplicate: one word changed
            w = texts[i].split(" ")
            w[-1] = "zzznear"
            extra_ids.append(did + _DUP_OFFSET)
            extra_text.append(" ".join(w))
            extra_lang.append(LANGS[lang_idx[i]])
    import pyarrow as pa2

    extra = pa2.table(
        {
            "doc_id": pa2.array(extra_ids, pa2.int64()),
            "text": pa2.array(extra_text, pa2.string()),
            "lang": pa2.array(extra_lang, pa2.string()),
        }
    )
    return pa.concat_tables([base, extra])


def ensure_docs_parquet(n_docs: int) -> str:
    """Generate (once, cached) the synthetic documents corpus; one
    parquet file per shard, shards generated in parallel Ray tasks."""
    import ray

    out = docs_dir(n_docs)
    done = out / "_COMPLETE"
    if done.exists():
        return str(out)
    tmp = out.parent / (out.name + ".tmp")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)

    @ray.remote(num_cpus=1)
    def write_shard(shard: int, n: int, start_id: int) -> int:
        import pyarrow.parquet as pq

        t = _gen_shard(shard, n, start_id)
        pq.write_table(t, tmp / f"shard-{shard:05d}.parquet")
        return t.num_rows

    refs = []
    shard = 0
    for start in range(0, n_docs, _SHARD_DOCS):
        n = min(_SHARD_DOCS, n_docs - start)
        refs.append(write_shard.remote(shard, n, start))
        shard += 1
    total = sum(ray.get(refs))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    (out / "_COMPLETE").write_text(str(total))
    return str(out)


def _spilled_mb(session_dir: str) -> int:
    """Cumulative object-store spill (MiB) for THIS bench's ray
    session, parsed from the raylet's cumulative "Spilled N MiB"
    progress lines. Returns 0 when nothing spilled (the line never
    appears). The spill *directory* can't be used: ray deletes spill
    files as objects are restored, so the log line is the only
    cumulative record. The session dir must come from ray.init()'s
    address_info — `session_latest` is a symlink any concurrent
    session repoints (observed mid-bench). Sampled after each leg;
    per-leg deltas quantify which exchange spilled."""
    import re

    best = 0
    for f in pathlib.Path(session_dir, "logs").glob("raylet*"):
        try:
            for m in re.finditer(rb"Spilled (\d+) MiB", f.read_bytes()):
                best = max(best, int(m.group(1)))
        except OSError:
            pass
    return best


def main() -> None:
    import ray

    from bench import _window_probe

    n_docs = int(os.environ.get("FSST_LLMBENCH_DOCS", str(2_400_000)))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    probe_before = _window_probe()

    if not ray.is_initialized():
        ctx = ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
        session_dir = ctx.address_info["session_dir"]
    else:
        session_dir = "/tmp/ray/ray/session_latest"
    import ray.data as rd

    path = ensure_docs_parquet(n_docs)
    files = sorted(str(p) for p in pathlib.Path(path).glob("*.parquet"))
    text_bytes = sum(os.path.getsize(f) for f in files)

    sampler = MemSampler()
    sampler.start()
    results = {}

    # -- leg 1: curate ------------------------------------------------
    ds = rd.read_parquet(files, columns=["doc_id", "text"])
    total_rows = ds.count()
    t0 = time.monotonic()
    from fsst_ray.functions.curate import curate

    kept = curate(ds).count()
    curate_s = time.monotonic() - t0
    spill_after_curate = _spilled_mb(session_dir)
    results["curate"] = {
        "wall_sec": round(curate_s, 2),
        "rows_in": total_rows,
        "rows_out": kept,
        "docs_per_sec": round(total_rows / curate_s),
        "spilled_mb": spill_after_curate,
    }

    # -- leg 2: minhash near-dedup on the distributed-CC path ---------
    ds2 = rd.read_parquet(files, columns=["doc_id", "text"])
    t0 = time.monotonic()
    from fsst_ray.functions.dedup import minhash_dedup

    labels = minhash_dedup(ds2, jaccard_threshold=0.7, driver_edge_limit=0)
    import pyarrow.compute as pc

    def clustered(batch):
        import pyarrow as pa

        neq = pc.sum(
            pc.cast(
                pc.not_equal(batch["doc_id"], batch["cluster_id"]), "int64"
            )
        ).as_py() or 0
        return pa.table({"n": pa.array([batch.num_rows]), "moved": pa.array([neq])})

    agg = labels.map_batches(clustered, batch_format="pyarrow").take_all()
    minhash_s = time.monotonic() - t0
    n_out = sum(r["n"] for r in agg)
    n_moved = sum(r["moved"] for r in agg)
    spill_after_carry = _spilled_mb(session_dir)
    results["minhash_dedup_cc"] = {
        "wall_sec": round(minhash_s, 2),
        "rows_in": total_rows,
        "rows_labeled": n_out,
        "rows_in_nontrivial_cluster": n_moved,
        "docs_per_sec": round(total_rows / minhash_s),
        "spilled_mb": spill_after_carry - spill_after_curate,
    }

    # -- leg 3: same dedup over the LEAN band exchange -----------------
    # (16 B/row band rows + candidate-only signature recompute; output
    # pinned bit-identical in tests — here the cluster summary must
    # match leg 2 exactly)
    if os.environ.get("FSST_LLMBENCH_SKIP_LEAN", "0") != "1":
        ds3 = rd.read_parquet(files, columns=["doc_id", "text"])
        t0 = time.monotonic()
        labels3 = minhash_dedup(
            ds3, jaccard_threshold=0.7, driver_edge_limit=0, lean_exchange=True
        )
        agg3 = labels3.map_batches(clustered, batch_format="pyarrow").take_all()
        lean_s = time.monotonic() - t0
        results["minhash_dedup_cc_lean"] = {
            "wall_sec": round(lean_s, 2),
            "rows_in": total_rows,
            "rows_labeled": sum(r["n"] for r in agg3),
            "rows_in_nontrivial_cluster": sum(r["moved"] for r in agg3),
            "docs_per_sec": round(total_rows / lean_s),
            "spilled_mb": _spilled_mb(session_dir) - spill_after_carry,
            "matches_carry_leg": (
                sum(r["n"] for r in agg3) == n_out
                and sum(r["moved"] for r in agg3) == n_moved
            ),
        }

    # -- leg 4: batched linear-model scoring (model-inference shape) ---
    spill_prev = _spilled_mb(session_dir)
    ds4 = rd.read_parquet(files, columns=["doc_id", "text"])
    t0 = time.monotonic()
    from fsst_ray.functions.classify import score_documents

    def score_summary(batch):
        import pyarrow as pa

        pos = pc.sum(batch["positive"]).as_py() or 0
        return pa.table({"n": pa.array([batch.num_rows]), "pos": pa.array([pos])})

    agg4 = (
        score_documents(ds4, concurrency=(1, num_cpus))
        .map_batches(score_summary, batch_format="pyarrow")
        .take_all()
    )
    score_s = time.monotonic() - t0
    spill_now = _spilled_mb(session_dir)
    results["score_documents"] = {
        "wall_sec": round(score_s, 2),
        "rows_in": total_rows,
        "rows_scored": sum(r["n"] for r in agg4),
        "rows_positive": sum(r["pos"] for r in agg4),
        "docs_per_sec": round(total_rows / score_s),
        "spilled_mb": spill_now - spill_prev,
    }
    spill_prev = spill_now

    # -- leg 5: segment-level exact substring dedup ---------------------
    ds5 = rd.read_parquet(files, columns=["doc_id", "text"])
    t0 = time.monotonic()
    from fsst_ray.functions.dedup import segment_dedup

    def seg_summary(batch):
        import pyarrow as pa

        return pa.table(
            {
                "n": pa.array([batch.num_rows]),
                "seg": pa.array([pc.sum(batch["n_seg"]).as_py() or 0]),
                "kept": pa.array([pc.sum(batch["n_kept"]).as_py() or 0]),
            }
        )

    agg5 = (
        segment_dedup(ds5, segment_words=10)
        .map_batches(seg_summary, batch_format="pyarrow")
        .take_all()
    )
    seg_s = time.monotonic() - t0
    spill_now = _spilled_mb(session_dir)
    results["segment_dedup"] = {
        "wall_sec": round(seg_s, 2),
        "rows_in": total_rows,
        "rows_out": sum(r["n"] for r in agg5),
        "segments_total": sum(r["seg"] for r in agg5),
        "segments_kept": sum(r["kept"] for r in agg5),
        "docs_per_sec": round(total_rows / seg_s),
        "spilled_mb": spill_now - spill_prev,
    }

    spill_prev = spill_now

    # -- leg 6: sliding n-gram span masking ------------------------------
    # the heaviest text-dedup exchange in the suite: gram-occurrence-
    # sized (~28 B per corpus WORD) projection through one range sort,
    # then the duplicate-occurrence list broadcasts back
    ds6 = rd.read_parquet(files, columns=["doc_id", "text"])
    t0 = time.monotonic()
    from fsst_ray.functions.dedup import ngram_span_dedup

    def span_summary(batch):
        import pyarrow as pa

        return pa.table(
            {
                "n": pa.array([batch.num_rows]),
                "words": pa.array([pc.sum(batch["n_words"]).as_py() or 0]),
                "masked": pa.array([pc.sum(batch["n_masked"]).as_py() or 0]),
            }
        )

    agg6 = (
        ngram_span_dedup(ds6, k=8, max_dup_occurrences=200_000_000)
        .map_batches(span_summary, batch_format="pyarrow")
        .take_all()
    )
    span_s = time.monotonic() - t0
    spill_now = _spilled_mb(session_dir)
    results["ngram_span_dedup"] = {
        "wall_sec": round(span_s, 2),
        "rows_in": total_rows,
        "rows_out": sum(r["n"] for r in agg6),
        "words_total": sum(r["words"] for r in agg6),
        "words_masked": sum(r["masked"] for r in agg6),
        "docs_per_sec": round(total_rows / span_s),
        "spilled_mb": spill_now - spill_prev,
    }

    # -- leg 7: composite build-corpus pipeline ---------------------------
    # the end-to-end chain a user actually runs: curate -> minhash reps
    # (lean exchange) -> decontaminate -> source-partitioned write; the
    # bench corpus lacks source/n_chars, so read_fn derives them
    # map-side (deterministic: source = shard of 4 by id)
    if os.environ.get("FSST_LLMBENCH_SKIP_CORPUS", "0") != "1":
        import shutil as _sh

        spill_prev = _spilled_mb(session_dir)
        corpus_out = "/tmp/fsst_ray_runs/llmbench_corpus"
        _sh.rmtree(corpus_out, ignore_errors=True)

        def read_docs_derived():
            import numpy as np
            import pyarrow as pa

            def derive(batch):
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                src = np.array(["s0", "s1", "s2", "s3"])[ids % 4]
                nch = pc.utf8_length(batch["text"])
                return pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "text": batch["text"],
                        "source": pa.array(src, pa.string()),
                        "n_chars": pc.cast(nch, pa.int64()),
                    }
                )

            return rd.read_parquet(files, columns=["doc_id", "text"]).map_batches(
                derive, batch_format="pyarrow"
            )

        from fsst_ray.pipelines.train_corpus import build_training_corpus

        t0 = time.monotonic()
        # min_hits=64: the synthetic corpus draws from a small shared
        # vocabulary, so the 1/97 eval slice's shingle union saturates —
        # measured on this corpus, 100% of docs share >= 4 shingles and
        # 75% share >= 32 (min_hits=1 left 0 survivors). 64 drops ~12%,
        # including every planted exact copy of a >=66-word eval doc,
        # keeping the stage's exchange + broadcast plumbing fully
        # exercised without degenerating
        summary = build_training_corpus(
            path,
            corpus_out,
            read_fn=read_docs_derived,
            lean_exchange=True,
            decon_min_hits=64,
        )
        corpus_s = time.monotonic() - t0
        spill_now = _spilled_mb(session_dir)
        results["build_corpus"] = {
            "wall_sec": round(corpus_s, 2),
            "rows_in": summary["n_in"],
            "n_curated": summary["n_curated"],
            "n_dedup_reps": summary["n_dedup_reps"],
            "n_final": summary["n_final"],
            "docs_per_sec": round(summary["n_in"] / corpus_s),
            "spilled_mb": spill_now - spill_prev,
        }

    # -- leg 8: BPE tokenizer train + apply ------------------------------
    if os.environ.get("FSST_LLMBENCH_SKIP_BPE", "0") != "1":
        from fsst_ray.functions.bpe import bpe_apply, bpe_train

        spill_prev = _spilled_mb(session_dir)
        ds8 = rd.read_parquet(files, columns=["doc_id", "text"])
        t0 = time.monotonic()
        merges = bpe_train(ds8, n_merges=64)
        train_s = time.monotonic() - t0
        t0 = time.monotonic()
        ds8b = rd.read_parquet(files, columns=["doc_id", "text"])

        def tok_summary(batch):
            import pyarrow as pa

            return pa.table(
                {
                    "n": pa.array([batch.num_rows]),
                    "w": pa.array([pc.sum(batch["n_words"]).as_py() or 0]),
                    "t": pa.array([pc.sum(batch["n_bpe_tokens"]).as_py() or 0]),
                }
            )

        agg8 = (
            bpe_apply(ds8b, merges)
            .map_batches(tok_summary, batch_format="pyarrow")
            .take_all()
        )
        apply_s = time.monotonic() - t0
        results["bpe_train_apply"] = {
            "train_wall_sec": round(train_s, 2),
            "apply_wall_sec": round(apply_s, 2),
            "n_merges": 64,
            "rows_in": total_rows,
            "words_total": sum(r["w"] for r in agg8),
            "bpe_tokens_total": sum(r["t"] for r in agg8),
            "apply_docs_per_sec": round(total_rows / apply_s),
            "spilled_mb": _spilled_mb(session_dir) - spill_prev,
        }

    peak_gb = sampler.stop()
    probe_after = _window_probe()
    out = {
        "metric": "llm_suite_scale_bench",
        "n_docs": total_rows,
        "base_docs": n_docs,
        "scale_vs_sf0.1_documents": round(n_docs / 5000),
        "text_parquet_bytes": text_bytes,
        "num_cpus": num_cpus,
        "peak_machine_mem_gb": round(peak_gb, 2),
        "legs": results,
        "window_probe_before": probe_before,
        "window_probe_after": probe_after,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
