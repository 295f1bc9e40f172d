"""End-to-end training-corpus build: the composite pipeline a user of a
training-data engine actually runs, assembled from the engine's own
operators —

    read -> curate (quality + langid + exact-dedup winners)
         -> MinHash-LSH near-dup cluster representatives
         -> benchmark decontamination (broadcast shingle semi-join)
         -> optional token-budget source mixing
         -> partitioned parquet (one directory per source), resumable

100-TB shape notes (each stage is an operator documented in its own
module; this file only composes them):

- Every stage's SURVIVOR SET is carried as an id projection and applied
  with `existence_join(how="semi")` — a keys-only range exchange
  (8-16 B/row), never a broadcast id set (which would not fit a worker
  at billions of docs) and never a corpus shuffle.
- The corpus text itself is re-SCANNED from storage once per stage and
  never materialized in RAM — the engine's two-pass encode philosophy.
  Id projections ARE materialized (id-sized, not corpus-sized) so a
  survivor list is computed once, not once per consumer.
- The write is `partition_cols=["source"]` so a failed run can resume
  per-partition downstream, and `_SUMMARY.json` doubles as the
  completion marker: `resume=True` returns it without re-running.
"""

from __future__ import annotations

import json
import pathlib

import pyarrow as pa
import pyarrow.compute as pc


def _ids_only(ds, col: str = "doc_id"):
    """Materialized id projection (one column, int64) of a Dataset."""
    return ds.select_columns([col]).materialize()


def build_training_corpus(
    docs_path: str,
    out_dir: str,
    *,
    min_quality: int = 60,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.7,
    eval_mod: int = 97,
    decon_min_hits: int = 1,
    mix_budget: int | None = None,
    cap_per_source_n: int | None = None,
    resume: bool = False,
    read_fn=None,
    lean_exchange: bool = False,
) -> dict:
    """Run the full curation chain over `docs_path` (parquet with
    doc_id/text/source/n_chars) and write the surviving documents as
    source-partitioned parquet under `out_dir`. Returns (and persists)
    a summary dict with per-stage survivor counts.

    `read_fn` (optional) replaces the default parquet read with any
    zero-argument callable returning a fresh Dataset of the same
    schema — the re-scan-per-stage contract means it is called once per
    stage, so it must be cheap to construct and deterministic (e.g. a
    read + map-side column derivation). `lean_exchange` forwards to
    `minhash_dedup` (the 16 B/row band exchange)."""
    import ray.data as rd

    from ..functions.curate import curate, decontaminate, mix_corpus
    from ..functions.dedup import minhash_dedup
    from ..functions.relational import existence_join

    out = pathlib.Path(out_dir)
    marker = out / "_SUMMARY.json"
    if resume and marker.exists():
        return json.loads(marker.read_text())

    def read_docs():
        if read_fn is not None:
            return read_fn()
        return rd.read_parquet(
            docs_path, columns=["doc_id", "text", "source", "n_chars"]
        )

    n_in = read_docs().count()

    # 1. curate: quality + language filter + exact-dedup winners
    kept = _ids_only(curate(read_docs(), min_quality, langs))
    n_curated = kept.count()
    cur_docs = existence_join(read_docs(), kept, "doc_id", "doc_id", how="semi")

    # 2. near-dup cluster representatives (cluster_id == min doc_id)
    labels = minhash_dedup(cur_docs, jaccard_threshold, lean_exchange=lean_exchange)

    def reps_only(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["doc_id"], batch["cluster_id"])
        return batch.filter(m).select(["doc_id"])

    reps = labels.map_batches(reps_only, batch_format="pyarrow").materialize()
    n_reps = reps.count()
    dd_docs = existence_join(
        existence_join(read_docs(), kept, "doc_id", "doc_id", how="semi"),
        reps,
        "doc_id",
        "doc_id",
        how="semi",
    )

    # 3. decontamination vs the held-out eval slice. min_hits is a real
    # knob: on small-vocabulary corpora a single shared shingle is
    # ubiquitous (the llm_bench synthetic corpus drops to 0 survivors
    # at min_hits=1) while true contamination (near-copies of eval
    # docs) shares MANY shingles
    dec = decontaminate(dd_docs, eval_mod=eval_mod, min_hits=decon_min_hits)

    def keep_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["keep"]).select(["doc_id"])

    clean = dec.map_batches(keep_only, batch_format="pyarrow").materialize()
    n_clean = clean.count()

    # 4. optional per-source doc cap (over-represented-domain control)
    final_ids = clean
    if cap_per_source_n is not None:
        from ..functions.curate import cap_per_key

        capped_src = existence_join(
            read_docs(), final_ids, "doc_id", "doc_id", how="semi"
        ).select_columns(["source", "doc_id"])
        final_ids = _ids_only(cap_per_key(capped_src, "source", cap_per_source_n))

    # 5. optional per-source token-budget mixing
    if mix_budget is not None:
        clean_docs = existence_join(
            read_docs(), final_ids, "doc_id", "doc_id", how="semi"
        )
        mixed = mix_corpus(clean_docs, mix_budget)
        final_ids = _ids_only(mixed)
    n_final = final_ids.count()

    # 6. source-partitioned parquet write of the surviving documents
    final_docs = existence_join(
        read_docs(), final_ids, "doc_id", "doc_id", how="semi"
    )
    data_dir = out / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    final_docs.write_parquet(str(data_dir), partition_cols=["source"])

    summary = {
        "n_in": n_in,
        "n_curated": n_curated,
        "n_dedup_reps": n_reps,
        "n_decontaminated": n_clean,
        "n_final": n_final,
        "mix_budget": mix_budget,
        "out": str(data_dir),
    }
    marker.write_text(json.dumps(summary))
    return summary
