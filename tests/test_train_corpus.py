"""End-to-end composite training-corpus pipeline (pipelines/train_corpus)."""

from __future__ import annotations

import json
import pathlib
import shutil

import pyarrow.parquet as pq
import pytest


SF_DIR = "/root/testdata/sf0.01"


def test_build_training_corpus_end_to_end(ray_session, tmp_path):
    from fsst_ray.pipelines.train_corpus import build_training_corpus

    out = tmp_path / "corpus"
    s = build_training_corpus(
        f"{SF_DIR}/documents.parquet",
        str(out),
        min_quality=60,
        langs=("en",),
        eval_mod=97,
        mix_budget=3000,
    )
    # stage counts are monotone non-increasing and non-vacuous
    assert s["n_in"] == 500
    assert 0 < s["n_curated"] <= s["n_in"]
    assert 0 < s["n_dedup_reps"] <= s["n_curated"]
    assert 0 < s["n_decontaminated"] <= s["n_dedup_reps"]
    assert 0 < s["n_final"] <= s["n_decontaminated"]
    assert s["n_final"] < s["n_in"]  # the chain did real work

    # partitioned layout + written rows match the summary
    parts = sorted(p.name for p in (out / "data").iterdir() if p.is_dir())
    assert parts and all(p.startswith("source=") for p in parts)
    files = list((out / "data").rglob("*.parquet"))
    n_written = sum(pq.read_metadata(f).num_rows for f in files)
    assert n_written == s["n_final"]
    # written docs still carry text and ids are unique
    t = pq.read_table(files[0])
    assert "text" in t.schema.names and "doc_id" in t.schema.names
    all_ids = []
    for f in files:
        all_ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert len(all_ids) == len(set(all_ids))

    # resume: returns the identical summary without rewriting anything
    mtimes = {f: f.stat().st_mtime_ns for f in files}
    s2 = build_training_corpus(
        f"{SF_DIR}/documents.parquet", str(out), mix_budget=3000, resume=True
    )
    assert s2 == s
    assert {f: f.stat().st_mtime_ns for f in files} == mtimes

    # deterministic: a fresh run produces the same survivor id set
    out3 = tmp_path / "corpus3"
    s3 = build_training_corpus(
        f"{SF_DIR}/documents.parquet", str(out3), mix_budget=3000
    )
    ids3 = []
    for f in (out3 / "data").rglob("*.parquet"):
        ids3.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert sorted(ids3) == sorted(all_ids)
    assert {k: v for k, v in s3.items() if k != "out"} == {
        k: v for k, v in s.items() if k != "out"
    }


def test_build_corpus_cap_per_source(ray_session, tmp_path):
    """cap_per_source_n bounds each source's survivors; summary counts
    consistent; cap composes before mixing."""
    import pyarrow.parquet as pq

    from fsst_ray.pipelines.train_corpus import build_training_corpus

    docs = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    out = str(tmp_path / "corpus")
    s = build_training_corpus(
        src, out, min_quality=0, langs=tuple(sorted(set(docs["lang"].to_pylist()))),
        jaccard_threshold=1.0, cap_per_source_n=5,
    )
    assert s["n_final"] <= 20 * 5  # 20 sources at sf0.01
    assert s["n_final"] > 0
    import glob

    written = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(out + "/data/**/*.parquet", recursive=True)
    )
    assert written == s["n_final"]
