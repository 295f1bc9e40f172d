"""Encoded-corpus compaction: fold generation-fragmented bucket files
into larger ones.

Incremental append (`encode_job.append_dataset`) deliberately never
rewrites old files, so a corpus that has absorbed many appends
accumulates one small file set per generation — more files than the
read path wants (decode parallelism quantizes per file; manifests,
zone maps and phase-A scans all scale with file count). Compaction is
the operational counterpart: merge each source's completed bucket
files into ~target-size files, rewriting ONLY encoded bytes (chunk
payload rows are self-describing and independent, so a merged file is
a concatenation with re-keyed part_key / renumbered chunk_seq — no
decode, no re-encode, no retraining).

Crash safety (a compaction interrupted anywhere must never lose or
duplicate rows — `decode` enumerates chunk files by directory glob):

1. the PLAN — merge groups, their new keys, and the fully-computed new
   manifest entries (sums of the constituents') — is journaled to
   `compaction_g{N}.json` BEFORE any file is touched;
2. each merge task writes `<file>.ctmp`, renames to the final name
   (invisible to decode until this instant: reads glob `*.parquet`),
   then unlinks its constituents — the only non-atomic window is
   between the rename and the unlinks, and the journal records exactly
   which constituents every new file supersedes;
3. the manifest rewrite (drop constituent entries, add merged ones,
   one `_compact.json` write) happens last; the journal is then marked
   completed.

`repair_compaction` replays an incomplete journal: a group whose new
file exists gets its constituents unlinked and its entry installed; a
group whose new file is missing is rolled back (tmp removed, originals
untouched). `compact_corpus` runs the repair first, so re-running
compaction after any crash converges. After a compaction the original
per-bucket part keys no longer exist, so a base-encode `--resume` is
refused (the corpus was complete — that's a compaction precondition);
appends keep working, each new generation is untouched by earlier
compactions and is itself compactable later.

Scale: each merge group is an independent task over its own files —
`compact_corpus` fans them out as one Ray Data map over the group
descriptors (file IO bound, no shuffle); the driver handles only
manifest-entry-sized metadata.
"""

from __future__ import annotations

import json
import os
import pathlib

from ..state import manifest as mf

_JOURNAL_GLOB = "compaction_g*.json"


def _journal_path(out_dir: str, gen: int) -> pathlib.Path:
    return pathlib.Path(out_dir) / f"compaction_g{gen}.json"


def compaction_generations(out_dir: str) -> list[int]:
    out = []
    for p in pathlib.Path(out_dir).glob(_JOURNAL_GLOB):
        try:
            out.append(int(p.stem.split("_g")[1]))
        except (IndexError, ValueError):
            continue
    return sorted(out)


def has_compaction(out_dir: str) -> bool:
    return bool(compaction_generations(out_dir))


def _merged_entry(new_key: str, new_file: str, parts: list[dict]) -> dict:
    codecs: dict[str, int] = {}
    for e in parts:
        for c, n in e.get("codecs", {}).items():
            codecs[c] = codecs.get(c, 0) + n
    entry = {
        "part_key": new_key,
        "file": new_file,
        "status": "done",
        "rows": sum(e["rows"] for e in parts),
        "tokens": sum(e["tokens"] for e in parts),
        "chunks": sum(e["chunks"] for e in parts),
        "bytes_in": sum(e["bytes_in"] for e in parts),
        "bytes_out": sum(e["bytes_out"] for e in parts),
        "codecs": codecs,
    }
    # zone map only if every constituent has one (legacy pre-zone-map
    # entries lack doc_min/doc_max; decode_select always scans those)
    if all("doc_min" in e and "doc_max" in e for e in parts):
        entry["doc_min"] = min(e["doc_min"] for e in parts)
        entry["doc_max"] = max(e["doc_max"] for e in parts)
    return entry


def plan_compaction(out_dir: str, target_bytes: int = 512 << 20) -> dict:
    """Greedy per-source packing of completed bucket files into merge
    groups of ~target_bytes (encoded). Only groups of >= 2 files are
    worth a rewrite. Returns the journal dict (not yet written)."""
    entries = mf.load_manifest(out_dir)
    gen = (compaction_generations(out_dir) or [0])[-1] + 1
    by_source: dict[str, list[dict]] = {}
    for key in sorted(entries):
        e = entries[key]
        if e.get("status") != "done":
            continue
        src = key.split(":", 1)[0]
        by_source.setdefault(src, []).append(e)
    groups = []
    seq = 0
    for src in sorted(by_source):
        pend: list[dict] = []
        pend_bytes = 0

        def flush(pend=None):
            nonlocal seq
            if pend and len(pend) >= 2:
                new_key = f"{src}:c{gen}-{seq:05d}"
                new_file = f"{mf.sanitize_part(new_key)}.parquet"
                groups.append(
                    {
                        "new_key": new_key,
                        "new_file": new_file,
                        "old_keys": [e["part_key"] for e in pend],
                        "old_files": [e["file"] for e in pend],
                        "entry": _merged_entry(new_key, new_file, pend),
                    }
                )
                seq += 1

        for e in by_source[src]:
            if pend and pend_bytes + e["bytes_out"] > target_bytes:
                flush(pend)
                pend, pend_bytes = [], 0
            pend.append(e)
            pend_bytes += e["bytes_out"]
        flush(pend)
    return {"generation": gen, "completed": False, "groups": groups}


def _merge_group(cdir: pathlib.Path, group: dict) -> None:
    """Concatenate the group's chunk files under the new part key.
    Chunk payload rows are independent; only the identity columns
    (part_key, chunk_seq) are rewritten."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    new_path = cdir / group["new_file"]
    if not new_path.exists():
        tables = []
        for f in group["old_files"]:
            p = cdir / f
            if not p.exists():
                raise FileNotFoundError(
                    f"compaction constituent missing: {p} (corpus modified "
                    "since the plan was journaled?)"
                )
            tables.append(pq.read_table(p))
        t = pa.concat_tables(tables, promote_options="none")
        n = t.num_rows
        t = t.set_column(
            t.schema.get_field_index("part_key"),
            "part_key",
            pa.array([group["new_key"]] * n, pa.string()),
        )
        t = t.set_column(
            t.schema.get_field_index("chunk_seq"),
            "chunk_seq",
            pa.array(range(n), pa.int32()),
        )
        tmp = new_path.with_suffix(".parquet.ctmp")
        pq.write_table(t, tmp, compression="none")
        os.replace(tmp, new_path)
    for f in group["old_files"]:
        p = cdir / f
        if p.exists():
            p.unlink()


def _install_manifest(out_dir: str, journal: dict) -> None:
    # sidecars snapshotted BEFORE the load: an entry a concurrent
    # append writes after this point survives consolidation and
    # overlays the new map on the next load (newest wins)
    sidecars = mf.manifest_sidecars(out_dir)
    entries = mf.load_manifest(out_dir)
    for g in journal["groups"]:
        for k in g["old_keys"]:
            entries.pop(k, None)
        entries[g["new_key"]] = g["entry"]
    mf.consolidate_manifest(out_dir, entries, sidecars)


def repair_compaction(out_dir: str) -> dict | None:
    """Converge an interrupted compaction: groups whose new file landed
    are completed (constituents unlinked, entry installed); groups
    whose new file is missing are rolled back (tmp removed). Idempotent;
    no-op when every journal is completed."""
    gens = compaction_generations(out_dir)
    if not gens:
        return None
    jp = _journal_path(out_dir, gens[-1])
    journal = json.loads(jp.read_text())
    if journal.get("completed"):
        return None
    cdir = mf.chunks_dir(out_dir)
    done_groups = []
    for g in journal["groups"]:
        new_path = cdir / g["new_file"]
        tmp = new_path.with_suffix(".parquet.ctmp")
        if new_path.exists():
            for f in g["old_files"]:
                p = cdir / f
                if p.exists():
                    p.unlink()
            done_groups.append(g)
        elif tmp.exists():
            tmp.unlink()
    journal["groups"] = done_groups
    _install_manifest(out_dir, journal)
    journal["completed"] = True
    mf.write_json_atomic(jp, journal)
    return {"repaired_groups": len(done_groups)}


def _assert_corpus_complete(out_dir: str, bucket_plan: dict) -> None:
    """Compaction precondition: every encode/append that ever started
    must have FINISHED. Compacting a partially-encoded corpus would
    destroy the part keys its resume needs, so a later resume would
    re-encode and silently duplicate rows (or, for the base encode, be
    refused with buckets permanently missing)."""
    import json

    from .encode_job import _append_generations, _append_plan_path

    gens = _append_generations(out_dir)
    if gens:
        latest = json.loads(_append_plan_path(out_dir, gens[-1]).read_text())
        if not latest.get("completed"):
            raise ValueError(
                f"append generation g{gens[-1]} is incomplete — finish it "
                "(encode --append --resume) before compacting"
            )
    if not compaction_generations(out_dir):
        # never-compacted corpus: the base bucket keys must all exist
        # (after a compaction they are legitimately replaced by c-keys,
        # and that first compaction already verified them)
        done = {
            k for k, e in mf.load_manifest(out_dir).items()
            if e.get("status") == "done"
        }
        expected = {
            f"{src}:{i:05d}"
            for src, n in bucket_plan.items()
            for i in range(n)
        }
        missing = expected - done
        if missing:
            raise ValueError(
                f"base encode incomplete ({len(missing)} buckets missing, "
                f"e.g. {sorted(missing)[:3]}) — finish it (encode --resume) "
                "before compacting"
            )


def compact_corpus(out_dir: str, target_bytes: int = 512 << 20) -> dict:
    """Run a full compaction pass (see module docstring). Returns a
    metrics dict; a corpus with nothing to merge is a no-op."""
    import ray.data as rd

    _, bucket_plan, _, config = mf.load_plan(out_dir)
    assert config["mode"] in ("bucketed", "bucketed_groupby"), (
        "compaction requires a bucketed corpus (streaming outputs have no "
        "per-bucket manifest entries to merge)"
    )
    _assert_corpus_complete(out_dir, bucket_plan)
    repair_compaction(out_dir)
    journal = plan_compaction(out_dir, target_bytes=target_bytes)
    if not journal["groups"]:
        return {"generation": None, "groups": 0, "files_removed": 0}
    jp = _journal_path(out_dir, journal["generation"])
    mf.write_json_atomic(jp, journal)

    cdir = mf.chunks_dir(out_dir)
    rd.from_items(journal["groups"]).map_batches(
        _make_merge_fn(str(cdir)), batch_size=1, batch_format="pandas"
    ).materialize()

    _install_manifest(out_dir, journal)
    journal["completed"] = True
    mf.write_json_atomic(jp, journal)
    return {
        "generation": journal["generation"],
        "groups": len(journal["groups"]),
        "files_removed": sum(len(g["old_files"]) for g in journal["groups"]),
        "files_written": len(journal["groups"]),
    }


def _make_merge_fn(cdir: str):
    import pandas as pd

    def fn(df: "pd.DataFrame") -> "pd.DataFrame":
        # from_items spreads each group dict's keys into columns
        for group in df.to_dict("records"):
            _merge_group(pathlib.Path(cdir), group)
        return pd.DataFrame({"merged": [len(df)]})

    return fn


def assert_readable(out_dir: str) -> None:
    """Read-path guard: an interrupted compaction leaves a window where
    the chunks directory holds BOTH a merged file and its constituents
    (glob decode would double-count) or the manifest references deleted
    files (selective decode would 404). Reads must refuse until the
    journal is replayed — `compact_corpus` repairs first, so running
    `python -m fsst_ray compact` (or `repair_compaction`) converges."""
    import json

    gens = compaction_generations(out_dir)
    if not gens:
        return
    journal = json.loads(_journal_path(out_dir, gens[-1]).read_text())
    if not journal.get("completed"):
        raise ValueError(
            f"interrupted compaction g{gens[-1]} detected — run "
            "`python -m fsst_ray compact` (repairs the journal first) "
            "before decoding"
        )
