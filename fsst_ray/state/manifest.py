"""Per-partition lineage manifests: the resume/checkpoint unit.

Layout under an encode output directory:
    out_dir/_plan.json              pass-1 result: codec states (b64),
                                    bucket plan, config, input lineage
    out_dir/manifest/<part>.json    one entry per encode bucket: status,
                                    counts, bytes, codec histogram, file
    out_dir/chunks/<part>.parquet   the encoded chunks (atomic rename)

A rerun with resume=True loads _plan.json (skipping pass 1), drops rows
of completed partitions before the shuffle, and re-encodes only the
missing buckets — idempotent because bucket assignment is a pure
function of (doc_id, plan) and files are written via tmp+rename.
"""

from __future__ import annotations

import base64
import json
import os
import pathlib


def sanitize_part(part_key: str) -> str:
    return "".join(c if (c.isalnum() or c in "-_.=") else "_" for c in part_key)


def plan_path(out_dir: str) -> pathlib.Path:
    return pathlib.Path(out_dir) / "_plan.json"


def manifest_dir(out_dir: str) -> pathlib.Path:
    return pathlib.Path(out_dir) / "manifest"


def chunks_dir(out_dir: str) -> pathlib.Path:
    return pathlib.Path(out_dir) / "chunks"


def write_json_atomic(path: pathlib.Path, obj) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(f".{os.getpid()}.tmp")
    tmp.write_text(json.dumps(obj, sort_keys=True))
    os.replace(tmp, path)


def save_plan(out_dir: str, states: dict[str, dict], bucket_plan: dict[str, int],
              mass: dict[str, dict], config: dict, path=None, extra: dict | None = None) -> None:
    write_json_atomic(
        path or plan_path(out_dir),
        {
            "states": {
                s: {"fsst_b64": base64.b64encode(st["fsst"]).decode(), "ratio": st["ratio"]}
                for s, st in states.items()
            },
            "bucket_plan": bucket_plan,
            "mass": mass,
            "config": config,
            **(extra or {}),
        },
    )


def load_plan(out_dir: str, path=None):
    obj = json.loads((path or plan_path(out_dir)).read_text())
    states = {
        s: {"fsst": base64.b64decode(st["fsst_b64"]), "ratio": st["ratio"]}
        for s, st in obj["states"].items()
    }
    return states, obj["bucket_plan"], obj["mass"], obj["config"]


def write_part_entry(out_dir: str, entry: dict) -> None:
    write_json_atomic(
        manifest_dir(out_dir) / f"{sanitize_part(entry['part_key'])}.json", entry
    )


_COMPACT_NAME = "_compact.json"


def compact_path(out_dir: str) -> pathlib.Path:
    return manifest_dir(out_dir) / _COMPACT_NAME


def compact_manifest(out_dir: str) -> int:
    """Fold the per-part entry files into ONE compacted manifest file
    and remove them. Per-part JSONs are the write-side unit (each encode
    task commits its entry independently, atomic rename, no coordination)
    — but the read side (`load_manifest`) globs the directory, which at
    100-TB scale means ~10^6 driver-side file opens per resume / decode
    / stats call. Compaction runs once at job completion; entries
    written AFTER a compaction (e.g. a resume repairing a lost bucket)
    overlay the compacted map on load, newest wins, so the two layers
    stay consistent without locking. Returns the entry count."""
    mdir = manifest_dir(out_dir)
    if not mdir.exists():
        return 0
    entries = load_manifest(out_dir)
    if not entries:
        return 0
    write_json_atomic(compact_path(out_dir), entries)
    for p in mdir.glob("*.json"):
        if p.name != _COMPACT_NAME:
            p.unlink()
    return len(entries)


def load_manifest(out_dir: str) -> dict[str, dict]:
    mdir = manifest_dir(out_dir)
    if not mdir.exists():
        return {}
    entries: dict[str, dict] = {}
    cp = mdir / _COMPACT_NAME
    if cp.exists():
        entries.update(json.loads(cp.read_text()))
    # per-part entries written after the last compaction win
    for p in sorted(mdir.glob("*.json")):
        if p.name == _COMPACT_NAME:
            continue
        entry = json.loads(p.read_text())
        entries[entry["part_key"]] = entry
    return entries


def completed_parts(out_dir: str) -> set[str]:
    return {
        key
        for key, entry in load_manifest(out_dir).items()
        if entry.get("status") == "done"
        and (chunks_dir(out_dir) / f"{sanitize_part(key)}.parquet").exists()
    }


def summarize(entries: dict[str, dict]) -> dict:
    total = {
        "parts": len(entries),
        "chunks": 0,
        "rows": 0,
        "tokens": 0,
        "bytes_in": 0,
        "bytes_out": 0,
        "codecs": {},
    }
    for entry in entries.values():
        total["chunks"] += entry["chunks"]
        total["rows"] += entry["rows"]
        total["tokens"] += entry["tokens"]
        total["bytes_in"] += entry["bytes_in"]
        total["bytes_out"] += entry["bytes_out"]
        for codec, n in entry["codecs"].items():
            total["codecs"][codec] = total["codecs"].get(codec, 0) + n
    if total["tokens"]:
        total["bytes_per_token"] = total["bytes_out"] / total["tokens"]
        total["compression_ratio"] = total["bytes_in"] / max(total["bytes_out"], 1)
    return total


def summarize_by_source(entries: dict[str, dict]) -> dict[str, dict]:
    """Per-source rollup of the manifest (part keys are
    '{source}:[g{N}-|c{N}-]{bucket}'), including how many append
    generations / compactions the source's files span — the operational
    signal for when to run `compact`."""
    import re

    out: dict[str, dict] = {}
    for key, entry in entries.items():
        src, _, rest = key.partition(":")
        s = out.setdefault(
            src,
            {
                "parts": 0,
                "chunks": 0,
                "rows": 0,
                "tokens": 0,
                "bytes_in": 0,
                "bytes_out": 0,
                "generations": set(),
            },
        )
        s["parts"] += 1
        for f in ("chunks", "rows", "tokens", "bytes_in", "bytes_out"):
            s[f] += entry[f]
        m = re.match(r"([gc]\d+)-", rest)
        s["generations"].add(m.group(1) if m else "g0")
    for s in out.values():
        s["generations"] = sorted(s["generations"])
        if s["tokens"]:
            s["bytes_per_token"] = s["bytes_out"] / s["tokens"]
            s["compression_ratio"] = s["bytes_in"] / max(s["bytes_out"], 1)
    return {k: out[k] for k in sorted(out)}


def manifest_sidecars(out_dir: str) -> list[pathlib.Path]:
    """The per-part entry files currently on disk (excluding the
    compacted map) — snapshot this BEFORE load_manifest when a later
    consolidation will delete sidecars, so entries written concurrently
    in between survive as overlays."""
    mdir = manifest_dir(out_dir)
    if not mdir.exists():
        return []
    return [p for p in mdir.glob("*.json") if p.name != _COMPACT_NAME]


def consolidate_manifest(out_dir: str, entries: dict, sidecars: list) -> None:
    """Write the full entry map as _compact.json and remove ONLY the
    given sidecar files (the ones whose content the map includes): a
    sidecar written after the snapshot overlays the new map on the next
    load (newest wins), so concurrent appends are never lost."""
    write_json_atomic(compact_path(out_dir), entries)
    for p in sidecars:
        try:
            p.unlink()
        except FileNotFoundError:
            pass
