"""End-to-end Ray pipeline tests: encode -> decode -> per-row equality,
skew bucketing, resume, streaming mode."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fsst_ray import (
    decode_dataset,
    encode_dataset,
    tokens_table,
    verify_roundtrip,
)
from fsst_ray.sources.tokens import ensure_tokens_parquet
from fsst_ray.state import manifest as mf

SCALE = 0.2  # ~1,230 rows / ~330k tokens


@pytest.fixture(scope="module")
def tokens_ds(ray_session):
    import ray.data as rd

    path = ensure_tokens_parquet(SCALE)
    return rd.read_parquet(path, file_extensions=["parquet"])


def _sorted_rows(table: pa.Table):
    df = table.sort_by("doc_id").to_pydict()
    return list(zip(df["doc_id"], df["tokens"], df["n_tok"], df["source"]))


def test_encode_decode_bucketed(tokens_ds, tmp_path):
    out = str(tmp_path / "enc")
    result = encode_dataset(
        tokens_ds, out, chunk_tokens=1 << 14, bucket_tokens=1 << 15
    )
    assert result.metrics["rows"] == tokens_ds.count()
    assert result.metrics["tokens"] > 0
    # compression: the corpus is dominated by compressible families
    assert result.metrics["bytes_out"] < result.metrics["bytes_in"]
    # multiple codecs must actually win on different families
    assert len(result.metrics["codecs"]) >= 3, result.metrics["codecs"]

    # skew handling: the cyclic-large family must fan out over >1 bucket
    assert result.bucket_plan["cyclic-large"] > 1

    # exact per-row equality, full table
    decoded = decode_dataset(out).take_all()
    original = tokens_table(SCALE)
    dec_tbl = pa.Table.from_pylist(decoded, schema=original.schema)
    assert _sorted_rows(dec_tbl) == _sorted_rows(original)

    # checksum verify agrees
    v = verify_roundtrip(tokens_ds, out)
    assert v["match"], v


def test_encode_streaming_mode(tokens_ds, tmp_path):
    out = str(tmp_path / "enc_stream")
    result = encode_dataset(
        tokens_ds, out, mode="streaming", chunk_tokens=1 << 16
    )
    assert result.metrics["rows"] == tokens_ds.count()
    v = verify_roundtrip(tokens_ds, out)
    assert v["match"], v


def test_resume_skips_done_parts(tokens_ds, tmp_path):
    out = str(tmp_path / "enc_resume")
    result = encode_dataset(
        tokens_ds, out, chunk_tokens=1 << 14, bucket_tokens=1 << 15
    )
    all_parts = set(mf.load_manifest(out))
    assert len(all_parts) == sum(result.bucket_plan.values())

    # the completed job compacted per-part entries into one file
    assert mf.compact_path(out).exists()
    assert not [
        p
        for p in mf.manifest_dir(out).glob("*.json")
        if p.name != mf._COMPACT_NAME
    ]

    # simulate a partial failure: delete some bucket files (the
    # compacted manifest entry persists — completed_parts requires the
    # chunk file, so the lost buckets are re-encoded regardless)
    victims = sorted(all_parts)[::3]
    for part in victims:
        (mf.chunks_dir(out) / f"{mf.sanitize_part(part)}.parquet").unlink()

    result2 = encode_dataset(
        tokens_ds, out, chunk_tokens=1 << 14, bucket_tokens=1 << 15, resume=True
    )
    assert set(mf.load_manifest(out)) == all_parts
    v = verify_roundtrip(tokens_ds, out)
    assert v["match"], v
    # resumed totals match the original run
    assert result2.metrics["rows"] == result.metrics["rows"]
    assert result2.metrics["bytes_out"] == result.metrics["bytes_out"]


def test_checksum_detects_corruption(tokens_ds):
    from fsst_ray.stages.decoder import dataset_checksum

    a = dataset_checksum(tokens_ds)

    def corrupt(batch: pa.Table) -> pa.Table:
        import numpy as np

        from fsst_ray.stages.serialize import tokens_from_values, tokens_views

        values, offsets = tokens_views(batch)
        values = values.copy()
        if len(values):
            values[0] += 1
        n_tok = (offsets[1:] - offsets[:-1]).astype(np.int32)
        return batch.set_column(
            batch.schema.get_field_index("tokens"),
            "tokens",
            tokens_from_values(values, n_tok),
        )

    b = dataset_checksum(
        tokens_ds.map_batches(corrupt, batch_format="pyarrow")
    )
    assert a["rows"] == b["rows"] and a["checksum"] != b["checksum"]


def test_encode_bucketed_groupby_mode(tokens_ds, tmp_path):
    out = str(tmp_path / "enc_gb")
    result = encode_dataset(
        tokens_ds, out, mode="bucketed_groupby",
        chunk_tokens=1 << 14, bucket_tokens=1 << 15,
    )
    assert result.metrics["rows"] == tokens_ds.count()
    v = verify_roundtrip(tokens_ds, out)
    assert v["match"], v


def test_incremental_flush_roundtrip(tokens_ds, tmp_path):
    """Tiny flush/budget thresholds force many mid-stream row-group
    flushes per bucket; round-trip must still be exact and manifest
    totals must match a single-flush run."""
    out = str(tmp_path / "enc_flush")
    result = encode_dataset(
        tokens_ds,
        out,
        chunk_tokens=1 << 12,
        bucket_tokens=1 << 15,
        writer_flush_tokens=1 << 12,
        writer_budget_tokens=1 << 13,
    )
    assert result.metrics["rows"] == tokens_ds.count()
    v = verify_roundtrip(tokens_ds, out)
    assert v["match"], v


def test_duplicate_doc_id_rejected(ray_session, tmp_path):
    import ray.data as rd

    rows = tokens_table(0.05)
    dup = rows.take(pa.array([0] * 2 + list(range(rows.num_rows))))
    ds = rd.from_arrow(dup)
    with pytest.raises(Exception, match="duplicate doc_id"):
        encode_dataset(
            ds, str(tmp_path / "enc_dup"), chunk_tokens=1 << 14, bucket_tokens=1 << 15
        )


def test_duplicate_doc_id_across_flushes_rejected(ray_session, tmp_path):
    """Duplicated doc_ids that land in DIFFERENT flushes of the same
    bucket must still raise (ADVICE r2 item 2): tiny flush threshold
    forces a flush per add, duplicates arrive in separate blocks."""
    import ray.data as rd

    rows = tokens_table(0.05)
    # two blocks, each containing row 0 exactly once -> the duplicate
    # pair reaches the bucket writer in two separate add()/flush calls
    # (within-flush dedup never sees both rows together)
    t2 = rows.take(pa.array([0]))
    ds = rd.from_arrow(rows).union(rd.from_arrow(t2))
    with pytest.raises(Exception, match="duplicate doc_id"):
        encode_dataset(
            ds,
            str(tmp_path / "enc_dup2"),
            chunk_tokens=1 << 14,
            bucket_tokens=1 << 15,
            writer_flush_tokens=1,  # flush on every add
        )


def test_exchange_narrowing_mixed_widths_roundtrip(ray_session, tmp_path):
    """Exchange compression (wire-only uint16 narrowing) must be
    transparent: blocks whose values fit uint16 travel narrowed,
    blocks with values > 0xFFFF travel int32, BOTH land in the same
    buckets (same sources), and the decode matches exactly. Tiny flush
    threshold forces mixed-width buffers through _concat_bufs in both
    the flush and compact paths."""
    import ray.data as rd

    from fsst_ray.pipelines.encode_job import _narrow_tokens, _widen_tokens

    small = pa.table(
        {
            "doc_id": pa.array([f"s{i}" for i in range(40)], type=pa.string()),
            "tokens": pa.array(
                [[i % 7, 65535, 0, i] * 50 for i in range(40)],
                type=pa.list_(pa.int32()),
            ),
            "source": pa.array(["mix"] * 40, type=pa.string()),
        }
    )
    big = pa.table(
        {
            "doc_id": pa.array([f"b{i}" for i in range(40)], type=pa.string()),
            "tokens": pa.array(
                [[65536 + i, 2**30, 1, i] * 50 for i in range(40)],
                type=pa.list_(pa.int32()),
            ),
            "source": pa.array(["mix"] * 40, type=pa.string()),
        }
    )
    # unit: narrowing decision + inverse
    ns = _narrow_tokens(small)
    assert ns.schema.field("tokens").type == pa.list_(pa.uint16())
    assert _widen_tokens(ns)["tokens"].to_pylist() == small["tokens"].to_pylist()
    nb = _narrow_tokens(big)
    assert nb.schema.field("tokens").type == pa.list_(pa.int32())

    def with_ntok(t):
        return t.append_column(
            "n_tok",
            pa.array([len(x) for x in t["tokens"].to_pylist()], type=pa.int32()),
        )

    ds = rd.from_arrow(with_ntok(small)).union(rd.from_arrow(with_ntok(big)))
    out = str(tmp_path / "enc_narrow")
    encode_dataset(
        ds,
        out,
        chunk_tokens=1 << 10,
        bucket_tokens=1 << 12,
        writer_flush_tokens=256,  # flush nearly every add: mixed bufs
    )
    decoded = pa.Table.from_pylist(decode_dataset(out).take_all())
    got = {
        r["doc_id"]: r["tokens"] for r in decoded.to_pylist()
    }
    want = {
        r["doc_id"]: r["tokens"]
        for t in (with_ntok(small), with_ntok(big))
        for r in t.to_pylist()
    }
    assert got == want


def test_pruned_pass1_matches_full_scan(tokens_ds, ray_session):
    """train_states_pruned (projected mass scan + doc_id-filtered sample
    read) must produce bit-identical states and mass to the full scan."""
    from fsst_ray.sources.tokens import ensure_tokens_parquet
    from fsst_ray.stages.trainer import train_states, train_states_pruned

    path = ensure_tokens_parquet(SCALE)
    s_full, m_full = train_states(tokens_ds, reduce="driver")
    s_pruned, m_pruned = train_states_pruned(path)
    assert m_full == m_pruned
    assert set(s_full) == set(s_pruned)
    for source in s_full:
        assert s_full[source]["fsst"] == s_pruned[source]["fsst"], source
        assert s_full[source]["ratio"] == s_pruned[source]["ratio"], source


def test_pruned_pass1_matches_full_scan_short_docs(ray_session, tmp_path):
    """Short-doc corpus (chunks well under FSST_SAMPLELINE): the pruned
    path must select candidates by the SAMPLEMAX byte budget — a
    SAMPLE_K count cap would train on fewer bytes than the full scan
    consumes (ADVICE r2 item 1). Also exercises more candidates than
    SAMPLE_K being kept."""
    import ray.data as rd

    from fsst_ray.stages.trainer import SAMPLE_K, train_states, train_states_pruned

    rng = np.random.default_rng(42)
    rows = []
    for i in range(300):
        # 20-40 tokens -> 80-160 bytes per chunk, far below 512
        n = int(rng.integers(20, 41))
        rows.append(
            {
                "doc_id": f"d{i:05d}",
                "tokens": rng.integers(0, 50, size=n).astype(np.int32).tolist(),
                "n_tok": n,
                "source": "short",
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("tokens", pa.list_(pa.int32())),
                ("n_tok", pa.int32()),
                ("source", pa.string()),
            ]
        ),
    )
    path = str(tmp_path / "short_docs")
    import pathlib

    pathlib.Path(path).mkdir()
    import pyarrow.parquet as pq

    # several files so per-block top-K union exceeds one block's K
    for part in range(3):
        pq.write_table(table.slice(part * 100, 100), f"{path}/part{part}.parquet")

    ds = rd.read_parquet(path, file_extensions=["parquet"])
    s_full, m_full = train_states(ds, reduce="driver")
    s_pruned, m_pruned = train_states_pruned(path)
    assert m_full == m_pruned
    assert s_full["short"]["fsst"] == s_pruned["short"]["fsst"]
    assert s_full["short"]["ratio"] == s_pruned["short"]["ratio"]


def test_encode_sort_keys_permutation_regression():
    """sort_keys makes the encoder's gather order a permutation; a run
    like [0, 2, 1, 3] spans len-1 without being ascending, which once
    spuriously took the contiguous zero-copy fast path and mis-paired
    doc_ids with another row's token values."""
    from fsst_ray.stages.decoder import decode_chunks_batch
    from fsst_ray.codecs.select import DEFAULT_CODECS
    from fsst_ray.stages.encoder import encode_rows_to_chunks

    rows = {
        "d0": [1, 2, 3],
        "d2": [4, 5],
        "d1": [6, 7, 8, 9],
        "d3": [10],
    }
    batch = pa.table(
        {
            "doc_id": pa.array(list(rows)),
            "tokens": pa.array(list(rows.values()), type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(v) for v in rows.values()], type=pa.int32()),
            "source": pa.array(["s"] * 4),
        }
    )
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    # one chunk holds all rows; lexsort order is [0, 2, 1, 3]
    chunks = encode_rows_to_chunks(
        batch, {}, "s:00000", 1 << 20, DEFAULT_CODECS, sort_keys=doc_ids
    )
    decoded = decode_chunks_batch(chunks)
    got = {
        d: v
        for d, v in zip(
            decoded["doc_id"].to_pylist(), decoded["tokens"].to_pylist()
        )
    }
    assert got == rows


def test_bucket_writer_compaction_and_delivery_check(tmp_path):
    """Direct _BucketWriter unit: budget pressure compacts small
    buffers (pinned accounting drops to zero, rows survive), and
    finalize raises when delivered rows fall short of expected."""
    from fsst_ray.codecs.select import DEFAULT_CODECS
    from fsst_ray.pipelines.encode_job import _BucketWriter

    def make_table(part: str, ids: list[int]):
        return pa.table(
            {
                "doc_id": pa.array([f"{part}-{i}" for i in ids]),
                "tokens": pa.array([[i, i + 1] for i in ids], type=pa.list_(pa.int32())),
                "n_tok": pa.array([2] * len(ids), type=pa.int32()),
                "source": pa.array(["s"] * len(ids)),
                "part_key": pa.array([part] * len(ids)),
            }
        )

    w = _BucketWriter(
        str(tmp_path / "out"),
        {},
        chunk_tokens=1 << 10,
        codecs=DEFAULT_CODECS,
        flush_tokens=1 << 20,  # never flush on size
        budget_tokens=1,  # every add trips the budget sweep
    )
    w.add(make_table("s:00000", [0, 1, 2]), send_id=("a", 1))
    assert w.pinned_tokens == 0, "budget sweep must unpin small buffers"
    st = w.parts["s:00000"]
    assert st["rows"] == 3 and st["buf_tokens"] == 6
    # compacted buffer owns tight child buffers (parent released)
    child = st["bufs"][0]["tokens"].chunk(0).values
    assert len(child) == 6
    w.add(make_table("s:00000", [3]), send_id=("b", 1))
    entries = w.finalize({"s:00000": 4})
    assert entries[0]["rows"] == 4

    # delivery check: a writer that received fewer rows than routed
    w2 = _BucketWriter(
        str(tmp_path / "out2"), {}, chunk_tokens=1 << 10, codecs=DEFAULT_CODECS
    )
    w2.add(make_table("s:00001", [0, 1]), send_id=("c", 1))
    with pytest.raises(RuntimeError, match="expected"):
        w2.finalize({"s:00001": 5})


def test_route_worker_death_retry_dedup(tokens_ds, tmp_path, monkeypatch):
    """Kill one routing worker AFTER its sends are in flight; Ray
    reruns the task, the retry resends byte-identical sub-batches, and
    the writers' content-addressed send-id dedup must keep the output
    exact (no duplicated or lost rows)."""
    monkeypatch.setenv("FSST_FAULT_ROUTE_ONCE_DIR", str(tmp_path))
    out = str(tmp_path / "enc_fault")
    result = encode_dataset(
        tokens_ds, out, chunk_tokens=1 << 14, bucket_tokens=1 << 15
    )
    assert (tmp_path / "route_killed").exists(), "fault did not fire"
    assert result.metrics["rows"] == tokens_ds.count()
    monkeypatch.delenv("FSST_FAULT_ROUTE_ONCE_DIR")
    v = verify_roundtrip(tokens_ds, out)
    assert v["match"], v


def test_read_parquet_bundled_path_list_include_paths(ray_session, tmp_path):
    """The multi-leg streaming shape (tools/bigrun.py): a path LIST read
    as ONE ReadParquet operator, with include_paths exposing each row's
    source file so a leg prefix can be derived — the replacement for
    union-of-reads, which defeats streaming backpressure (UnionOperator
    does not pace input branches against the consumer)."""
    import pyarrow.compute as pc

    from fsst_ray.sources.tokens import read_parquet_bundled

    src = ensure_tokens_parquet(SCALE)
    files = sorted(__import__("pathlib").Path(src).glob("**/*.parquet"))
    legs = []
    for leg in range(3):
        d = tmp_path / f"leg{leg}"
        d.mkdir()
        for f in files:
            (d / f.name).symlink_to(f)
        legs.append(str(d))

    ds = read_parquet_bundled(legs, columns=["doc_id"], include_paths=True)
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    one_leg = read_parquet_bundled(src, columns=["doc_id"]).count()
    assert t.num_rows == 3 * one_leg
    m = pc.extract_regex(t["path"], r"/leg(?P<leg>\d+)/")
    legcol = pc.struct_field(m, "leg")
    counts = pc.value_counts(legcol).to_pylist()
    assert sorted(c["values"] for c in counts) == ["0", "1", "2"]
    assert all(c["counts"] == one_leg for c in counts)
    # prefixed doc_ids are globally unique across legs (the bigrun
    # invariant: leg 0 unprefixed, legs >0 get "L<leg>:")
    prefix = pc.if_else(
        pc.equal(legcol, "0"),
        pa.scalar(""),
        pc.binary_join_element_wise("L", legcol, ":", ""),
    )
    doc = pc.binary_join_element_wise(
        prefix, pc.cast(t["doc_id"], pa.string()), ""
    )
    assert len(pc.unique(doc)) == t.num_rows


def test_decode_select_point_lookup(tokens_ds, tmp_path):
    """Selective decode returns exactly the requested rows bit-identical
    to the source, and PRUNES: only the bucket files containing hits are
    re-read for payload, and only the hit chunks are decoded."""
    import pyarrow.compute as pc

    from fsst_ray import decode_select

    out = str(tmp_path / "enc_sel")
    encode_dataset(tokens_ds, out, chunk_tokens=1 << 14, bucket_tokens=1 << 15)

    src = tokens_ds.take_all()
    by_id = {r["doc_id"]: r for r in src}
    # ids concentrated in one source so the file-level pruning is visible
    wanted = sorted(d for d in by_id if d.startswith("english"))[:3]
    assert len(wanted) == 3

    stats: dict = {}
    got = pa.concat_tables(
        [
            pa.table(b)
            for b in decode_select(out, wanted, stats=stats).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    got = got.sort_by("doc_id")
    assert got["doc_id"].to_pylist() == wanted
    for i, d in enumerate(wanted):
        row = by_id[d]
        assert got["tokens"][i].as_py() == list(row["tokens"]), d
        assert got["n_tok"][i].as_py() == row["n_tok"]
        assert got["source"][i].as_py() == row["source"]

    assert stats["files_read"] < stats["files_total"], stats
    assert stats["chunks_decoded"] < stats["chunks_total"], stats
    # zone maps prune phase A itself: buckets whose [doc_min, doc_max]
    # range can't contain an "english*" id are never index-scanned
    assert stats["files_zone_scanned"] < stats["files_total"], stats
    assert stats["files_zone_scanned"] >= stats["files_read"], stats

    # empty selection: empty result, zero payload files read
    stats2: dict = {}
    empty = decode_select(out, ["no-such-doc"], stats=stats2)
    assert empty.count() == 0
    assert stats2["files_read"] == 0

    # legacy manifests (no zone fields) still scan everything, correctly
    import json

    from fsst_ray.state import manifest as mf

    cp = mf.compact_path(out)
    entries_json = json.loads(cp.read_text())
    for e in entries_json.values():
        e.pop("doc_min", None)
        e.pop("doc_max", None)
    cp.write_text(json.dumps(entries_json))
    stats3: dict = {}
    got3 = pa.concat_tables(
        [
            pa.table(b)
            for b in decode_select(out, wanted, stats=stats3).iter_batches(
                batch_format="pyarrow"
            )
        ]
    ).sort_by("doc_id")
    assert got3["doc_id"].to_pylist() == wanted
    assert stats3["files_zone_scanned"] == stats3["files_total"], stats3


def test_manifest_compaction_overlay_semantics(tmp_path):
    """compact folds per-part files into one; entries written AFTER a
    compaction overlay the compacted map (newest wins); a second
    compaction folds the overlay in."""
    out = str(tmp_path / "m")
    for i in range(5):
        mf.write_part_entry(out, {"part_key": f"p{i}", "status": "done", "v": i})
    assert mf.compact_manifest(out) == 5
    files = list(mf.manifest_dir(out).glob("*.json"))
    assert [p.name for p in files] == [mf._COMPACT_NAME]
    assert {e["v"] for e in mf.load_manifest(out).values()} == set(range(5))

    # post-compaction write overlays (a resume repairing p2)
    mf.write_part_entry(out, {"part_key": "p2", "status": "done", "v": 99})
    loaded = mf.load_manifest(out)
    assert len(loaded) == 5
    assert loaded["p2"]["v"] == 99

    assert mf.compact_manifest(out) == 5
    assert mf.load_manifest(out)["p2"]["v"] == 99
    assert len(list(mf.manifest_dir(out).glob("*.json"))) == 1


def test_decode_ntok_range_prunes_and_matches(tokens_ds, tmp_path):
    """Length-range selective decode returns exactly the in-range rows
    bit-identical to the source, decodes only hit chunks, and skips
    whole files with no hit chunk for tail selections."""
    from fsst_ray import decode_ntok_range

    out = str(tmp_path / "enc_range")
    encode_dataset(tokens_ds, out, chunk_tokens=1 << 14, bucket_tokens=1 << 15)

    src = sorted(tokens_ds.take_all(), key=lambda r: r["doc_id"])
    ntoks = sorted(int(r["n_tok"]) for r in src)
    lo = ntoks[int(len(ntoks) * 0.98)]  # ~p98 tail: selective
    hi = 1 << 30
    want = [r for r in src if lo <= r["n_tok"] <= hi]
    assert 0 < len(want) < len(src)

    stats: dict = {}
    got = pa.concat_tables(
        [
            pa.table(b)
            for b in decode_ntok_range(out, lo, hi, stats=stats).iter_batches(
                batch_format="pyarrow"
            )
        ]
    ).sort_by("doc_id")
    assert got.num_rows == len(want)
    for i, row in enumerate(want):
        assert got["doc_id"][i].as_py() == row["doc_id"]
        assert got["tokens"][i].as_py() == list(row["tokens"])
        assert got["n_tok"][i].as_py() == row["n_tok"]
    # chunk-level pruning engages (chunks are small here, so the tail
    # range must skip most of them); file-level skip when a bucket has
    # no hit chunk at all
    assert stats["chunks_decoded"] < stats["chunks_total"], stats
    assert stats["files_read"] <= stats["files_total"], stats

    # empty range: empty result, zero payload files read
    stats2: dict = {}
    empty = decode_ntok_range(out, 1 << 29, 1 << 30, stats=stats2)
    assert empty.count() == 0
    assert stats2["files_read"] == 0


def test_append_dataset_incremental_ingest(tokens_ds, tmp_path):
    """Append encodes only the new rows into generation-tagged buckets:
    old bucket files untouched, trained states reused for known sources
    (new sources get append-trained states), and decode / select see
    the union corpus bit-identical."""
    import json
    import pathlib

    import pyarrow.compute as pc
    import ray.data as rd

    from fsst_ray import append_dataset, decode_select
    from fsst_ray.pipelines.encode_job import _append_plan_path

    full = pa.concat_tables(
        pa.table(b) for b in tokens_ds.iter_batches(batch_format="pyarrow")
    )
    # disjoint halves by row parity; half B also carries a NEW source
    idx = np.arange(full.num_rows)
    half_a = full.take(pa.array(idx[idx % 2 == 0]))
    half_b = full.take(pa.array(idx[idx % 2 == 1]))
    nb = half_b.num_rows
    new_src = pc.if_else(
        pa.array(np.arange(nb) % 3 == 0),
        pa.scalar("appended-src"),
        half_b["source"].combine_chunks()
        if isinstance(half_b["source"], pa.ChunkedArray)
        else half_b["source"],
    )
    half_b = half_b.set_column(
        half_b.schema.get_field_index("source"), "source", new_src
    )

    out = str(tmp_path / "enc_append")
    encode_dataset(
        rd.from_arrow(half_a), out, chunk_tokens=1 << 14, bucket_tokens=1 << 15
    )
    base_files = {
        f.name: f.stat().st_mtime_ns
        for f in pathlib.Path(mf.chunks_dir(out)).glob("*.parquet")
    }
    base_states, _, _, _ = mf.load_plan(out)

    res = append_dataset(rd.from_arrow(half_b), out)
    assert res.metrics["generation"] == 1

    # old bucket files untouched, appended buckets generation-tagged
    after = {
        f.name: f.stat().st_mtime_ns
        for f in pathlib.Path(mf.chunks_dir(out)).glob("*.parquet")
    }
    for name, mtime in base_files.items():
        assert after[name] == mtime, f"base bucket {name} was rewritten"
    new_files = set(after) - set(base_files)
    assert new_files and all("g1-" in n for n in new_files), new_files

    # states reused for known sources; new source got its own
    sidecar = json.loads(_append_plan_path(out, 1).read_text())
    assert sidecar["completed"] is True
    app_states, _, _, _ = mf.load_plan(out, path=_append_plan_path(out, 1))
    for src, st in app_states.items():
        if src in base_states:
            assert st["fsst"] == base_states[src]["fsst"], src
    assert "appended-src" in app_states

    # union decode is bit-identical to old + new input
    union = pa.concat_tables([half_a, half_b])
    got = pa.concat_tables(
        pa.table(b)
        for b in decode_dataset(out).iter_batches(batch_format="pyarrow")
    )
    assert _sorted_rows(got) == _sorted_rows(union)

    # selective decode spans generations
    want_ids = sorted(
        [half_a["doc_id"][0].as_py(), half_b["doc_id"][0].as_py()]
    )
    sel = pa.concat_tables(
        pa.table(b)
        for b in decode_select(out, want_ids).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert sel["doc_id"].to_pylist() == want_ids

    # an incomplete generation blocks a fresh append but resumes
    mf.save_plan(
        out, app_states, {}, {}, sidecar["config"],
        path=_append_plan_path(out, 2),
        extra={"generation": 2, "completed": False},
    )
    with pytest.raises(AssertionError, match="incomplete"):
        append_dataset(rd.from_arrow(half_b.slice(0, 4)), out)


def test_append_resume_finishes_crashed_generation(tokens_ds, tmp_path):
    """A crashed append (sidecar saved, buckets partial or absent)
    resumed with resume=True finishes ITS generation rather than
    starting a new one, and the union decodes bit-identical."""
    import json

    import pyarrow.compute as pc
    import ray.data as rd

    from fsst_ray import append_dataset
    from fsst_ray.pipelines.encode_job import _append_plan_path

    full = pa.concat_tables(
        pa.table(b) for b in tokens_ds.iter_batches(batch_format="pyarrow")
    )
    idx = np.arange(full.num_rows)
    half_a = full.take(pa.array(idx[idx % 2 == 0]))
    half_b = full.take(pa.array(idx[idx % 2 == 1]))

    out = str(tmp_path / "enc_resume_app")
    encode_dataset(
        rd.from_arrow(half_a), out, chunk_tokens=1 << 14, bucket_tokens=1 << 15
    )

    # simulate the crash: run the plan/train half of append by hand
    # (exactly what append_dataset persists BEFORE encoding), leaving
    # completed=False and no generation buckets on disk
    from fsst_ray.stages.encoder import build_bucket_plan
    from fsst_ray.stages.trainer import train_states

    base_states, _, _, config = mf.load_plan(out)
    new_states, mass = train_states(rd.from_arrow(half_b))
    states = {s: base_states.get(s, st) for s, st in new_states.items()}
    bucket_plan = build_bucket_plan(mass, config["bucket_tokens"])
    mf.save_plan(
        out, states, bucket_plan, mass, config,
        path=_append_plan_path(out, 1),
        extra={"generation": 1, "completed": False},
    )

    res = append_dataset(rd.from_arrow(half_b), out, resume=True)
    assert res.metrics["generation"] == 1  # finished g1, did not open g2
    sidecar = json.loads(_append_plan_path(out, 1).read_text())
    assert sidecar["completed"] is True

    union = pa.concat_tables([half_a, half_b])
    got = pa.concat_tables(
        pa.table(b)
        for b in decode_dataset(out).iter_batches(batch_format="pyarrow")
    )
    assert _sorted_rows(got) == _sorted_rows(union)
