"""Driver contract: entry() smoke pipeline, queries() per operator,
oracle_sql() DuckDB equivalents.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import pathlib
import tempfile
from collections.abc import Callable
from typing import Any

_EN_STOP_SQL = "('the','and','of','a','to','in','is','it','that','for')"


def _read(sf_dir: str, table: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet")


def _scale_for(sf_dir: str) -> float:
    """Map /root/testdata/sfX -> synthetic tokens-corpus scale (sf*100:
    sf0.01 == FIXTURES.md 'small' correctness scale, ~6k rows)."""
    name = pathlib.Path(sf_dir).name
    try:
        return float(name.replace("sf", "")) * 100.0
    except ValueError:
        return 1.0


def _tmp_out(tag: str) -> str:
    base = pathlib.Path(os.environ.get("FSST_RAY_RUN_DIR", "/tmp/fsst_ray_runs"))
    base.mkdir(parents=True, exist_ok=True)
    return tempfile.mkdtemp(prefix=f"{tag}_", dir=base)


# --------------------------------------------------------------------------
# entry: flagship two-pass encode -> decode -> verify on the synthetic
# tokens corpus at sf0.001 scale
# --------------------------------------------------------------------------


def entry() -> Any:
    from fsst_ray import decode_dataset, encode_dataset, read_tokens_dataset, verify_roundtrip
    from fsst_ray.sources.tokens import ensure_tokens_parquet

    ds = read_tokens_dataset(scale=0.1)
    out = _tmp_out("entry")
    encode_dataset(
        ds,
        out,
        chunk_tokens=1 << 16,
        bucket_tokens=1 << 18,
        input_path=ensure_tokens_parquet(0.1),
    )
    v = verify_roundtrip(ds, out)
    assert v["match"], f"round-trip verification failed: {v}"
    return decode_dataset(out)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_fsst_text_roundtrip(sf_dir: str):
    from fsst_ray.pipelines.text_codec import fsst_text_roundtrip

    return fsst_text_roundtrip(_read(sf_dir, "documents"))


def _q_codec_numeric_roundtrip(sf_dir: str):
    from fsst_ray.pipelines.text_codec import int_column_roundtrip_groupby

    ds = _read(sf_dir, "lineitem")
    return int_column_roundtrip_groupby(ds, "l_partkey", "l_returnflag")


def _q_codec_float_roundtrip(sf_dir: str):
    """Lossless float-list codec (byte-plane transpose,
    codecs/floats.py) over the embeddings table: encode the flattened
    list<float> child buffer per batch, decode, and checksum per label
    with the position-weighted FLOOR(x*1e6) integer sum — integral
    doubles sum exactly, so DuckDB recomputes it bit-for-bit."""
    from fsst_ray.pipelines.text_codec import float_list_roundtrip_groupby

    return float_list_roundtrip_groupby(_read(sf_dir, "embeddings"), "embedding", "label")


def _q_codec_decimal_roundtrip(sf_dir: str):
    """Decimal-int float promotion (the ALP idea, codecs/floats.py)
    over events.value (2-decimal doubles): the codec verifies bitwise
    i/10^p reconstruction, stores ints through the existing int chunk
    codecs (bitpack here, ~4x), and the grouped FLOOR(x*100) checksum
    proves the round trip."""
    from fsst_ray.pipelines.text_codec import float_column_roundtrip_groupby

    return float_column_roundtrip_groupby(_read(sf_dir, "events"), "value", "event_type")


def _q_dedup_exact(sf_dir: str):
    from fsst_ray.functions.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents"))


def _q_segment_dedup(sf_dir: str):
    """Paragraph-level exact dedup at 10-word-window granularity
    (`segment_dedup`): first occurrence of each distinct segment wins,
    later occurrences are dropped and documents are rebuilt from their
    kept segments (docs fully covered by earlier text disappear). The
    sf0.01 documents table has ~151 naturally duplicated 10-word
    segments across 500 docs, so the query does real work."""
    import ray.data as rd

    from fsst_ray.functions.dedup import segment_dedup

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return segment_dedup(ds, segment_words=10)


def _q_dedup_prefix(sf_dir: str):
    from fsst_ray.functions.dedup import prefix_dedup

    return prefix_dedup(_read(sf_dir, "documents"))


def _q_word_stats(sf_dir: str):
    from fsst_ray.functions.textstats import word_stats_batch

    return _read(sf_dir, "documents").map_batches(word_stats_batch, batch_format="pyarrow")


def _q_quality(sf_dir: str):
    from fsst_ray.functions.textstats import quality_batch

    return _read(sf_dir, "documents").map_batches(quality_batch, batch_format="pyarrow")


def _q_langid(sf_dir: str):
    from fsst_ray.functions.textstats import langid_batch

    return _read(sf_dir, "documents").map_batches(langid_batch, batch_format="pyarrow")


def _q_score_documents(sf_dir: str):
    """Batched linear-model inference (classify.py): hashed
    bag-of-words classifier with the weight vector broadcast once via
    ray.put and fetched per ACTOR (not per batch) — the model-scoring
    stage shape. Buckets are md5-parity, weights integer, so the SQL
    oracle recomputes every score bit-for-bit."""
    import ray.data as rd

    from fsst_ray.functions.classify import score_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return score_documents(ds)


def _q_winnow_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints (winnowing, MOSS): every
    char 8-gram md5-hashed, each 16-window contributes its minimum,
    per-doc distinct set summarized as (n_fp, fp_sum mod 2^61-1) —
    integers the SQL oracle recomputes with the identical hash."""
    from fsst_ray.functions.textstats import winnow_batch

    return _read(sf_dir, "documents").map_batches(
        winnow_batch, batch_format="pyarrow"
    )


def _q_fingerprint(sf_dir: str):
    from fsst_ray.functions.textstats import fingerprint_batch

    return _read(sf_dir, "documents").map_batches(fingerprint_batch, batch_format="pyarrow")


def _q_redact_pii(sf_dir: str):
    """PII redaction over documents with deterministically planted
    emails/IPs (the synthetic corpus is PII-free, so 1/13 of docs get a
    doc_id-derived suffix — SQL-reproducible — to make the counts and
    replacements non-vacuous)."""
    from fsst_ray.functions.textstats import plant_pii_batch, redact_pii_batch

    def run(batch):
        return redact_pii_batch(plant_pii_batch(batch))

    return _read(sf_dir, "documents").map_batches(run, batch_format="pyarrow")


def _q_repetition_stats(sf_dir: str):
    from fsst_ray.functions.textstats import repetition_batch

    return _read(sf_dir, "documents").map_batches(
        repetition_batch, batch_format="pyarrow"
    )


def _q_shuffle_order(sf_dir: str):
    from fsst_ray.functions.curate import shuffle_order

    return shuffle_order(_read(sf_dir, "documents"))


def _q_events_window(sf_dir: str):
    from fsst_ray.functions.windows import tumbling_counts

    return tumbling_counts(_read(sf_dir, "events"))


def _q_hopping_window(sf_dir: str):
    from fsst_ray.functions.windows import hopping_counts

    return hopping_counts(_read(sf_dir, "events"), width_hours=2, hop_hours=1)


def _q_session_windows(sf_dir: str):
    from fsst_ray.functions.windows import session_windows

    return session_windows(_read(sf_dir, "events"))


def _q_ann_topk(sf_dir: str):
    from fsst_ray.functions.similarity import brute_force_topk

    return brute_force_topk(_read(sf_dir, "embeddings"), query_ids=list(range(10)), k=5)


def _q_ann_lsh(sf_dir: str):
    """Approximate LSH ANN made oracle-checkable without weakening the
    approximation: plant deterministic cosine-identical twins, query
    the planted originals, and project to rank-1 — the twin (sim 1.0)
    shares every LSH bucket with its original, so the 8-plane
    approximate path must find it, and SQL can recompute the rank-1
    neighbor exactly. Ranks 2+ stay approximate (pytest recall test)."""
    import pyarrow.compute as pc

    from fsst_ray.functions.similarity import lsh_topk, plant_twins

    aug = plant_twins(_read(sf_dir, "embeddings"))
    t = lsh_topk(aug, query_ids=[i * 50 for i in range(10)], k=5)
    return t.filter(pc.equal(t["rank"], 1))


def _q_ann_lsh_exhaustive(sf_dir: str):
    """LSH with zero hyperplanes: every vector lands in one bucket, so
    the scan is exhaustive and the result exact — oracle-checks the
    LSH machinery (bucketing, probe sets, scoring, merge) end-to-end;
    the approximate 8-plane path stays rows-only with a recall test."""
    from fsst_ray.functions.similarity import lsh_topk

    return lsh_topk(
        _read(sf_dir, "embeddings"), query_ids=list(range(10)), k=5, n_planes=0
    )


def _q_ann_ivf(sf_dir: str):
    """Approximate IVF ANN, oracle-checked at rank-1 via planted twins
    (same pattern as ann_lsh_topk): a cosine-identical twin is assigned
    to the same centroid as its original, which is always in the
    query's probe list, so nprobe=8 must return it at rank 1."""
    import pyarrow.compute as pc

    from fsst_ray.functions.similarity import ivf_topk, plant_twins

    aug = plant_twins(_read(sf_dir, "embeddings"))
    t = ivf_topk(aug, query_ids=[i * 50 for i in range(10)], k=5, nprobe=8)
    return t.filter(pc.equal(t["rank"], 1))


def _q_ann_ivf_exhaustive(sf_dir: str):
    """IVF with nprobe == n_centroids probes every inverted list, so
    the result is exact — the whole IVF machinery (sampling, k-means,
    assignment, scoring, merge) is oracle-checked end-to-end; the
    approximate nprobe<k path is covered by the pytest recall test."""
    from fsst_ray.functions.similarity import ivf_topk

    return ivf_topk(
        _read(sf_dir, "embeddings"),
        query_ids=list(range(10)),
        k=5,
        n_centroids=32,
        nprobe=32,
    )


def _q_ann_ivf_disk(sf_dir: str):
    """On-disk IVF: build the centroid-partitioned parquet index, then
    search with every list probed (exact — shares the ann_topk oracle).
    Partition pruning itself is asserted in pytest."""
    import pyarrow as pa

    from fsst_ray.functions.similarity import ivf_build, ivf_search

    ds = _read(sf_dir, "embeddings")
    idx = _tmp_out("ivf_idx")
    ivf_build(ds, idx, n_centroids=32)
    import pyarrow.compute as pc

    qset = pa.array(list(range(10)), type=pa.int64())
    q_rows = pa.Table.from_pylist(
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qset)),
            batch_format="pyarrow",
        ).take_all()
    )
    return ivf_search(idx, q_rows, k=5, nprobe=32)


def _q_embedding_near_dups(sf_dir: str):
    """Near-dup pairs over embeddings augmented with deterministic
    cosine-identical twins (the natural corpus has none — max natural
    cosine ~0.6 — so the oracle compares a non-vacuous planted set)."""
    from fsst_ray.functions.similarity import embedding_near_dups, plant_twins

    return embedding_near_dups(plant_twins(_read(sf_dir, "embeddings")), threshold=0.98)


def _q_embedding_quantize(sf_dir: str):
    """Int8 scalar quantization of the embedding column (the 4x
    vector-storage codec): per-dim min/max via a distributed aggregate
    broadcast once, codes bit-identical to the SQL oracle's double
    arithmetic (floor(q+0.5) on both engines). The int checksums
    (code_sum, position-weighted code_wsum) pin every code byte."""
    from fsst_ray.functions.similarity import quantize_embeddings

    return quantize_embeddings(_read(sf_dir, "embeddings")).select_columns(
        ["vec_id", "code_sum", "code_wsum"]
    )


def _q_fuzzy_decontaminate(sf_dir: str):
    """Cross-corpus fuzzy decontamination: training docs near-duplicate
    to any eval doc (eval = originals with doc_id % 17 == 0; train =
    everything else + planted exact copies). At threshold 1.0 the
    match predicate is identical-shingle-set (digest-checked), which
    SQL recomputes exactly; the planted copies of docs with
    doc_id % 119 == 0 are the non-vacuous flags. Only cross-side pairs
    ever materialize — the train side shuffles its banded projection,
    never text."""
    import pyarrow as _pa

    from fsst_ray.functions.dedup import fuzzy_decontaminate, plant_dup_docs

    def is_eval(batch):
        import numpy as _np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.take(
            _pa.array(_np.flatnonzero((ids % 17 == 0) & (ids < 1_000_000)))
        )

    def is_train(batch):
        import numpy as _np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.take(
            _pa.array(_np.flatnonzero(~((ids % 17 == 0) & (ids < 1_000_000))))
        )

    docs = _read(sf_dir, "documents")
    eval_ds = docs.map_batches(is_eval, batch_format="pyarrow")
    train_ds = plant_dup_docs(docs).map_batches(is_train, batch_format="pyarrow")
    return fuzzy_decontaminate(train_ds, eval_ds, jaccard_threshold=1.0)


def _q_consistent_sample(sf_dir: str):
    """Fixed-size-k deterministic sample: globally smallest k
    murmur64(doc_id) values (bit-exact DuckDB hash()), merged through
    the bounded two-level candidate shape — no corpus sort, driver
    holds <= k x 16 rows."""
    from fsst_ray.functions.curate import consistent_sample

    return consistent_sample(_read(sf_dir, "documents"), k=100)


def _q_kmeans_codes(sf_dir: str):
    """Distributed integer-exact k-means over int8-quantized embeddings
    (k=8, 2 assignment passes): per-iteration map partials of
    (cluster, count, per-dim int sums), driver fold + floor-division
    update, deterministic init from the k smallest vec_ids. Integer
    distances and integer centroid updates make every iteration
    bit-reproducible and SQL-recomputable."""
    from fsst_ray.functions.similarity import kmeans_codes

    return kmeans_codes(_read(sf_dir, "embeddings"), k=8, iters=2)


def _q_minhash_recall(sf_dir: str):
    """Recall of the approximate MinHash-LSH pair set (threshold 0.7)
    against its exact sibling (threshold 1.0 = identical shingle sets),
    computed distributed. Identical-set pairs have identical signatures
    and agreement 1.0, so recall is 1.0 by construction and the row is
    fully SQL-recomputable — the oracle counts set-equality pairs and
    asserts n_missed = 0. Replaces the rows-only minhash_dedup@0.7 row
    (VERDICT r3 item 5); the 0.7 pair machinery runs in full.

    Exact duplicates are PLANTED (doc_id % 7, SQL-reproducible): the
    natural corpus' near-dups shuffle word order, so it has zero
    identical-shingle-set pairs and the recall row would be vacuous."""
    from fsst_ray.functions.dedup import (
        minhash_pairs,
        pair_recall_summary,
        plant_dup_docs,
    )

    ds = plant_dup_docs(_read(sf_dir, "documents"))
    return pair_recall_summary(
        minhash_pairs(ds, jaccard_threshold=1.0),
        minhash_pairs(ds, jaccard_threshold=0.7),
    )


def _q_minhash_exact_clusters(sf_dir: str):
    """MinHash at threshold 1.0: a pair survives only if all 64 perms
    agree, i.e. (whp) the docs' distinct word-3-shingle sets are equal
    — which SQL can recompute exactly. Oracle-checks the full MinHash
    machinery (shingling, signatures, banding, verify, union-find,
    distributed assignment); the approximate 0.7 path stays rows-only."""
    from fsst_ray.functions.dedup import minhash_dedup

    return minhash_dedup(_read(sf_dir, "documents"), jaccard_threshold=1.0)


def _q_minhash_cc_clusters(sf_dir: str):
    """`minhash_exact_clusters` with the driver union-find replaced by
    distributed connected components (large-star/small-star over the
    verified pair edge list — `graph.py`): the transitive-closure
    shape that survives an edge list too big for the driver. Same
    oracle as the union-find sibling, so the two paths are pinned
    identical end-to-end."""
    from fsst_ray.functions.graph import minhash_dedup_cc

    return minhash_dedup_cc(_read(sf_dir, "documents"), jaccard_threshold=1.0)


def _q_minhash_lean_clusters(sf_dir: str):
    """`minhash_exact_clusters` over the LEAN band exchange
    (`minhash_pairs_lean`): 16 B/row (bucket, doc_id) band rows through
    the range sort, candidate pairs extracted unverified, signatures
    recomputed for candidate docs only in a second projected corpus
    pass, then the identical verification rule. Same oracle as the
    carry-path siblings, so the two exchange shapes are pinned
    identical end-to-end."""
    from fsst_ray.functions.dedup import minhash_dedup

    return minhash_dedup(
        _read(sf_dir, "documents"), jaccard_threshold=1.0, lean_exchange=True
    )


def _q_connected_components(sf_dir: str):
    """Distributed connected components on a deterministic multi-hop
    graph over the documents doc_ids (consecutive runs + skip links —
    closures need several hops, so the oracle's recursive CTE actually
    exercises transitivity). Labels = (node, component-min)."""
    from fsst_ray.functions.graph import chain_edges, connected_components

    docs = _read(sf_dir, "documents").select_columns(["doc_id"])
    return connected_components(chain_edges(docs))


_EPOCH_2024_US = 1704067200 * 10**6  # TIMESTAMP '2024-01-01' in epoch-µs
_HOUR_US = 3600 * 10**6


def _q_order_window_events(sf_dir: str):
    """Big-x-big equi+range join: every event that fell inside one of
    its user's deterministic order windows (lo = 2024-01-01 +
    (o_orderkey % 720) hours, len = (o_orderkey % 3) + 1 hours, key =
    o_custkey % 150 to land in the events user domain). 2,761 matches
    at sf0.01. See fsst_ray/functions/relational.py:interval_join."""
    import ray.data as rd

    from fsst_ray.functions.relational import interval_join

    def to_points(batch):
        import pyarrow as pa

        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("int64")
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": pa.array(ts, pa.int64()),
            }
        )

    def to_intervals(batch):
        import numpy as np
        import pyarrow as pa

        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = _EPOCH_2024_US + (ok % 720) * _HOUR_US
        hi = lo + ((ok % 3) + 1) * _HOUR_US
        return pa.table(
            {
                "ukey": pa.array(ck % 150, pa.int64()),
                "o_orderkey": pa.array(ok, pa.int64()),
                "lo_us": pa.array(lo, pa.int64()),
                "hi_us": pa.array(hi, pa.int64()),
            }
        )

    pts = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    ).map_batches(to_points, batch_format="pyarrow")
    ivs = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(to_intervals, batch_format="pyarrow")
    out = interval_join(pts, ivs, "user_id", "ukey", "ts_us", "lo_us", "hi_us")
    return out.select_columns(["user_id", "event_id", "o_orderkey"])


def _q_sink_jsonl(sf_dir: str):
    """Distributed JSONL SINK end-to-end (the write-side sibling of
    jsonl_ingest, whose export is a driver-side python loop): the
    documents projection streams through Ray's `write_json` sink (one
    shard per block, no driver materialization), is re-ingested through
    the shared normalizer, and must land on the parquet oracle's
    word_stats numbers — proving the distributed sink lossless."""
    import pathlib
    import shutil

    import ray.data as rd

    from fsst_ray.functions.textstats import word_stats_batch
    from fsst_ray.sources.documents import read_documents_jsonl

    d = pathlib.Path(f"/tmp/fsst_ray_runs/sink_jsonl_{pathlib.Path(sf_dir).name}")
    marker = d / "_done"
    if not marker.exists():
        if d.exists():
            shutil.rmtree(d)  # a crashed partial write must not double up
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).write_json(str(d))
        marker.write_text("ok")
    return read_documents_jsonl(str(d)).map_batches(
        word_stats_batch, batch_format="pyarrow"
    )


def _q_props_rollup(sf_dir: str):
    """Semi-structured extraction: the integer $.k field of the events
    JSON props column, extracted vectorized map-side (polars JSON-path
    kernel, no per-row json.loads) and rolled up per event_type. See
    fsst_ray/functions/jsonx.py."""
    import ray.data as rd

    from fsst_ray.functions.jsonx import props_int_rollup

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    return props_int_rollup(ev, "event_type", "props", "$.k")


def _q_user_event_paths(sf_dir: str):
    """Per-user ordered event-type path — SQL string_agg(event_type,
    ',' ORDER BY ts, event_id) GROUP BY user_id, via the sorted-block
    shape with ONE Arrow binary_join per block (no per-group Python).
    See fsst_ray/functions/analytics.py:group_concat."""
    import ray.data as rd

    from fsst_ray.functions.analytics import group_concat

    def project(batch):
        import pyarrow as pa

        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("int64")
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts_us": pa.array(ts, pa.int64()),
                "event_id": batch["event_id"],
            }
        )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    ).map_batches(project, batch_format="pyarrow")
    return group_concat(ev, "user_id", "event_type", ["ts_us", "event_id"], sep=",")


def _q_user_value_quantiles(sf_dir: str):
    """Exact per-user discrete quantiles of value-cents (PERCENTILE_DISC
    rank = ceil(n*q), pure integer) — see
    fsst_ray/functions/analytics.py:grouped_quantiles."""
    import ray.data as rd

    from fsst_ray.functions.analytics import grouped_quantiles

    def project(batch):
        import numpy as np
        import pyarrow as pa

        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cents": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(project, batch_format="pyarrow")
    return grouped_quantiles(
        ev, "user_id", "cents", [("q25", 1, 4), ("q50", 1, 2), ("q90", 9, 10)]
    )


_BPE_MERGES = 12


def _q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich 2016): ONE corpus
    pass of word-count partials + a vocab-sized groupby, then the
    merge loop over the (word, cnt) table — vocabulary-bounded, fully
    vectorized, deterministic (string tie-break). The oracle replays
    all 12 merges with nested window-function CTEs. See
    fsst_ray/functions/bpe.py."""
    from fsst_ray.functions.bpe import bpe_train

    docs = _read(sf_dir, "documents").select_columns(["text"])
    return bpe_train(docs, n_merges=_BPE_MERGES)


def _q_bpe_tokenize(sf_dir: str):
    """Apply the trained merges back to the corpus (map-side, merges
    broadcast via ray.put, batch-vocabulary dedup + one vectorized
    rewrite pass per merge): per doc (n_words, n_bpe_tokens). The
    oracle joins each doc's words to the CTE chain's FINAL symbol
    table. See fsst_ray/functions/bpe.py:bpe_apply."""
    from fsst_ray.functions.bpe import bpe_apply, bpe_train

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    merges = bpe_train(docs, n_merges=_BPE_MERGES)
    return bpe_apply(docs, merges)


def _bpe_apply_oracle() -> str:
    """Per-doc BPE token counts: the training CTE chain's final symbol
    table joined back to every doc word."""
    k = _BPE_MERGES
    return (
        _bpe_cte_prefix()
        + ", dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
        "FROM documents) "
        "SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens "
        f"FROM dw JOIN st{k} s ON s.word = dw.word "
        "WHERE dw.word <> '' GROUP BY dw.doc_id"
    )


def _bpe_oracle() -> str:
    """SQL mirror of the merge loop: per iteration, weighted adjacent
    pair counts, (count DESC, l, r) argmax, and the greedy
    non-overlapping rewrite via run-boundary + offset parity windows."""
    k = _BPE_MERGES
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS l_sym, r AS r_sym, "
        f"l || r AS new_token, c AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return _bpe_cte_prefix() + " " + finals


def _bpe_cte_prefix() -> str:
    k = _BPE_MERGES
    parts = [
        "WITH wc AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM "
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) "
        "WHERE word <> '' GROUP BY word), "
        "st0 AS MATERIALIZED (SELECT word, cnt, "
        "list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms "
        "FROM wc)"
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"p{i} AS (SELECT cnt, syms, unnest(range(1, len(syms))) AS i "
            f"FROM st{p}), "
            f"pc{i} AS (SELECT syms[i] AS l, syms[i+1] AS r, SUM(cnt) AS c "
            f"FROM p{i} GROUP BY l, r), "
            f"b{i} AS MATERIALIZED (SELECT l, r, CAST(c AS BIGINT) AS c FROM pc{i} "
            "ORDER BY c DESC, l, r LIMIT 1), "
            f"q{i} AS (SELECT word, cnt, syms, "
            f"unnest(range(1, len(syms) + 1)) AS i FROM st{p}), "
            f"m{i} AS (SELECT word, cnt, i, syms[i] AS s, "
            f"(i < len(syms) AND syms[i] = (SELECT l FROM b{i}) "
            f"AND syms[i+1] = (SELECT r FROM b{i})) AS hit FROM q{i}), "
            f"r{i} AS (SELECT *, CASE WHEN hit AND NOT COALESCE("
            "LAG(hit) OVER (PARTITION BY word ORDER BY i), FALSE) "
            f"THEN i END AS rs FROM m{i}), "
            f"r2{i} AS (SELECT *, MAX(rs) OVER (PARTITION BY word ORDER BY i "
            f"ROWS UNBOUNDED PRECEDING) AS runstart FROM r{i}), "
            f"r3{i} AS (SELECT *, (hit AND (i - runstart) % 2 = 0) AS keep "
            f"FROM r2{i}), "
            f"r4{i} AS (SELECT *, COALESCE(LAG(keep) OVER "
            "(PARTITION BY word ORDER BY i), FALSE) AS consumed, "
            f"LEAD(s) OVER (PARTITION BY word ORDER BY i) AS nxt FROM r3{i}), "
            f"st{i} AS MATERIALIZED (SELECT word, cnt, "
            "list(CASE WHEN keep THEN s || nxt ELSE s END ORDER BY i) "
            f"FILTER (WHERE NOT consumed) AS syms FROM r4{i} GROUP BY word, cnt)"
        )
    return ", ".join(parts)


def _q_lm_score(sf_dir: str):
    """Exact integer bigram-LM scoring (the perplexity-proxy quality
    signal, CCNet-style): corpus bigram/prefix counts folded via
    sum_per_key and broadcast, then map-side quantized-probability
    sums — floor(10^6 * c2/c1) per bigram, integer addition so the
    oracle's SUM order can't matter. See fsst_ray/functions/lm.py."""
    from fsst_ray.functions.lm import bigram_lm_score

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return bigram_lm_score(docs)


_PROFILE_COLS = ["doc_id", "lang", "n_chars", "source"]


def _q_profile_documents(sf_dir: str):
    """Exact column profiler over the documents table: per column
    (n, n_null, n_distinct, min/max repr) in one streaming pass —
    distinct exchanged as (column, value) rows bounded by per-column
    cardinality (the EXACT sibling of the hll/kmv sketches). See
    fsst_ray/functions/profile.py."""
    from fsst_ray.functions.profile import profile_table

    docs = _read(sf_dir, "documents").select_columns(_PROFILE_COLS)
    return profile_table(docs, _PROFILE_COLS)


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_repr, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_repr FROM documents"
        )
    return " UNION ALL ".join(parts)


def _q_orders_customers_right(sf_dir: str):
    """Right-outer hash join: orders ⟗ customer from the orders side —
    orderless customers appear once with null order columns (the
    mirror of customer_orders_left, exercising the right-join branch).
    See fsst_ray/functions/relational.py:hash_join."""
    import ray.data as rd

    from fsst_ray.functions.relational import hash_join

    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )
    cu = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return hash_join(od, cu, "o_custkey", "c_custkey", how="right")


_CAP_N = 10


def _q_cap_per_source(sf_dir: str):
    """Deterministic per-source doc cap (at most 10 docs/source by
    smallest (hash, id) — the over-represented-domain curation step;
    stable under reorder/rerun, caps nest; NON-VACUOUS: every sf0.01
    source has 25 docs, so the cap selects 10 of 25 everywhere). See
    fsst_ray/functions/curate.py:cap_per_key."""
    from fsst_ray.functions.curate import cap_per_key

    docs = _read(sf_dir, "documents").select_columns(["source", "doc_id"])
    return cap_per_key(docs, "source", _CAP_N)


def _q_time_of_week(sf_dir: str):
    """Calendar seasonality: event counts by day-of-week x hour-of-day
    — pure integer calendar arithmetic from epoch-µs (dow =
    (epoch_days + 4) % 7, matching DuckDB's 0=Sunday), one 168-cell
    bincount per batch. See
    fsst_ray/functions/windows.py:time_of_week_matrix."""
    import ray.data as rd

    from fsst_ray.functions.windows import time_of_week_matrix

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return time_of_week_matrix(ev)


def _q_monthly_orders(sf_dir: str):
    """Calendar-month order rollup: real civil-date conversion
    (Hinnant's civil_from_days, vectorized int64) so EXTRACT(year/
    month) matches exactly; amounts in integer cents. See
    fsst_ray/functions/windows.py:monthly_order_stats."""
    import ray.data as rd

    from fsst_ray.functions.windows import monthly_order_stats

    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return monthly_order_stats(od)


def _q_user_value_mad(sf_dir: str):
    """Per-user robust statistics (median + median absolute deviation
    of value-cents, both PERCENTILE_DISC-exact): two sorted-block
    quantile passes with the group-sized median table broadcast
    between them. See fsst_ray/functions/analytics.py:grouped_mad."""
    import ray.data as rd

    from fsst_ray.functions.analytics import grouped_mad

    def project(batch):
        import numpy as np
        import pyarrow as pa

        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cents": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(project, batch_format="pyarrow")
    return grouped_mad(ev, "user_id", "cents")


def _q_user_event_mode(sf_dir: str):
    """Per-user most-frequent event type with deterministic ties
    (max count, then smallest value) — map-side pair counts, one
    pair-cardinality aggregate, min_per_key finish. See
    fsst_ray/functions/analytics.py:grouped_mode."""
    import ray.data as rd

    from fsst_ray.functions.analytics import grouped_mode

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return grouped_mode(ev, "user_id", "event_type")


_PR_ITERS = 4
_PR_SCALE = 10**9


def _q_pagerank(sf_dir: str):
    """Fixed-point integer PageRank (4 iterations, scale 10^9, damping
    85/100) over the deterministic chain+skip graph — every iteration is
    floor-exact, so the oracle recomputes the identical ranks with k
    nested CTE layers. See fsst_ray/functions/graph.py:pagerank."""
    from fsst_ray.functions.graph import chain_edges, pagerank

    docs = _read(sf_dir, "documents").select_columns(["doc_id"])
    return pagerank(
        chain_edges(docs), src="doc_a", dst="doc_b",
        iterations=_PR_ITERS, scale=_PR_SCALE,
    )


def _pagerank_oracle() -> str:
    """k-layer CTE mirror of the fixed-point power iteration (the
    engine's floor arithmetic op-for-op; DuckDB `//` = integer div on
    BIGINTs, positive everywhere here)."""
    scale = _PR_SCALE
    base = scale * 15 // 100
    layers = [
        "WITH e AS (SELECT doc_id AS src, doc_id + 1 AS dst FROM documents "
        "WHERE doc_id % 8 < 5 "
        "UNION ALL SELECT doc_id, doc_id + 16 FROM documents "
        "WHERE doc_id % 64 = 0), "
        "nodes AS (SELECT node, CAST(SUM(deg) AS BIGINT) AS outdeg FROM "
        "(SELECT src AS node, 1 AS deg FROM e "
        "UNION ALL SELECT dst AS node, 0 AS deg FROM e) t GROUP BY node), "
        f"r0 AS (SELECT node, outdeg, CAST({scale} AS BIGINT) AS rank FROM nodes)"
    ]
    for i in range(_PR_ITERS):
        layers.append(
            f"r{i + 1} AS (SELECT n.node, n.outdeg, "
            f"CAST({base} + COALESCE(c.s, 0) AS BIGINT) AS rank "
            "FROM nodes n LEFT JOIN "
            "(SELECT e.dst AS node, SUM((r.rank * 85) // (100 * r.outdeg)) AS s "
            f"FROM e JOIN r{i} r ON e.src = r.node GROUP BY e.dst) c "
            "ON c.node = n.node)"
        )
    return (
        ", ".join(layers)
        + f" SELECT node, rank AS rank_fp FROM r{_PR_ITERS}"
    )


_BFS_SEEDS = [0, 128]


def _q_hop_distance(sf_dir: str):
    """Distributed multi-source BFS (min hop count from seeds 0/128)
    over the DIRECTED chain+skip graph — frontier expansion with an
    anti-join settled set, everything edge-/frontier-sized. The graph
    is a DAG (edges strictly increase the id) so the oracle's recursive
    CTE terminates. See fsst_ray/functions/graph.py:hop_distance."""
    from fsst_ray.functions.graph import chain_edges, hop_distance

    docs = _read(sf_dir, "documents").select_columns(["doc_id"])
    return hop_distance(
        chain_edges(docs), _BFS_SEEDS, src="doc_a", dst="doc_b"
    )


def _q_simhash_recall(sf_dir: str):
    """Recall of the approximate SimHash pair set (hamming <= 6)
    against its exact sibling (hamming 0 + word-set digest), computed
    distributed. Exact pairs have hamming 0 <= 6 so recall is 1.0 by
    construction; the oracle recomputes the row from word-set-equality
    pair counts. Replaces the rows-only simhash_pairs@6 row (VERDICT
    r3 item 5); the hamming<=6 machinery runs in full."""
    from fsst_ray.functions.dedup import (
        pair_recall_summary,
        simhash_exact_pairs,
        simhash_near_pairs,
    )

    ds = _read(sf_dir, "documents")
    return pair_recall_summary(
        simhash_exact_pairs(ds), simhash_near_pairs(ds, max_hamming=6)
    )


def _q_simhash_exact_pairs(sf_dir: str):
    """SimHash exact mode: hamming 0 + distinct-word-set digest
    equality == identical word sets (whp) — SQL-recomputable; the
    approximate hamming<=6 path stays rows-only."""
    from fsst_ray.functions.dedup import simhash_exact_pairs

    return simhash_exact_pairs(_read(sf_dir, "documents"))


def _q_ngram_jaccard(sf_dir: str):
    from fsst_ray.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(sf_dir, "documents"), threshold=0.8)


_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _q_token_count(sf_dir: str):
    """BPE-ish regex token counting (RE2 both engines)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def count(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = pc.count_substring_regex(arr, pattern=_TOKEN_REGEX)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return _read(sf_dir, "documents").map_batches(count, batch_format="pyarrow")


def _q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-style grouped aggregate over lineitem: map-side partial
    sums per (returnflag, linestatus) before a tiny groupby — the
    pre-aggregation shape every wide grouped sum should take. Integer
    columns only (quantity is integral-valued in the testdata) so the
    value hash is exact cross-engine."""
    import numpy as np
    import pyarrow as pa

    def partials(batch: pa.Table) -> pa.Table:
        rf = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        ls = batch["l_linestatus"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.char.add(np.char.add(rf.astype(str), "\x00"), ls.astype(str))
        uniq, inv = np.unique(key, return_inverse=True)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv] = np.arange(len(key))
        return pa.table(
            {
                "l_returnflag": pa.array(rf[first], type=pa.string()),
                "l_linestatus": pa.array(ls[first], type=pa.string()),
                "sum_qty": pa.array(np.bincount(inv, weights=qty).astype(np.int64)),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    agg = (
        _read(sf_dir, "lineitem")
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "n"])
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["l_returnflag", "l_linestatus", "sum_qty", "n"]),
        batch_format="pyarrow",
    )


def _q_supplier_nation_rollup(sf_dir: str):
    """Broadcast dimension join: the supplier->nation->region chain is
    composed driver-side and ray.put once; the lineitem fact table
    streams through a searchsorted lookup with map-side partials — no
    fact shuffle. Read pruned to the two needed columns."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from fsst_ray.functions.relational import dim_lookup_rollup

    fact = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_quantity"]
    )
    return dim_lookup_rollup(
        fact,
        pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]),
        pq.read_table(f"{sf_dir}/nation.parquet"),
        pq.read_table(f"{sf_dir}/region.parquet"),
    )


def _q_order_priority_rollup(sf_dir: str):
    """Big-x-big distributed hash join (lineitem x orders on orderkey):
    both sides pruned to key+payload projections at the read, one hash
    exchange, within-group cross product, map-side partials after."""
    import ray.data as rd

    from fsst_ray.functions.relational import order_priority_rollup

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    return order_priority_rollup(li, od)


def _docs_export_once(sf_dir: str, tag: str, filename: str, write_rows):
    """Export the documents table to an alternate format once per
    scale (cached under /tmp with a _done marker); returns the file
    path. `write_rows(f, pairs)` writes the (doc_id, text) rows."""
    import pathlib as _pl

    d = _pl.Path(f"/tmp/fsst_ray_runs/docs_{tag}_{_pl.Path(sf_dir).name}")
    marker = d / "_done"
    if not marker.exists():
        d.mkdir(parents=True, exist_ok=True)
        import pyarrow.parquet as _pq

        t = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        with open(d / filename, "w", newline="") as f:
            write_rows(f, zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        marker.write_text("ok")
    return str(d / filename)


def _q_csv_ingest(sf_dir: str):
    """CSV source end-to-end: export the documents table to CSV once,
    re-ingest through the shared normalizer, run word_stats — landing
    on the parquet oracle proves the CSV path lossless. Text is
    embedded-newline/quote-safe via csv.writer."""
    import csv as _csv

    from fsst_ray.functions.textstats import word_stats_batch
    from fsst_ray.sources.documents import read_documents_csv

    def write_rows(f, pairs):
        w = _csv.writer(f)
        w.writerow(["doc_id", "text"])
        w.writerows(pairs)

    path = _docs_export_once(sf_dir, "csv", "docs.csv", write_rows)
    return read_documents_csv(path).map_batches(
        word_stats_batch, batch_format="pyarrow"
    )


def _q_jsonl_ingest(sf_dir: str):
    """JSONL source end-to-end: same lossless proof as csv_ingest,
    through the JSONL reader."""
    import json as _json

    from fsst_ray.functions.textstats import word_stats_batch
    from fsst_ray.sources.documents import read_documents_jsonl

    def write_rows(f, pairs):
        for did, txt in pairs:
            f.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")

    path = _docs_export_once(sf_dir, "jsonl", "docs.jsonl", write_rows)
    return read_documents_jsonl(path).map_batches(
        word_stats_batch, batch_format="pyarrow"
    )


def _q_length_outliers(sf_dir: str):
    """Per-source length outliers (|z| > 3) with EXACT integer math:
    sufficient statistics via a sources-sized groupby broadcast back,
    cross-multiplied z-test so both engines compare the same BIGINTs."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.textstats import length_outliers

    return length_outliers(read_tokens_dataset(scale=_scale_for(sf_dir)))


def _q_retention_cohorts(sf_dir: str):
    """Cohort retention matrix over the events stream: distinct
    (user, week) projection per block, one hash exchange on user_id,
    per-user cohort = min week, matrix-sized final groupby. The event
    stream itself never shuffles."""
    from fsst_ray.functions.analytics import retention_cohorts

    return retention_cohorts(_read(sf_dir, "events"))


def _q_funnel_stages(sf_dir: str):
    """Ordered funnel view -> click -> purchase per user: one hash
    exchange on user_id, K masked reduceat sweeps per block compute
    every user's whole funnel (no per-user Python)."""
    from fsst_ray.functions.analytics import funnel_stages

    # 72h conversion window: at gate scale the cohort splits ~35/34/81
    # across stages 1/2/3 — non-vacuous stage differentiation
    return funnel_stages(_read(sf_dir, "events"), window_us=72 * 3600 * 1_000_000)


def _q_customer_orders_left(sf_dir: str):
    """LEFT outer hash join (customer x orders on custkey): customers
    with no orders keep one row with a NULL o_orderkey — exercises the
    null-index take path on naturally unmatched TPC-H keys (~1/3 of
    customers have no orders)."""
    import ray.data as rd

    from fsst_ray.functions.relational import hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )
    return hash_join(cust, od, "c_custkey", "o_custkey", how="left")


def _q_orders_semi_lineitem(sf_dir: str):
    """Semi join (orders ⋉ lineitem with l_quantity >= 45): orders that
    shipped at least one high-quantity line. The right side moves as
    map-side-deduped keys only (8 B/row); output is bounded by the
    left row count — no cross product, no skew guard needed."""
    import ray.data as rd

    from fsst_ray.functions.relational import existence_join

    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def hot_lines(t):
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["l_quantity"], 45.0)).select(
            ["l_orderkey"]
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(hot_lines, batch_format="pyarrow")
    return existence_join(od, li, "o_orderkey", "l_orderkey", how="semi")


def _q_customers_no_big_orders(sf_dir: str):
    """Anti join (customer ▷ σ(orders)): customers that never placed a
    high-value order — the NOT EXISTS shape. (In this testdata every
    customer has SOME order, so the unfiltered anti-join would be
    vacuous; the price filter keeps both branches populated: 68 of
    1,500 customers qualify at sf0.01.)"""
    import ray.data as rd

    from fsst_ray.functions.relational import existence_join

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def big_orders(t):
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["o_totalprice"], 350000.0)).select(
            ["o_custkey"]
        )

    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(big_orders, batch_format="pyarrow")
    return existence_join(cust, od, "c_custkey", "o_custkey", how="anti")


_WSAMPLE_CAP = 400  # documents.n_chars spans ~100-1200: mixes <1 and =1 probs


def _q_weighted_sample(sf_dir: str):
    """Weight-proportional Bernoulli sample over documents (weight =
    n_chars, cap 400): P(keep) = min(1, n_chars/400), exact uint64
    hash-threshold arithmetic recomputed verbatim by the oracle."""
    import ray.data as rd

    from fsst_ray.functions.curate import weighted_sample

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return weighted_sample(docs, "n_chars", _WSAMPLE_CAP)


def _q_hll_registers(sf_dir: str):
    """HyperLogLog register table (p=8) for distinct users per event
    type — integer-only output recomputable exactly by the oracle
    (DuckDB hash + bit-smear MSB); the float estimate is pytest-
    verified separately. See fsst_ray/functions/sketch.py."""
    import ray.data as rd

    from fsst_ray.functions.sketch import hll_registers

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return hll_registers(ev, "user_id", "event_type")


def _hll_oracle() -> str:
    smears = "".join(
        f", s{2*i} AS (SELECT event_type, bucket, v | (v >> {2*i}) AS v FROM s{i}) "
        for i in (1, 2, 4, 8, 16)
    )
    return (
        "WITH h AS (SELECT event_type, hash(user_id) AS hv FROM events), "
        "b AS (SELECT event_type, CAST(hv >> 56 AS BIGINT) AS bucket, "
        "hv & ((1::UBIGINT << 56) - 1) AS w FROM h), "
        "s1 AS (SELECT event_type, bucket, w | (w >> 1) AS v FROM b)"
        + smears
        + "SELECT event_type, bucket, "
        "MAX(CAST(56 - bit_count(v) + 1 AS BIGINT)) AS register "
        "FROM s32 GROUP BY event_type, bucket"
    )


def _q_cm_registers(sf_dir: str):
    """Count-Min register table (depth 4 x width 256) of per-user event
    frequencies within each event type — SUM-mergeable counting sketch,
    all-integer output recomputable exactly by the oracle (DuckDB hash
    + Kirsch-Mitzenmacher double hashing); the min-over-rows point
    estimate is pytest-verified. See fsst_ray/functions/sketch.py."""
    import ray.data as rd

    from fsst_ray.functions.sketch import cm_registers

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return cm_registers(ev, "user_id", "event_type")


def _cm_oracle() -> str:
    return (
        "WITH h AS (SELECT event_type, hash(user_id) AS h1 FROM events), "
        "d AS (SELECT event_type, CAST(h1 % 256 AS BIGINT) AS a, "
        "CAST((hash(h1) % 256) | 1 AS BIGINT) AS step FROM h), "
        "r AS (SELECT event_type, CAST(rr AS BIGINT) AS hash_row, "
        "(a + rr * step) % 256 AS bucket "
        "FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) t(rr)) "
        "SELECT event_type, hash_row, bucket, COUNT(*) AS register "
        "FROM r GROUP BY event_type, hash_row, bucket"
    )


def _q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(o_orderstatus, o_orderpriority) over orders:
    integer-cents SUM + COUNT at every prefix level with NULL-marked
    subtotal rows — one map-side partial pass, one finest-level hash
    aggregate, coarser levels derived from the bounded finest table.
    See fsst_ray/functions/analytics.py."""
    import ray.data as rd

    from fsst_ray.functions.analytics import rollup_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    return rollup_aggregate(
        orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice"
    )


def _q_moving_sums(sf_dir: str):
    """Frame-bounded moving window (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW) of value-cents per user over events — the sliding-
    frame sibling of running_totals, same sort + vectorized-block
    shape. See fsst_ray/functions/analytics.py."""
    import ray.data as rd

    from fsst_ray.functions.analytics import moving_sums

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return moving_sums(ev, k=4)


def _q_normalize_text(sf_dir: str):
    """Canonical text normalization (lowercase, punctuation -> space,
    whitespace collapse, trim) + normalized word count — vectorized RE2
    kernels mirrored verbatim by the oracle's regexp_replace chain.
    See fsst_ray/functions/textstats.py."""
    import ray.data as rd

    from fsst_ray.functions.textstats import normalize_text

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return normalize_text(docs)


def _q_pivot_unpivot(sf_dir: str):
    """Wide -> long UNPIVOT of the event-type pivot matrix (composition
    roundtrip: pivot_counts then unpivot) — zero-count combinations are
    preserved as explicit rows. See fsst_ray/functions/analytics.py."""
    import ray.data as rd

    from fsst_ray.functions.analytics import pivot_counts, unpivot

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    wide = pivot_counts(ev, "user_id", "event_type", _PIVOT_CATS)
    return unpivot(wide, "user_id", _PIVOT_CATS, "event_type", "n")


def _q_quality_deciles(sf_dir: str):
    """Global rank-bucketing of docs into quality deciles — RANK-based
    so value-ties share a bucket (no tie-break convention to align with
    the oracle); computed via a bounded quality histogram, zero corpus
    shuffle. See fsst_ray/functions/curate.py."""
    import ray.data as rd

    from fsst_ray.functions.curate import quality_deciles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return quality_deciles(docs)


_MIX_TARGET = 4000  # chars per source: ~0.5 keep rate on this testdata


def _q_mix_corpus(sf_dir: str):
    """Token-budget corpus mixing: per-source downsample to a flat 4000-
    char budget via exact 128-bit hash-threshold arithmetic (rate =
    min(1, target/total)); deterministic and oracle-recomputable. See
    fsst_ray/functions/curate.py."""
    import ray.data as rd

    from fsst_ray.functions.curate import mix_corpus

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return mix_corpus(docs, _MIX_TARGET)


def _q_customer_orders_full(sf_dir: str):
    """FULL OUTER equi-join (negative-balance customers vs big orders):
    non-vacuous on all three row classes at sf0.01 (7 left-only, 4157
    right-only, 381 matched). Same one-exchange sorted-block hash_join
    as inner/left, with null-masked takes on BOTH sides and the join
    key read from whichever side is real. See
    fsst_ray/functions/relational.py:hash_join."""
    import pyarrow.compute as _pc
    import ray.data as rd

    from fsst_ray.functions.relational import hash_join

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda b: b.filter(_pc.less(b["c_acctbal"], 0)).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    ).map_batches(
        lambda b: b.filter(_pc.greater(b["o_totalprice"], 350000)).select(
            ["o_custkey", "o_orderkey"]
        ),
        batch_format="pyarrow",
    )
    return hash_join(cust, orders, "c_custkey", "o_custkey", how="full")


def _q_lineitem_moments(sf_dir: str):
    """Per-returnflag exact second-moment sums of (quantity,
    discount-pct): the sufficient statistics for mean/var/cov/Pearson-r
    kept as BIGINTs so the distributed merge is associative-exact and
    oracle-comparable; the float correlation is pytest-verified via
    corr_from_moments. See fsst_ray/functions/analytics.py."""
    import ray.data as rd

    from fsst_ray.functions.analytics import moment_stats

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def project(b):
        import numpy as _np
        import pyarrow as _pa

        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        d = b["l_discount"].to_numpy(zero_copy_only=False)
        return _pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "x": _pa.array(_np.floor(q + 0.5).astype(_np.int64)),
                "y": _pa.array(_np.floor(d * 100 + 0.5).astype(_np.int64)),
            }
        )

    proj = li.map_batches(project, batch_format="pyarrow")
    return moment_stats(proj, "x", "y", "l_returnflag", x_bound=64, y_bound=16)


def _q_tumbling_distinct(sf_dir: str):
    """COUNT(DISTINCT user_id) per 1-hour tumbling window — two-level
    distinct aggregate, both exchanges pair-sized. See
    fsst_ray/functions/windows.py."""
    import ray.data as rd

    from fsst_ray.functions.windows import tumbling_distinct_users

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    return tumbling_distinct_users(ev, hours=1)


def _q_value_histogram(sf_dir: str):
    """Equi-width histogram (width 5) of event values per event type —
    map-side packed-code partials + one histogram-sized groupby-sum.
    See fsst_ray/functions/windows.py."""
    import ray.data as rd

    from fsst_ray.functions.windows import value_histogram

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return value_histogram(ev, bin_width=5)


def _q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(o_orderstatus, o_orderpriority): every grouping
    subset derived from one finest-level distributed aggregate. See
    fsst_ray/functions/analytics.py."""
    import ray.data as rd

    from fsst_ray.functions.analytics import cube_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    return cube_aggregate(
        orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice"
    )


_BM25_QUERIES = {
    0: ["hash", "join", "merge"],
    1: ["window", "sort", "stream"],
    2: ["spark", "dup"],
}


def _q_bm25_topk(sf_dir: str):
    """BM25 top-10 lexical retrieval for three fixed term queries —
    quantized-integer scoring (rational idf, floor(contrib*1e6) per
    term, int sum) so the DuckDB oracle matches bit-exactly; see
    fsst_ray/functions/search.py."""
    import ray.data as rd

    from fsst_ray.functions.search import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_topk(docs, _BM25_QUERIES, k=10)


def _bm25_oracle() -> str:
    # dedupe terms per query exactly as bm25_topk does (a duplicate
    # VALUES row would double COUNT(*) inside the tf saturation)
    vals = ", ".join(
        f"({q}, '{t}')"
        for q in sorted(_BM25_QUERIES)
        for t in sorted(set(_BM25_QUERIES[q]))
    )
    return (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
        "FROM documents), "
        "dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id), "
        "st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl), "
        f"q(query_id, word) AS (VALUES {vals}), "
        "df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w "
        "WHERE word IN (SELECT word FROM q) GROUP BY word), "
        "tf AS (SELECT q.query_id, w.doc_id, q.word, COUNT(*) AS tf "
        "FROM q JOIN w ON w.word = q.word GROUP BY q.query_id, w.doc_id, q.word), "
        # expression shape mirrors search.py exactly: rational idf,
        # (tf*2.2), denom, quantize-then-sum (int addition commutes)
        "sc AS (SELECT tf.query_id, tf.doc_id, CAST(SUM(CAST(FLOOR("
        "((st.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) "
        "/ (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / "
        "(CAST(st.total_dl AS DOUBLE) / st.n_docs)))) * 1e6) AS BIGINT)) "
        "AS BIGINT) AS score "
        "FROM tf, st "
        "JOIN df ON df.word = tf.word "
        "JOIN dl ON dl.doc_id = tf.doc_id "
        "GROUP BY tf.query_id, tf.doc_id), "
        "r AS (SELECT query_id, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY score DESC, doc_id) AS rnk, doc_id, score FROM sc) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, rnk, doc_id, score "
        "FROM r WHERE rnk <= 10"
    )


_SPAN_K = 8  # 8-word grams: well below the 151 naturally-duplicated
# 10-word segments at sf0.01, so masking is non-vacuous (24 docs /
# 1,254 words masked)


def _q_ngram_span_dedup(sf_dir: str):
    """Duplicate n-gram SPAN masking (Lee et al. exact-substring-dedup
    shape, hashed word-8-grams): grams occurring >= 2x corpus-wide keep
    their first occurrence, every later occurrence's span is masked
    out of the text; see fsst_ray/functions/dedup.py:ngram_span_dedup."""
    import ray.data as rd

    from fsst_ray.functions.dedup import ngram_span_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_span_dedup(docs, k=_SPAN_K, min_count=2)


def _span_dedup_oracle() -> str:
    k = _SPAN_K
    return (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        f"p AS (SELECT doc_id, ws, unnest(range(1, len(ws) - {k} + 2)) AS i "
        f"FROM w WHERE len(ws) >= {k}), "
        f"g AS (SELECT doc_id, i, array_to_string(ws[i:i+{k}-1], ' ') AS gram FROM p), "
        "r AS (SELECT doc_id, i, COUNT(*) OVER (PARTITION BY gram) AS cnt, "
        "ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rk FROM g), "
        "dup AS (SELECT doc_id, i FROM r WHERE cnt >= 2 AND rk > 1), "
        f"m AS (SELECT DISTINCT doc_id, unnest(range(i, i + {k})) AS j FROM dup), "
        "words AS (SELECT doc_id, unnest(ws) AS word, "
        "unnest(range(1, len(ws)+1)) AS j FROM w), "
        "kept AS (SELECT words.doc_id, word, words.j FROM words "
        "LEFT JOIN m ON m.doc_id = words.doc_id AND m.j = words.j "
        "WHERE m.doc_id IS NULL), "
        "ka AS (SELECT doc_id, COUNT(*) AS n_kept, "
        "string_agg(word, ' ' ORDER BY j) AS text_dedup FROM kept GROUP BY doc_id) "
        "SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words, "
        "CAST(len(w.ws) - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_masked, "
        "COALESCE(ka.text_dedup, '') AS text_dedup "
        "FROM w LEFT JOIN ka ON ka.doc_id = w.doc_id"
    )


def _q_event_deltas(sf_dir: str):
    """Per-user LAG(event_id) / ts-gap (µs) ordered by (ts, event_id):
    the running_totals sorted-block shape, all-integer output; see
    fsst_ray/functions/analytics.py:event_deltas."""
    import ray.data as rd

    from fsst_ray.functions.analytics import event_deltas

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    return event_deltas(ev)


_PIVOT_CATS = ["click", "error", "purchase", "signup", "view"]


def _q_event_type_pivot(sf_dir: str):
    """Long -> wide pivot: per-user event-type count matrix via ONE
    map-side bincount partial pass + Ray's hash-aggregate sum (no
    map_groups); see fsst_ray/functions/analytics.py:pivot_counts."""
    import ray.data as rd

    from fsst_ray.functions.analytics import pivot_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", _PIVOT_CATS)


def _q_fuzzy_name_pairs(sf_dir: str):
    """All customer-name pairs within Levenshtein distance 1
    (entity-resolution shape): deletion-neighborhood candidates +
    vectorized specialized verify — no all-pairs product. Non-vacuous:
    19,500 one-digit-apart name pairs at sf0.01. See
    fsst_ray/functions/fuzzy.py."""
    import ray.data as rd

    from fsst_ray.functions.fuzzy import fuzzy_pairs

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_name"])
    return fuzzy_pairs(cust, "c_name")


# terms chosen for selectivity: 'dup' has df 25/500 at sf0.01, so the
# conjunction is small but non-empty (13 docs) — a vacuous AND query
# would prove nothing
_INVINDEX_TERMS = ["dup", "hash", "merge"]


def _q_inverted_index_stats(sf_dir: str):
    """Build the delta+stream-vbyte postings index (file-per-bucket,
    md5-parity term buckets), then DECODE every postings list back into
    (term, df, doc_id_sum) — proving the compressed artifact holds
    exactly the distinct (term, doc_id) pairs the oracle recomputes.
    See fsst_ray/functions/invindex.py."""
    import ray.data as rd

    from fsst_ray.functions.invindex import build_inverted_index, index_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = _tmp_out("invindex")
    build_inverted_index(docs, out, n_buckets=16)
    return index_stats(out)


def _q_postings_and_query(sf_dir: str):
    """Boolean AND retrieval over the postings index: docs containing
    ALL of three fixed terms; reads only the <=3 bucket files the terms
    hash into (file pruning pytest-asserted)."""
    import ray.data as rd

    from fsst_ray.functions.invindex import and_query, build_inverted_index

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = _tmp_out("invq")
    build_inverted_index(docs, out, n_buckets=16)
    return and_query(out, _INVINDEX_TERMS)


_RATE_BANDS = [(0, 0.0, 10.0), (1, 5.0, 25.0), (2, 20.0, 60.0), (3, 50.0, 1000.0)]


def _q_asof_join(sf_dir: str):
    from fsst_ray.functions.relational import asof_join_events

    return asof_join_events(_read(sf_dir, "events"))


def _q_range_join(sf_dir: str):
    from fsst_ray.functions.relational import range_join_bands

    return range_join_bands(_read(sf_dir, "events"), _RATE_BANDS)


def _q_running_totals(sf_dir: str):
    import ray.data as rd

    from fsst_ray.functions.analytics import running_totals

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return running_totals(ev)


def _q_top_n_per_group(sf_dir: str):
    import ray.data as rd

    from fsst_ray.functions.analytics import top_n_per_group

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "doc_id", "n_chars"]
    )
    return top_n_per_group(docs, n=3)


def _q_distinctive_terms(sf_dir: str):
    import ray.data as rd

    from fsst_ray.functions.textstats import distinctive_terms

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return distinctive_terms(docs, k=10)


def _q_kmv_distinct(sf_dir: str):
    from fsst_ray.functions.sketch import kmv_distinct

    return kmv_distinct(_read(sf_dir, "events"), "user_id", "event_type", k=16)


def _q_kmv_distinct_exact(sf_dir: str):
    """Exact-mode sibling: k above the true cardinality makes the
    merged sketch hold every distinct hash, so est_distinct == the
    exact distinct count (and the oracle's COUNT(DISTINCT) CASE)."""
    from fsst_ray.functions.sketch import kmv_distinct

    return kmv_distinct(_read(sf_dir, "events"), "user_id", "event_type", k=1 << 16)


def _kmv_oracle(k: int) -> str:
    return (
        "WITH h AS (SELECT DISTINCT event_type, "
        "CAST(hash(user_id) >> 1 AS BIGINT) AS hv FROM events), "
        "r AS (SELECT event_type, hv, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn, "
        "COUNT(*) OVER (PARTITION BY event_type) AS nd FROM h) "
        f"SELECT event_type, CAST(LEAST(nd, {k}) AS BIGINT) AS n_hashes, "
        "hv AS kth_min, "
        f"CAST(CASE WHEN nd < {k} THEN nd "
        f"ELSE (CAST({k - 1} AS HUGEINT) * "
        "CAST('9223372036854775808' AS HUGEINT)) // CAST(hv AS HUGEINT) "
        "END AS BIGINT) AS est_distinct "
        f"FROM r WHERE rn = LEAST(nd, {k})"
    )


def _q_top_quality(sf_dir: str):
    from fsst_ray.functions.curate import top_quality_docs

    return top_quality_docs(_read(sf_dir, "documents"), k=100)


def _q_ntok_percentiles(sf_dir: str):
    """Exact per-source n_tok percentiles of the tokens corpus via a
    distributed value histogram (DuckDB quantile_disc parity)."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.vocab import ntok_percentiles

    return ntok_percentiles(read_tokens_dataset(scale=_scale_for(sf_dir)))


def _q_pack_sequences(sf_dir: str):
    """Sequence packing (packed pretraining layout): global token
    offset + sequence span per doc via a distributed exclusive
    prefix-scan over the (doc_id, n_tok) projection — token bytes
    never move (fsst_ray/functions/packing.py)."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.packing import pack_sequences

    return pack_sequences(read_tokens_dataset(scale=_scale_for(sf_dir)), seq_len=4096)


def _q_corpus_split(sf_dir: str):
    from fsst_ray.functions.curate import corpus_split

    return corpus_split(_read(sf_dir, "documents"), val_pct=10)


def _q_curate(sf_dir: str):
    """Composite curation: map-side quality+langid filter, exact-dedup
    winners — only survivors' projections shuffle."""
    from fsst_ray.functions.curate import curate

    return curate(_read(sf_dir, "documents"), min_quality=60, langs=("en",))


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: broadcast the eval set's shingle
    union (ray.put), vectorized membership test per training batch —
    a broadcast semi-join with zero corpus shuffle."""
    from fsst_ray.functions.curate import decontaminate

    return decontaminate(_read(sf_dir, "documents"), eval_mod=97, min_hits=1)


def _q_blocklist_filter(sf_dir: str):
    """Banned-document anti-join with Bloom pushdown: the blocklist
    (content fingerprints of every 13th doc) builds a broadcast Bloom
    bitmap; only Bloom-positive candidates enter one blocklist-sized
    exact-verify exchange; the verified drop-list broadcasts back for a
    map-side filter — the corpus never shuffles. Planted exact copies
    (doc_id % 7) make the blocklist catch non-original rows too
    (copies of docs with doc_id % 91 == 0)."""
    import pyarrow as _pa

    from fsst_ray.functions.curate import blocklist_filter
    from fsst_ray.functions.dedup import plant_dup_docs
    from fsst_ray.functions.textstats import fingerprint_batch

    corpus = plant_dup_docs(_read(sf_dir, "documents"))

    def block_fps(batch):
        import numpy as _np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.take(_pa.array(_np.flatnonzero(ids % 13 == 0)))
        return _pa.table({"fp": fingerprint_batch(sub)["fingerprint"]})

    blocklist = _read(sf_dir, "documents").map_batches(
        block_fps, batch_format="pyarrow"
    )
    return blocklist_filter(corpus, blocklist)


def _q_stratified_sample(sf_dir: str):
    """Per-source deterministic sampling (corpus re-mixing): map-side
    hash-threshold filter, zero shuffle, nested samples across rate
    changes. src1 upsampled to 50%, src2 dropped, others 10%."""
    from fsst_ray.functions.curate import stratified_sample

    return stratified_sample(
        _read(sf_dir, "documents"),
        rates_bp={"src1": 5000, "src2": 0},
        default_bp=1000,
    )


def _q_media_features(sf_dir: str):
    """Media decode plumbing over payloads derived from the documents
    table (header fields are pure functions of doc_id, body = UTF-8
    text bytes), projected to the integer columns a SQL oracle can
    recompute; the float feature path is covered by pytest."""
    from fsst_ray.functions.multimodal import extract_media_features, media_from_documents

    feats = extract_media_features(media_from_documents(_read(sf_dir, "documents")))
    return feats.map_batches(
        lambda t: t.select(["media_id", "media_type", "width", "height", "n_bytes"]),
        batch_format="pyarrow",
    )


def _q_token_histogram(sf_dir: str):
    """Top-100 token ids of the synthetic tokens corpus (vocab stats)."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.vocab import token_histogram

    return token_histogram(read_tokens_dataset(scale=_scale_for(sf_dir)), k=100)


def _q_explode_tokens(sf_dir: str):
    """UNNEST WITH ORDINALITY of the tokens corpus: (doc_id, pos,
    token) via buffer-level list_flatten — zero shuffle, zero per-row
    Python. See fsst_ray/functions/vocab.py."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.vocab import explode_tokens

    return explode_tokens(read_tokens_dataset(scale=_scale_for(sf_dir)))


def _q_bigram_histogram(sf_dir: str):
    """Top-100 within-document token bigrams (n-gram LM statistics):
    packed-int64 pair partials + the token_histogram hash-bucketed
    merge. See fsst_ray/functions/vocab.py."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.vocab import bigram_histogram

    return bigram_histogram(read_tokens_dataset(scale=_scale_for(sf_dir)), k=100)


def _q_heavy_hitters(sf_dir: str):
    """Exact top-20 token ids via the Misra-Gries mergeable sketch +
    candidate-only recount (sketch.py) — the sketch-sized-exchange
    sibling of token_histogram, whose shuffle is vocabulary-sized. The
    corpus has ~431k distinct tokens >> capacity=1024, so the sketch
    genuinely compresses (nonzero undercount bound) and the exactness
    guard (k-th count > undercount) proves the answer before returning."""
    from fsst_ray import read_tokens_dataset
    from fsst_ray.functions.sketch import token_heavy_hitters

    return token_heavy_hitters(
        read_tokens_dataset(scale=_scale_for(sf_dir)), k=20, capacity=1024
    )


def _q_frame_sample(sf_dir: str):
    """Frame-sampling plumbing over documents-derived media payloads;
    the (media_id, frame_no, n_frames) projection is SQL-recomputable
    from the payload layout (8-byte header + UTF-8 body, 256-byte
    frames, stride 4)."""
    from fsst_ray.functions.multimodal import media_from_documents, sample_frames

    frames = sample_frames(
        media_from_documents(_read(sf_dir, "documents")), frame_bytes=256, stride=4
    )
    return frames.map_batches(
        lambda t: t.select(["media_id", "frame_no", "n_frames"]),
        batch_format="pyarrow",
    )


def _q_tokens_roundtrip(sf_dir: str):
    """Flagship: encode -> decode -> per-source order-sensitive summary;
    the DuckDB oracle computes the same summary over the original corpus
    parquet, so any token value/order/row difference hash-mismatches."""
    from fsst_ray import decode_dataset, encode_dataset, read_tokens_dataset
    from fsst_ray.sources.tokens import ensure_tokens_parquet
    from fsst_ray.stages.decoder import tokens_summary

    scale = _scale_for(sf_dir)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("tok_rt")
    encode_dataset(
        ds,
        out,
        chunk_tokens=1 << 17,
        bucket_tokens=1 << 19,
        input_path=ensure_tokens_parquet(scale),
    )
    return tokens_summary(decode_dataset(out))


def _q_append_roundtrip(sf_dir: str):
    """Incremental ingest correctness: encode the even half of the
    corpus (doc_id's last digit), APPEND the odd half through
    `append_dataset` (states reused for known sources, generation-
    tagged buckets, old files untouched), then decode the UNION and
    summarize per source. The oracle is the same full-corpus summary
    as tokens_roundtrip, so any appended-row loss, duplication, or
    value corruption hash-mismatches."""
    import pyarrow.compute as pc

    from fsst_ray import (
        append_dataset,
        decode_dataset,
        encode_dataset,
        read_tokens_dataset,
    )
    from fsst_ray.stages.decoder import tokens_summary

    scale = _scale_for(sf_dir)
    ds = read_tokens_dataset(scale=scale)

    def _half(odd: bool):
        def pick(batch):
            m = None
            for d in "13579":
                e = pc.ends_with(batch["doc_id"], pattern=d)
                m = e if m is None else pc.or_(m, e)
            return batch.filter(m if odd else pc.invert(m))

        return ds.map_batches(pick, batch_format="pyarrow")

    out = _tmp_out("app_rt")
    encode_dataset(_half(False), out, chunk_tokens=1 << 17, bucket_tokens=1 << 19)
    res = append_dataset(_half(True), out)
    assert res.metrics.get("generation") == 1, res.metrics
    return tokens_summary(decode_dataset(out))


def _q_decode_generation(sf_dir: str):
    """Generation time travel: encode the even half (generation 0),
    APPEND the odd half (generation 1), then decode AS OF generation 0
    — the summary must equal the even half alone, proving appended
    files are pruned at the manifest level (pruning asserted). See
    fsst_ray/pipelines/decode_job.py:decode_generation."""
    import pyarrow.compute as pc

    from fsst_ray import (
        append_dataset,
        decode_generation,
        encode_dataset,
        read_tokens_dataset,
    )
    from fsst_ray.stages.decoder import tokens_summary

    scale = _scale_for(sf_dir)
    ds = read_tokens_dataset(scale=scale)

    def _half(odd: bool):
        def pick(batch):
            m = None
            for d in "13579":
                e = pc.ends_with(batch["doc_id"], pattern=d)
                m = e if m is None else pc.or_(m, e)
            return batch.filter(m if odd else pc.invert(m))

        return ds.map_batches(pick, batch_format="pyarrow")

    out = _tmp_out("gen_tt")
    encode_dataset(_half(False), out, chunk_tokens=1 << 17, bucket_tokens=1 << 19)
    append_dataset(_half(True), out)
    stats: dict = {}
    summary = tokens_summary(decode_generation(out, 0, stats=stats))
    assert stats["files_read"] < stats["files_total"], stats
    return summary


def _q_decode_point_lookup(sf_dir: str):
    """Selective decode (point lookup): encode the corpus, then decode
    ONLY the docs whose id ends in '00' through the two-phase pruned
    read (`decode_select`: phase A scans just the chunk-index columns,
    phase B re-reads and decodes only the hit bucket files/chunks).
    Returns per-doc (doc_id, n_tok, checksum) with the same
    order-sensitive checksum the flagship roundtrip uses, so the
    oracle recomputes it from the original parquet."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from fsst_ray import decode_select, encode_dataset, read_tokens_dataset
    from fsst_ray.sources.tokens import ensure_tokens_parquet, read_parquet_bundled
    from fsst_ray.stages.serialize import tokens_views

    scale = _scale_for(sf_dir)
    path = ensure_tokens_parquet(scale)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("sel")
    encode_dataset(
        ds, out, chunk_tokens=1 << 17, bucket_tokens=1 << 19, input_path=path
    )

    # the wanted set from a projected doc_id-only read (never the
    # token bytes); bounded: 1% of ids end in "00"
    wanted: list[str] = []
    for b in read_parquet_bundled(path, columns=["doc_id"]).iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        wanted += t.filter(pc.ends_with(t["doc_id"], pattern="00"))[
            "doc_id"
        ].to_pylist()

    sel = decode_select(out, wanted).map_batches(
        _doc_checksum_table, batch_format="pyarrow"
    )
    parts = [pa.table(b) for b in sel.iter_batches(batch_format="pyarrow")]
    assert parts, "decode_select returned no rows"
    return pa.concat_tables(parts).sort_by("doc_id")


def _doc_checksum_table(batch):
    """(doc_id, n_tok, checksum) with the order-sensitive per-row token
    checksum the flagship roundtrip uses (oracle-recomputable via
    list_transform)."""
    import numpy as np
    import pyarrow as pa

    from fsst_ray.stages.serialize import tokens_views

    values, offsets = tokens_views(batch)
    lens = offsets[1:] - offsets[:-1]
    pos = (
        np.arange(len(values), dtype=np.int64)
        - np.repeat(offsets[:-1], lens)
        + 1
    )
    weighted = (values.astype(np.int64) + 1) * pos
    row_sums = np.zeros(len(lens), dtype=np.int64)
    nonempty = lens > 0
    if len(values) and nonempty.any():
        row_sums[nonempty] = np.add.reduceat(weighted, offsets[:-1][nonempty])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tok": batch["n_tok"],
            "checksum": pa.array(row_sums, type=pa.int64()),
        }
    )


_NTOK_RANGE_LO, _NTOK_RANGE_HI = 2000, 1 << 30


def _q_split_windows(sf_dir: str):
    """Fixed-length training windows with stride over every doc's
    token sequence (overlap at stride < seq_len): pure map-side flat
    expansion, token payloads never leave the map task. The
    position-weighted window checksum pins every gathered token."""
    from fsst_ray.functions.packing import split_windows
    from fsst_ray import read_tokens_dataset

    ds = read_tokens_dataset(scale=_scale_for(sf_dir))
    # the oracle's dims table caps windows per doc at 4096 — make any
    # corpus/stride change that could exceed it fail LOUDLY here
    # instead of silently diverging from the oracle
    if ds.max("n_tok") > 384 * 4096:
        raise ValueError("oracle window cap exceeded")
    return split_windows(ds, seq_len=512, stride=384)


def _q_upsert_roundtrip(sf_dir: str):
    """Upsert end-to-end: encode the corpus, replace every doc whose id
    ends in '3' with a modified version (tokens + [0]) via
    delete+purge+append, decode — the union must equal the SQL CASE
    oracle per-doc-checksum-exactly."""
    import numpy as _np
    import pyarrow as pa
    import pyarrow.compute as pc

    from fsst_ray import decode_dataset, encode_dataset, read_tokens_dataset, upsert_docs
    from fsst_ray.sources.tokens import ensure_tokens_parquet, read_parquet_bundled

    scale = _scale_for(sf_dir)
    path = ensure_tokens_parquet(scale)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("upsert")
    encode_dataset(
        ds, out, chunk_tokens=1 << 17, bucket_tokens=1 << 19, input_path=path
    )

    def modified(batch):
        t = pa.table(batch) if not isinstance(batch, pa.Table) else batch
        sel = t.filter(pc.ends_with(t["doc_id"], pattern="3"))
        toks = sel["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.flatten().to_numpy(zero_copy_only=False).astype(_np.int32)
        offs = _np.asarray(toks.offsets, dtype=_np.int64)
        offs = offs - offs[0]
        n = sel.num_rows
        new_vals = _np.insert(vals, offs[1:].astype(_np.int64), 0)
        new_offs = offs + _np.arange(n + 1)
        new_toks = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), pa.array(new_vals, pa.int32())
        )
        ntok = sel["n_tok"].to_numpy(zero_copy_only=False).astype(_np.int32) + 1
        return pa.table(
            {
                "doc_id": sel["doc_id"],
                "tokens": new_toks,
                "n_tok": pa.array(ntok, pa.int32()),
                "source": sel["source"],
            }
        )

    ups = read_parquet_bundled(path).map_batches(modified, batch_format="pyarrow")
    upsert_docs(ups, out)
    sel = decode_dataset(out).map_batches(
        _doc_checksum_table, batch_format="pyarrow"
    )
    parts = [pa.table(b) for b in sel.iter_batches(batch_format="pyarrow")]
    assert parts, "decode returned no rows"
    return pa.concat_tables(parts).sort_by("doc_id")


def _q_delete_roundtrip(sf_dir: str):
    """Tombstone delete end-to-end: encode, delete every doc whose id
    ends in '7' (SQL-reproducible), decode — deleted rows must never
    surface, surviving rows must be bit-identical (per-doc checksum
    vs the filtered oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fsst_ray import decode_dataset, delete_docs, encode_dataset
    from fsst_ray.sources.tokens import ensure_tokens_parquet, read_parquet_bundled
    from fsst_ray import read_tokens_dataset

    scale = _scale_for(sf_dir)
    path = ensure_tokens_parquet(scale)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("tomb")
    encode_dataset(
        ds, out, chunk_tokens=1 << 17, bucket_tokens=1 << 19, input_path=path
    )
    dead: list[str] = []
    for b in read_parquet_bundled(path, columns=["doc_id"]).iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        dead += t.filter(pc.ends_with(t["doc_id"], pattern="7"))["doc_id"].to_pylist()
    delete_docs(out, dead)
    sel = decode_dataset(out).map_batches(
        _doc_checksum_table, batch_format="pyarrow"
    )
    parts = [pa.table(b) for b in sel.iter_batches(batch_format="pyarrow")]
    assert parts, "decode returned no rows"
    return pa.concat_tables(parts).sort_by("doc_id")


def _q_decode_source(sf_dir: str):
    """Per-source selective decode (the "export the english split"
    read): pruning is purely manifest-level — buckets are per-source by
    construction, so only the selected source's files are opened; a
    pytest/CLI stat asserts files_read < files_total. Same per-doc
    checksum table as the other selective reads."""
    import pyarrow as pa

    from fsst_ray import decode_source, encode_dataset, read_tokens_dataset
    from fsst_ray.sources.tokens import ensure_tokens_parquet

    scale = _scale_for(sf_dir)
    path = ensure_tokens_parquet(scale)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("srcsel")
    encode_dataset(
        ds, out, chunk_tokens=1 << 17, bucket_tokens=1 << 19, input_path=path
    )
    stats: dict = {}
    sel = decode_source(out, ["english"], stats=stats).map_batches(
        _doc_checksum_table, batch_format="pyarrow"
    )
    assert stats["files_read"] < stats["files_total"], stats
    parts = [pa.table(b) for b in sel.iter_batches(batch_format="pyarrow")]
    assert parts, "decode_source returned no rows"
    return pa.concat_tables(parts).sort_by("doc_id")


def _q_decode_ntok_range(sf_dir: str):
    """Selective decode (length range): encode the corpus, then decode
    ONLY the rows with n_tok in [2000, 2^30] — the curriculum
    "long sequences only" read — through the two-phase pruned
    `decode_ntok_range` (phase A scans just (part_key, chunk_seq,
    n_tok), phase B decodes only hit chunks). The range sits above the
    corpus p99, so most chunks/files are skipped (pruning asserted in
    pytest)."""
    import pyarrow as pa

    from fsst_ray import decode_ntok_range, encode_dataset, read_tokens_dataset
    from fsst_ray.sources.tokens import ensure_tokens_parquet

    scale = _scale_for(sf_dir)
    path = ensure_tokens_parquet(scale)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("selr")
    encode_dataset(
        ds, out, chunk_tokens=1 << 17, bucket_tokens=1 << 19, input_path=path
    )
    sel = decode_ntok_range(out, _NTOK_RANGE_LO, _NTOK_RANGE_HI).map_batches(
        _doc_checksum_table, batch_format="pyarrow"
    )
    parts = [pa.table(b) for b in sel.iter_batches(batch_format="pyarrow")]
    assert parts, "decode_ntok_range returned no rows"
    return pa.concat_tables(parts).sort_by("doc_id")


_METRICS_BUCKET_TOKENS = 1 << 19


def _q_encode_metrics(sf_dir: str):
    """Manifest/lineage accounting per source: bucket-plan part count
    (deterministic ceil of exact pass-1 mass) + manifest row/token
    totals, all reproducible by the oracle from the corpus parquet."""
    import pyarrow as pa

    from fsst_ray import encode_dataset, read_tokens_dataset
    from fsst_ray.state import manifest as mf

    from fsst_ray.sources.tokens import ensure_tokens_parquet

    scale = _scale_for(sf_dir)
    ds = read_tokens_dataset(scale=scale)
    out = _tmp_out("metrics")
    result = encode_dataset(
        ds,
        out,
        chunk_tokens=1 << 17,
        bucket_tokens=_METRICS_BUCKET_TOKENS,
        input_path=ensure_tokens_parquet(scale),
    )
    per_source: dict[str, dict] = {
        s: {"n_parts": n, "n_docs": 0, "total_tokens": 0}
        for s, n in result.bucket_plan.items()
    }
    for part_key, entry in mf.load_manifest(out).items():
        source = part_key.rsplit(":", 1)[0]
        per_source[source]["n_docs"] += entry["rows"]
        per_source[source]["total_tokens"] += entry["tokens"]
    rows = [
        {"source": s, **info} for s, info in sorted(per_source.items())
    ]
    return pa.Table.from_pylist(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver gate verifies roughly the first 50
    # entries per round (CORRECTNESS_r04 covered exactly positions
    # 0-49). Every query below has an oracle and ALL 88 are checked
    # value-exactly by tests/test_queries_oracle.py each run; the dict
    # order only decides which ones get a driver row this round.
    # Block 1: the 22 queries with no driver row in any prior round
    # (the whole corpus lifecycle, kmv, curate/decontaminate, ...).
    # Block 2: previously-green queries whose code paths changed in
    # round 5 (window rewrite, CC default flip, hash-join guard,
    # quantize schema fix, assert->ValueError) plus one representative
    # per operator family. Block 3: previously-green, code untouched
    # this round, redundant siblings last (e.g. 5 of the 6 ANN
    # variants; ann_topk represents the family).
    return {
        # -- block 1: never driver-verified before round 5 ------------
        "tokens_roundtrip": _q_tokens_roundtrip,
        "append_roundtrip": _q_append_roundtrip,
        "delete_roundtrip": _q_delete_roundtrip,
        "upsert_roundtrip": _q_upsert_roundtrip,
        "decode_point_lookup": _q_decode_point_lookup,
        "decode_source": _q_decode_source,
        "decode_ntok_range": _q_decode_ntok_range,
        "encode_metrics": _q_encode_metrics,
        "kmv_distinct": _q_kmv_distinct,
        "kmv_distinct_exact": _q_kmv_distinct_exact,
        "top_quality_docs": _q_top_quality,
        "ntok_percentiles": _q_ntok_percentiles,
        "pack_sequences": _q_pack_sequences,
        "split_windows": _q_split_windows,
        "corpus_split": _q_corpus_split,
        "curate": _q_curate,
        "decontaminate": _q_decontaminate,
        "blocklist_filter": _q_blocklist_filter,
        "stratified_sample": _q_stratified_sample,
        "media_features": _q_media_features,
        "frame_sample": _q_frame_sample,
        "token_histogram": _q_token_histogram,
        # session-9 additions — the NEWEST never-driver-verified code,
        # placed directly after the lifecycle block so they land inside
        # the driver's ~50-query window (the session 1-8 additions
        # below have had more rounds of pytest+oracle-mirror hardening)
        "pagerank": _q_pagerank,
        "hop_distance": _q_hop_distance,
        "order_window_events": _q_order_window_events,
        "user_event_paths": _q_user_event_paths,
        "user_value_quantiles": _q_user_value_quantiles,
        "user_event_mode": _q_user_event_mode,
        "user_value_mad": _q_user_value_mad,
        "time_of_week": _q_time_of_week,
        "monthly_orders": _q_monthly_orders,
        "cap_per_source": _q_cap_per_source,
        "orders_customers_right": _q_orders_customers_right,
        "profile_documents": _q_profile_documents,
        "bpe_train": _q_bpe_train,
        "bpe_tokenize": _q_bpe_tokenize,
        "lm_score": _q_lm_score,
        "sink_jsonl": _q_sink_jsonl,
        "props_rollup": _q_props_rollup,
        "decode_generation": _q_decode_generation,
        # round-5 sessions 1-8 — never driver-verified
        "segment_dedup": _q_segment_dedup,
        "score_documents": _q_score_documents,
        "heavy_hitters": _q_heavy_hitters,
        "orders_semi_lineitem": _q_orders_semi_lineitem,
        "customers_no_big_orders": _q_customers_no_big_orders,
        "bm25_topk": _q_bm25_topk,
        "hll_registers": _q_hll_registers,
        "weighted_sample": _q_weighted_sample,
        "inverted_index_stats": _q_inverted_index_stats,
        "postings_and_query": _q_postings_and_query,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "event_type_pivot": _q_event_type_pivot,
        "event_deltas": _q_event_deltas,
        "ngram_span_dedup": _q_ngram_span_dedup,
        # running_totals: r4's ONLY red row (oracle dtype artifact,
        # fixed) — keep it safely inside the driver's ~50-query window
        "running_totals": _q_running_totals,
        "cm_registers": _q_cm_registers,
        "orders_rollup": _q_orders_rollup,
        "moving_sums": _q_moving_sums,
        "mix_corpus": _q_mix_corpus,
        "normalize_text": _q_normalize_text,
        "quality_deciles": _q_quality_deciles,
        "pivot_unpivot": _q_pivot_unpivot,
        "orders_cube": _q_orders_cube,
        "customer_orders_full": _q_customer_orders_full,
        "explode_tokens": _q_explode_tokens,
        "lineitem_moments": _q_lineitem_moments,
        "tumbling_distinct": _q_tumbling_distinct,
        "value_histogram": _q_value_histogram,
        "bigram_histogram": _q_bigram_histogram,
        # -- block 2: round-5-changed paths + family representatives --
        "session_windows": _q_session_windows,
        "minhash_exact_clusters": _q_minhash_exact_clusters,
        "minhash_cc_clusters": _q_minhash_cc_clusters,
        "minhash_lean_clusters": _q_minhash_lean_clusters,
        "connected_components": _q_connected_components,
        "customer_orders_left": _q_customer_orders_left,
        "order_priority_rollup": _q_order_priority_rollup,
        "supplier_nation_rollup": _q_supplier_nation_rollup,
        "embedding_quantize": _q_embedding_quantize,
        "kmeans_codes": _q_kmeans_codes,
        "fuzzy_decontaminate": _q_fuzzy_decontaminate,
        "consistent_sample": _q_consistent_sample,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "repetition_stats": _q_repetition_stats,
        "redact_pii": _q_redact_pii,
        "length_outliers": _q_length_outliers,
        "retention_cohorts": _q_retention_cohorts,
        "funnel_stages": _q_funnel_stages,
        "fsst_text_roundtrip": _q_fsst_text_roundtrip,
        "codec_numeric_roundtrip": _q_codec_numeric_roundtrip,
        "codec_float_roundtrip": _q_codec_float_roundtrip,
        "dedup_exact": _q_dedup_exact,
        "events_window": _q_events_window,
        "ann_topk": _q_ann_topk,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "top_n_per_group": _q_top_n_per_group,
        "distinctive_terms": _q_distinctive_terms,
        # -- block 3: green in r4, untouched, siblings covered above --
        "codec_decimal_roundtrip": _q_codec_decimal_roundtrip,
        "dedup_prefix": _q_dedup_prefix,
        "word_stats": _q_word_stats,
        "quality_score": _q_quality,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "shuffle_order": _q_shuffle_order,
        "hopping_window": _q_hopping_window,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_lsh_exhaustive": _q_ann_lsh_exhaustive,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_ivf_exhaustive": _q_ann_ivf_exhaustive,
        "ann_ivf_disk": _q_ann_ivf_disk,
        "embedding_near_dups": _q_embedding_near_dups,
        "minhash_recall": _q_minhash_recall,
        "simhash_recall": _q_simhash_recall,
        "simhash_exact_pairs": _q_simhash_exact_pairs,
        "ngram_jaccard": _q_ngram_jaccard,
        "token_count": _q_token_count,
        "lineitem_pricing": _q_lineitem_pricing,
        "jsonl_ingest": _q_jsonl_ingest,
        "csv_ingest": _q_csv_ingest,
    }


def oracle_sql() -> dict[str, str]:
    # the tokens corpus is deterministic synthetic parquet on disk;
    # generating here (cached, ~1s at driver scale) makes the oracle
    # independent of whether the Ray query ran first
    from fsst_ray.sources.tokens import ensure_tokens_parquet

    corpus = f"read_parquet('{ensure_tokens_parquet(1.0)}/*.parquet')"
    tokens_summary_sql = (
        "SELECT source, COUNT(*) AS n_docs, "
        "CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
        "CAST(SUM(list_sum(list_transform(tokens, "
        "(x, i) -> (CAST(x AS BIGINT) + 1) * i))) AS BIGINT) AS checksum "
        f"FROM {corpus} GROUP BY source"
    )
    stop = _EN_STOP_SQL
    langs = {
        "de": "('der','die','und','das','ist','von','mit','ein','nicht','den')",
        "en": stop,
        "es": "('el','la','de','que','y','en','un','es','no','por')",
        "fr": "('le','la','et','les','des','un','une','du','est','dans')",
        "zh": "('的','是','在','了','和','有','我','不','这','人')",
    }
    counts = ", ".join(
        f"CAST(len(list_filter(string_split(text,' '), w -> w IN {words})) AS BIGINT) AS c_{lang}"
        for lang, words in langs.items()
    )
    greatest = "GREATEST(c_de, c_en, c_es, c_fr, c_zh)"
    return {
        "fsst_text_roundtrip": "SELECT doc_id, text FROM documents",
        "codec_numeric_roundtrip": (
            "SELECT l_returnflag, CAST(SUM(l_partkey) AS BIGINT) AS sum_l_partkey, "
            "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
        ),
        "codec_float_roundtrip": (
            "SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n, "
            "CAST(SUM(list_sum(list_transform(embedding, "
            "(x, i) -> FLOOR(CAST(x AS DOUBLE) * 1000000) * i))) AS BIGINT) "
            "AS checksum FROM embeddings GROUP BY label"
        ),
        "codec_decimal_roundtrip": (
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS checksum "
            "FROM events GROUP BY event_type"
        ),
        "dedup_exact": "SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text",
        "segment_dedup": (
            # 10-word-window segments (DuckDB list slices are 1-based,
            # end-inclusive, clamped — ws[i*10+1 : (i+1)*10] is window
            # i); first (doc_id, seg_idx) occurrence of each distinct
            # segment wins; docs rebuilt from kept segments in order,
            # fully-covered docs vanish via the HAVING
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
            "FROM documents), "
            "seg AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx, "
            "array_to_string(ws[(i*10+1):((i+1)*10)], ' ') AS seg "
            "FROM w, UNNEST(range(0, CAST(ceil(len(ws)/10.0) AS BIGINT))) AS t(i)), "
            "r AS (SELECT doc_id, seg_idx, seg, "
            "ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn "
            "FROM seg) "
            "SELECT doc_id, COUNT(*) AS n_seg, "
            "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
            "string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE rn = 1) AS text "
            "FROM r GROUP BY doc_id "
            "HAVING SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0"
        ),
        "dedup_prefix": (
            "SELECT substring(text, 1, 40) AS prefix_key, MIN(doc_id) AS doc_id, "
            "COUNT(*) AS n_dups FROM documents GROUP BY 1"
        ),
        "score_documents": (
            # hashed-BoW linear model: bucket = md5_number_upper(word)
            # % 4096 (bit-parity with the engine's worker-side DuckDB
            # hashing); weight = (bucket*2654435761) % 1001 - 500 — the
            # exact integer formula make_weights() vectorizes
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
            "FROM documents), "
            "s AS (SELECT doc_id, CAST(SUM("
            "(CAST(md5_number_upper(w) % 4096 AS BIGINT) * 2654435761) % 1001 - 500"
            ") AS BIGINT) AS score FROM w GROUP BY doc_id) "
            "SELECT doc_id, score, CAST(score > 0 AS BIGINT) AS positive FROM s"
        ),
        "csv_ingest": (
            # identical to word_stats — the CSV round trip must be lossless
            "SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents"
        ),
        "jsonl_ingest": (
            # identical to word_stats — the JSONL round trip must be
            # lossless, so the parquet oracle is the ground truth
            "SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents"
        ),
        "sink_jsonl": (
            # the distributed write_json sink must round-trip losslessly,
            # so the same parquet word_stats oracle is the ground truth
            "SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents"
        ),
        "word_stats": (
            "SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents"
        ),
        "quality_deciles": (
            "WITH s AS (SELECT doc_id, "
            "CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents), "
            "q AS (SELECT doc_id, LEAST(GREATEST((100*n_distinct)//GREATEST(n_words,1)"
            " + (100*n_stop_en)//GREATEST(n_words,1), 0), 200) AS quality FROM s) "
            "SELECT doc_id, quality, CAST(1 + (10 * (RANK() OVER (ORDER BY quality)"
            " - 1)) // COUNT(*) OVER () AS BIGINT) AS decile FROM q"
        ),
        "quality_score": (
            "WITH s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text, "
            "CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents) "
            "SELECT doc_id, n_chars_text, n_words, n_distinct, n_stop_en, "
            "LEAST(GREATEST((100*n_distinct)//GREATEST(n_words,1) + "
            "(100*n_stop_en)//GREATEST(n_words,1), 0), 200) AS quality FROM s"
        ),
        "langid": (
            f"WITH c AS (SELECT doc_id, {counts} FROM documents) "
            "SELECT doc_id, CASE "
            f"WHEN c_de = {greatest} THEN 'de' "
            f"WHEN c_en = {greatest} THEN 'en' "
            f"WHEN c_es = {greatest} THEN 'es' "
            f"WHEN c_fr = {greatest} THEN 'fr' "
            "ELSE 'zh' END AS pred_lang, c_de, c_en, c_es, c_fr, c_zh FROM c"
        ),
        "redact_pii": (
            # planting + regexes verbatim from textstats.plant_pii_batch /
            # EMAIL_RE / IPV4_RE; both engines run RE2 so replacement and
            # count semantics are identical, and the oracle nests its
            # regexp_replace in the engine's order (emails first)
            "WITH p AS (SELECT doc_id, text || CASE WHEN doc_id % 13 = 0 "
            "THEN ' contact user' || doc_id || '@example.com at 10.0.' || "
            "(doc_id % 256) || '.' || (doc_id % 100) ELSE '' END AS t "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_email, "
            "CAST(len(regexp_extract_all(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip, "
            "regexp_replace(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') "
            "AS clean_text FROM p"
        ),
        "repetition_stats": (
            "WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents), "
            "s AS (SELECT doc_id, CAST(GREATEST(len(ws)-1,0) AS BIGINT) AS n_bigrams, "
            "CAST(len(list_distinct(list_transform(range(1, GREATEST(len(ws),1)), "
            "i -> ws[i] || ' ' || ws[i+1]))) AS BIGINT) AS n_distinct_bigrams FROM w) "
            "SELECT doc_id, n_bigrams, n_distinct_bigrams, "
            "(100*(n_bigrams - n_distinct_bigrams))//GREATEST(n_bigrams,1) AS dup_pct "
            "FROM s"
        ),
        "shuffle_order": (
            "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY hash(doc_id), doc_id) "
            "- 1 AS BIGINT) AS pos FROM documents"
        ),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "COUNT(*) AS n FROM lineitem GROUP BY 1, 2"
        ),
        "supplier_nation_rollup": (
            "SELECT n_name, r_name, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "COUNT(*) AS n FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY n_name, r_name"
        ),
        "length_outliers": (
            # exact cross-multiplied z-test: (n*x-S)^2 > 9*(n*S2-S^2)
            "WITH st AS (SELECT source, COUNT(*) AS n, SUM(n_tok) AS s, "
            f"SUM(CAST(n_tok AS BIGINT) * n_tok) AS s2 FROM {corpus} "
            "GROUP BY source) "
            "SELECT c.doc_id, c.source, CAST(c.n_tok AS BIGINT) AS n_tok, "
            "(st.n * c.n_tok - st.s) * (st.n * c.n_tok - st.s) > "
            "9 * (st.n * st.s2 - st.s * st.s) AS is_outlier "
            f"FROM {corpus} c JOIN st USING (source)"
        ),
        "retention_cohorts": (
            # week = epoch_us // week_us; cohort = per-user min week
            "WITH uw AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS week FROM events), "
            "c AS (SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY user_id) "
            "SELECT c.cohort AS cohort_week, uw.week - c.cohort AS week_offset, "
            "COUNT(*) AS n_users FROM uw JOIN c ON uw.user_id = c.user_id "
            "GROUP BY 1, 2"
        ),
        "funnel_stages": (
            # t_k = MIN ts of step k at/after t_{k-1}; stage = #steps hit
            "WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e, s1 "
            "WHERE e.user_id = s1.user_id AND e.event_type = 'click' "
            "AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 72 HOUR GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e, s2 "
            "WHERE e.user_id = s2.user_id AND e.event_type = 'purchase' "
            "AND e.ts >= s2.t2 AND e.ts <= s2.t2 + INTERVAL 72 HOUR GROUP BY e.user_id), "
            "u AS (SELECT DISTINCT user_id FROM events) "
            "SELECT u.user_id, "
            "CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 "
            "WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage, "
            "CAST(epoch_us(t1) AS BIGINT) AS t1_us, "
            "CAST(epoch_us(t2) AS BIGINT) AS t2_us, "
            "CAST(epoch_us(t3) AS BIGINT) AS t3_us "
            "FROM u LEFT JOIN s1 USING(user_id) LEFT JOIN s2 USING(user_id) "
            "LEFT JOIN s3 USING(user_id)"
        ),
        "customer_orders_left": (
            "SELECT c_custkey, o_orderkey FROM customer "
            "LEFT JOIN orders ON o_custkey = c_custkey"
        ),
        "customer_orders_full": (
            "WITH c AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0), "
            "o AS (SELECT o_custkey, o_orderkey FROM orders "
            "WHERE o_totalprice > 350000) "
            "SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey, "
            "o.o_orderkey FROM c FULL JOIN o ON c.c_custkey = o.o_custkey"
        ),
        "order_priority_rollup": (
            "SELECT o_orderpriority, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "COUNT(*) AS n FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "bm25_topk": _bm25_oracle(),
        "hll_registers": _hll_oracle(),
        "cm_registers": _cm_oracle(),
        "normalize_text": (
            "WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace("
            "lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'), ' ') "
            "AS norm_text FROM documents) "
            "SELECT doc_id, norm_text, CASE WHEN norm_text = '' THEN 0 ELSE "
            "CAST(len(string_split(norm_text, ' ')) AS BIGINT) END AS n_words "
            "FROM n"
        ),
        "mix_corpus": (
            "WITH tot AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total "
            "FROM documents GROUP BY source) "
            "SELECT d.doc_id, d.source, d.n_chars AS weight "
            "FROM documents d JOIN tot USING (source) "
            f"WHERE CASE WHEN tot.total <= {_MIX_TARGET} THEN TRUE "
            f"ELSE hash(d.doc_id) < CAST(({_MIX_TARGET}::HUGEINT * "
            "18446744073709551616::HUGEINT) // tot.total AS UBIGINT) END"
        ),
        "moving_sums": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cents, "
            "CAST(LEAST(ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id), 4) AS BIGINT) AS win_n "
            "FROM events"
        ),
        "orders_rollup": (
            "WITH q AS (SELECT o_orderstatus, o_orderpriority, "
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders) "
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n "
            "FROM q GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
        ),
        "tumbling_distinct": (
            "SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY window_start"
        ),
        "value_histogram": (
            "SELECT event_type, CAST(FLOOR(value / 5) AS BIGINT) AS bin, "
            "COUNT(*) AS n FROM events GROUP BY event_type, bin"
        ),
        "lineitem_moments": (
            "WITH q AS (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity) AS BIGINT) AS x, "
            "CAST(ROUND(l_discount * 100) AS BIGINT) AS y FROM lineitem) "
            "SELECT l_returnflag, COUNT(*) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y, "
            "CAST(SUM(x*y) AS BIGINT) AS sum_xy, "
            "CAST(SUM(x*x) AS BIGINT) AS sum_x2, "
            "CAST(SUM(y*y) AS BIGINT) AS sum_y2 "
            "FROM q GROUP BY l_returnflag"
        ),
        "orders_cube": (
            "WITH q AS (SELECT o_orderstatus, o_orderpriority, "
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders) "
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n "
            "FROM q GROUP BY CUBE (o_orderstatus, o_orderpriority)"
        ),
        "weighted_sample": (
            "SELECT doc_id, n_chars AS weight FROM documents "
            f"WHERE hash(doc_id) < CAST(least(n_chars, {_WSAMPLE_CAP}) AS UBIGINT)"
            f" * (18446744073709551615::UBIGINT // {_WSAMPLE_CAP})"
        ),
        "ngram_span_dedup": _span_dedup_oracle(),
        "event_deltas": (
            "SELECT event_id, user_id, LAG(event_id) OVER w AS prev_event_id, "
            "CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS BIGINT) AS gap_us "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "event_type_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"COUNT(*) FILTER (WHERE event_type = '{c}') AS {c}"
                for c in _PIVOT_CATS
            )
            + " FROM events GROUP BY user_id"
        ),
        "pivot_unpivot": (
            # explicit zero rows for absent (user, type) combos: the
            # wide matrix is dense, so the long form must be too
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "c AS (SELECT UNNEST("
            + "["
            + ", ".join(f"'{c}'" for c in _PIVOT_CATS)
            + "]) AS event_type), "
            "n AS (SELECT user_id, event_type, COUNT(*) AS n FROM events "
            "GROUP BY user_id, event_type) "
            "SELECT u.user_id, c.event_type, "
            "CAST(COALESCE(n.n, 0) AS BIGINT) AS n "
            "FROM u CROSS JOIN c LEFT JOIN n USING (user_id, event_type)"
        ),
        "fuzzy_name_pairs": (
            # DuckDB's native levenshtein over the length-banded
            # distinct self-join IS the semantics; the engine never
            # forms this product (deletion-neighborhood candidates)
            "WITH v AS (SELECT DISTINCT c_name FROM customer) "
            "SELECT a.c_name AS c_name_a, b.c_name AS c_name_b "
            "FROM v a JOIN v b ON a.c_name < b.c_name "
            "AND abs(length(a.c_name) - length(b.c_name)) <= 1 "
            "AND levenshtein(a.c_name, b.c_name) <= 1"
        ),
        "inverted_index_stats": (
            # the index is built from DISTINCT (term, doc_id) pairs;
            # doc_id_sum proves each decoded postings list holds
            # exactly the right id set (SUM over BIGINT -> HUGEINT,
            # hence the CAST — the running_totals dtype lesson)
            "WITH w AS (SELECT DISTINCT doc_id, "
            "unnest(string_split(text, ' ')) AS word FROM documents) "
            "SELECT word AS term, COUNT(*) AS df, "
            "CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum FROM w GROUP BY word"
        ),
        "postings_and_query": (
            "WITH w AS (SELECT DISTINCT doc_id, "
            "unnest(string_split(text, ' ')) AS word FROM documents) "
            "SELECT doc_id FROM w WHERE word IN ("
            + ", ".join(f"'{t}'" for t in sorted(set(_INVINDEX_TERMS)))
            + f") GROUP BY doc_id HAVING COUNT(*) = {len(set(_INVINDEX_TERMS))}"
        ),
        "orders_semi_lineitem": (
            "SELECT o_orderkey, o_orderpriority FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o.o_orderkey AND l_quantity >= 45)"
        ),
        "customers_no_big_orders": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c.c_custkey AND o_totalprice >= 350000)"
        ),
        "asof_join": (
            # DuckDB's native ASOF JOIN is the oracle for the per-user
            # latest-prior-event match (ties impossible: (user_id, ts)
            # is unique in the testdata, asserted by the engine test)
            "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT * FROM events WHERE event_type = 'click') "
            "SELECT p.event_id, c.event_id AS match_event_id, "
            "CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us "
            "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
        ),
        "range_join": (
            "WITH bands(band_id, lo, hi) AS (VALUES "
            + ", ".join(
                f"(CAST({b} AS BIGINT), {lo}, {hi})" for b, lo, hi in _RATE_BANDS
            )
            + ") SELECT e.event_id, b.band_id FROM events e "
            "JOIN bands b ON e.value >= b.lo AND e.value < b.hi"
        ),
        "kmv_distinct": _kmv_oracle(16),
        "kmv_distinct_exact": _kmv_oracle(1 << 16),
        "top_quality_docs": (
            "WITH s AS (SELECT doc_id, "
            "CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents) "
            "SELECT doc_id, LEAST(GREATEST((100*n_distinct)//GREATEST(n_words,1) + "
            "(100*n_stop_en)//GREATEST(n_words,1), 0), 200) AS quality "
            "FROM s ORDER BY quality DESC, doc_id LIMIT 100"
        ),
        "pack_sequences": (
            "WITH o AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, "
            "CAST(COALESCE(SUM(CAST(n_tok AS BIGINT)) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off "
            f"FROM {corpus}) "
            'SELECT doc_id, off AS "offset", '
            "CAST(off // 4096 AS BIGINT) AS seq_first, "
            "CAST(GREATEST(off + n_tok - 1, off) // 4096 AS BIGINT) AS seq_last "
            "FROM o"
        ),
        "ntok_percentiles": (
            "SELECT source, "
            "CAST(quantile_disc(n_tok, 0.5) AS BIGINT) AS p50, "
            "CAST(quantile_disc(n_tok, 0.95) AS BIGINT) AS p95, "
            "CAST(quantile_disc(n_tok, 0.99) AS BIGINT) AS p99 "
            f"FROM {corpus} GROUP BY source"
        ),
        "corpus_split": (
            "SELECT doc_id, CASE WHEN "
            "hash(doc_id) % 100 < 10 "
            "THEN 'val' ELSE 'train' END AS split FROM documents"
        ),
        "curate": (
            "WITH q AS (SELECT doc_id, text, "
            "CAST(len(string_split(text,' ')) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct, "
            f"CAST(len(list_filter(string_split(text,' '), w -> w IN {stop})) AS BIGINT)"
            " AS n_stop_en FROM documents), "
            "sc AS (SELECT doc_id, text, "
            "LEAST(GREATEST((100*n_distinct)//GREATEST(n_words,1) + "
            "(100*n_stop_en)//GREATEST(n_words,1), 0), 200) AS quality FROM q), "
            f"l AS (SELECT doc_id, {counts} FROM documents), "
            "lp AS (SELECT doc_id, CASE "
            f"WHEN c_de = {greatest} THEN 'de' "
            f"WHEN c_en = {greatest} THEN 'en' "
            f"WHEN c_es = {greatest} THEN 'es' "
            f"WHEN c_fr = {greatest} THEN 'fr' "
            "ELSE 'zh' END AS pred_lang FROM l), "
            "f AS (SELECT sc.doc_id, sc.text, sc.quality, lp.pred_lang "
            "FROM sc JOIN lp USING (doc_id) "
            "WHERE sc.quality >= 60 AND lp.pred_lang IN ('en')) "
            "SELECT f.doc_id, f.quality, f.pred_lang FROM f "
            "JOIN (SELECT text, MIN(doc_id) AS doc_id FROM f GROUP BY text) w "
            "ON f.doc_id = w.doc_id"
        ),
        "running_totals": (
            # integer-cents running sum so the cumulative aggregate is
            # associative-exact (bit-equal under DuckDB's segment-tree
            # window association and our sequential np.cumsum); the
            # outer CAST matters: DuckDB SUM(BIGINT) returns HUGEINT
            # (arrow decimal128), which value-equals our int64 but
            # hash-mismatches the driver's dtype-sensitive compare
            "SELECT event_id, user_id, "
            "ROW_NUMBER() OVER w AS rn, "
            "CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT) "
            "AS cum_cents "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)"
        ),
        "top_n_per_group": (
            "SELECT source, doc_id, n_chars, rnk FROM ("
            "SELECT source, doc_id, n_chars, "
            "ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id) AS rnk FROM documents) "
            "WHERE rnk <= 3"
        ),
        "distinctive_terms": (
            # integer-exact tf-idf surrogate: rank by (tf DESC, df ASC,
            # word) — identical order to log-idf scoring for fixed tf,
            # with no float in the compare
            "WITH w AS (SELECT source, UNNEST(string_split(text, ' ')) AS word "
            "FROM documents), "
            "tf AS (SELECT source, word, COUNT(*) AS tf FROM w "
            "GROUP BY source, word), "
            "d AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word) "
            "SELECT source, word, tf, df, rnk FROM ("
            "SELECT tf.source, tf.word, tf.tf, d.df, "
            "ROW_NUMBER() OVER (PARTITION BY tf.source "
            "ORDER BY tf.tf DESC, d.df, tf.word) AS rnk "
            "FROM tf JOIN d USING (word)) WHERE rnk <= 10"
        ),
        "events_window": (
            "SELECT event_type, "
            "CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start, "
            "COUNT(*) AS n FROM events GROUP BY 1, 2"
        ),
        "hopping_window": (
            # each event covered by width/hop = 2 hop-aligned windows
            "SELECT event_type, "
            "CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) "
            "- 3600 * k AS window_start, COUNT(*) AS n "
            "FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) "
            "GROUP BY 1, 2"
        ),
        "session_windows": (
            "WITH d AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER w IS NULL "
            "OR ts - LAG(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM d) "
            "SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, sid"
        ),
        "embedding_near_dups": (
            "WITH aug AS (SELECT vec_id, embedding FROM embeddings UNION ALL "
            "SELECT vec_id + 10000000 AS vec_id, "
            "list_transform(embedding, x -> x * 1.001) AS embedding "
            "FROM embeddings WHERE vec_id % 50 = 0) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM aug a, aug b "
            "WHERE a.vec_id < b.vec_id "
            "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.98"
        ),
        "embedding_quantize": (
            # same double arithmetic as the engine: CAST to DOUBLE,
            # scale=(mx-mn)/255 first, floor(q+0.5), clip — bit-identical
            "WITH dims AS (SELECT CAST(d AS BIGINT) AS d FROM range(1, 65) t(d)), "
            "s AS (SELECT dims.d AS d, "
            "MIN(CAST(embedding[dims.d] AS DOUBLE)) AS mn, "
            "MAX(CAST(embedding[dims.d] AS DOUBLE)) AS mx "
            "FROM embeddings, dims GROUP BY dims.d), "
            "c AS (SELECT e.vec_id, s.d, "
            "CASE WHEN s.mx > s.mn THEN "
            "LEAST(255, GREATEST(0, CAST(FLOOR("
            "(CAST(e.embedding[s.d] AS DOUBLE) - s.mn) / "
            "((s.mx - s.mn) / 255.0) + 0.5) AS BIGINT))) "
            "ELSE 0 END AS code FROM embeddings e, s) "
            "SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum, "
            "CAST(SUM(d * code) AS BIGINT) AS code_wsum FROM c GROUP BY vec_id"
        ),
        "consistent_sample": (
            "SELECT doc_id FROM documents "
            "ORDER BY hash(doc_id), doc_id LIMIT 100"
        ),
        "fuzzy_decontaminate": (
            # threshold 1.0 cross-corpus match == identical distinct
            # word-3-shingle sets between a train doc and any eval doc
            "WITH d AS (SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0), "
            "w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM d), "
            "s AS (SELECT doc_id, list_sort(list_distinct("
            "CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)) AS sh FROM w), "
            "ev AS (SELECT DISTINCT sh FROM s "
            "WHERE doc_id % 17 = 0 AND doc_id < 1000000), "
            "tr AS (SELECT doc_id, sh FROM s "
            "WHERE NOT (doc_id % 17 = 0 AND doc_id < 1000000)) "
            "SELECT tr.doc_id, "
            "NOT EXISTS(SELECT 1 FROM ev WHERE ev.sh = tr.sh) AS keep FROM tr"
        ),
        "kmeans_codes": (
            # same integer protocol as the engine: init = codes of the 8
            # smallest vec_ids, argmin ties to the lowest cluster,
            # centroid update = floor-division of integer sums
            "WITH dims AS (SELECT CAST(d AS BIGINT) AS d FROM range(1, 65) t(d)), "
            "s AS (SELECT dims.d AS d, "
            "MIN(CAST(embedding[dims.d] AS DOUBLE)) AS mn, "
            "MAX(CAST(embedding[dims.d] AS DOUBLE)) AS mx "
            "FROM embeddings, dims GROUP BY dims.d), "
            "c AS (SELECT e.vec_id, s.d, "
            "CASE WHEN s.mx > s.mn THEN "
            "LEAST(255, GREATEST(0, CAST(FLOOR("
            "(CAST(e.embedding[s.d] AS DOUBLE) - s.mn) / "
            "((s.mx - s.mn) / 255.0) + 0.5) AS BIGINT))) "
            "ELSE 0 END AS code FROM embeddings e, s), "
            "init AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl "
            "FROM (SELECT DISTINCT vec_id FROM c ORDER BY vec_id LIMIT 8)), "
            "cent0 AS (SELECT i.cl, c.d, c.code AS v FROM init i "
            "JOIN c ON c.vec_id = i.vec_id), "
            "d1 AS (SELECT c.vec_id, ct.cl, "
            "SUM((c.code - ct.v) * (c.code - ct.v)) AS dist "
            "FROM c JOIN cent0 ct ON ct.d = c.d GROUP BY c.vec_id, ct.cl), "
            "a1 AS (SELECT vec_id, cl FROM (SELECT vec_id, cl, "
            "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn "
            "FROM d1) WHERE rn = 1), "
            "cent1 AS (SELECT a1.cl, c.d, "
            "CAST(SUM(c.code) // COUNT(DISTINCT c.vec_id) AS BIGINT) AS v "
            "FROM a1 JOIN c ON c.vec_id = a1.vec_id GROUP BY a1.cl, c.d), "
            "d2 AS (SELECT c.vec_id, ct.cl, "
            "SUM((c.code - ct.v) * (c.code - ct.v)) AS dist "
            "FROM c JOIN cent1 ct ON ct.d = c.d GROUP BY c.vec_id, ct.cl) "
            "SELECT vec_id, CAST(cl AS BIGINT) AS cluster, "
            "CAST(dist AS BIGINT) AS dist FROM (SELECT vec_id, cl, dist, "
            "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn "
            "FROM d2) WHERE rn = 1"
        ),
        "minhash_recall": (
            # exact sibling = identical distinct word-3-shingle sets over
            # the corpus + planted exact copies (doc_id % 7 -> +1000000);
            # every such pair is found by the 0.7 approximate path by
            # construction, so n_found = n_exact and n_missed = 0
            "WITH d AS (SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0), "
            "w AS (SELECT doc_id, text, string_split(text, ' ') AS ws "
            "FROM d), "
            "s AS (SELECT doc_id, list_sort(list_distinct("
            "CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)) AS sh FROM w), "
            "p AS (SELECT COUNT(*) AS n FROM s a JOIN s b "
            "ON a.sh = b.sh AND a.doc_id < b.doc_id) "
            "SELECT CAST(n AS BIGINT) AS n_exact, CAST(n AS BIGINT) AS n_found, "
            "CAST(0 AS BIGINT) AS n_missed FROM p"
        ),
        "simhash_recall": (
            # exact sibling = identical distinct word sets; hamming 0
            # <= 6 so the approximate path finds every exact pair
            "WITH s AS (SELECT doc_id, "
            "list_sort(list_distinct(string_split(text, ' '))) AS ws "
            "FROM documents), "
            "p AS (SELECT COUNT(*) AS n FROM s a JOIN s b "
            "ON a.ws = b.ws AND a.doc_id < b.doc_id) "
            "SELECT CAST(n AS BIGINT) AS n_exact, CAST(n AS BIGINT) AS n_found, "
            "CAST(0 AS BIGINT) AS n_missed FROM p"
        ),
        "minhash_exact_clusters": (
            "WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws "
            "FROM documents), "
            "s AS (SELECT doc_id, list_sort(list_distinct("
            "CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)) AS sh FROM w) "
            "SELECT a.doc_id, m.cid AS cluster_id FROM s a "
            "JOIN (SELECT sh, MIN(doc_id) AS cid FROM s GROUP BY sh) m "
            "ON a.sh = m.sh"
        ),
        "minhash_cc_clusters": (
            # identical to minhash_exact_clusters: shingle-set equality
            # is an equivalence relation, so transitive closure over the
            # exact pair set reproduces the same-set clusters — the CC
            # path must land bit-identical to the union-find sibling
            "WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws "
            "FROM documents), "
            "s AS (SELECT doc_id, list_sort(list_distinct("
            "CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)) AS sh FROM w) "
            "SELECT a.doc_id, m.cid AS cluster_id FROM s a "
            "JOIN (SELECT sh, MIN(doc_id) AS cid FROM s GROUP BY sh) m "
            "ON a.sh = m.sh"
        ),
        "minhash_lean_clusters": (
            # identical to minhash_exact_clusters: the lean exchange
            # must land bit-identical to the carry-path siblings
            "WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws "
            "FROM documents), "
            "s AS (SELECT doc_id, list_sort(list_distinct("
            "CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)) AS sh FROM w) "
            "SELECT a.doc_id, m.cid AS cluster_id FROM s a "
            "JOIN (SELECT sh, MIN(doc_id) AS cid FROM s GROUP BY sh) m "
            "ON a.sh = m.sh"
        ),
        "connected_components": (
            # min-label transitive closure over the deterministic
            # chain+skip graph (same edge expressions as chain_edges)
            "WITH RECURSIVE "
            "e0 AS (SELECT doc_id AS u, doc_id + 1 AS v FROM documents "
            "WHERE doc_id % 8 < 5 "
            "UNION ALL "
            "SELECT doc_id AS u, doc_id + 16 AS v FROM documents "
            "WHERE doc_id % 64 = 0), "
            "e AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0), "
            "n AS (SELECT DISTINCT u AS node FROM e), "
            "r AS (SELECT node, node AS lab FROM n "
            "UNION "
            "SELECT e.u AS node, r.lab FROM e JOIN r ON r.node = e.v) "
            "SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id "
            "FROM r GROUP BY node"
        ),
        "pagerank": _pagerank_oracle(),
        "hop_distance": (
            # min-hop BFS over the DIRECTED chain+skip DAG from seeds
            # 0 and 128; UNION dedups (node, hops) pairs and the DAG
            # bounds recursion depth
            "WITH RECURSIVE "
            "e AS (SELECT doc_id AS src, doc_id + 1 AS dst FROM documents "
            "WHERE doc_id % 8 < 5 "
            "UNION ALL SELECT doc_id, doc_id + 16 FROM documents "
            "WHERE doc_id % 64 = 0), "
            "r AS (SELECT CAST(node AS BIGINT) AS node, 0 AS hops FROM "
            "(SELECT unnest([0, 128]) AS node) "
            "UNION "
            "SELECT e.dst AS node, r.hops + 1 AS hops FROM e "
            "JOIN r ON e.src = r.node) "
            "SELECT node, CAST(MIN(hops) AS BIGINT) AS hops "
            "FROM r GROUP BY node"
        ),
        "props_rollup": (
            "WITH x AS (SELECT event_type, "
            "TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') "
            "AS BIGINT) AS k FROM events) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(k) AS BIGINT) AS n_present, "
            "CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_val, "
            "MAX(k) AS max_val FROM x GROUP BY event_type"
        ),
        "profile_documents": _profile_oracle(),
        "bpe_train": _bpe_oracle(),
        "bpe_tokenize": _bpe_apply_oracle(),
        "lm_score": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
            "FROM documents), "
            "p AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i "
            "FROM w WHERE len(ws) >= 2), "
            "g AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM p), "
            "c1 AS (SELECT w1, COUNT(*) AS c FROM g GROUP BY w1), "
            "c2 AS (SELECT w1, w2, COUNT(*) AS c FROM g GROUP BY w1, w2) "
            "SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
            "CAST(SUM(1000000 * c2.c // c1.c) AS BIGINT) AS lm_score "
            "FROM g JOIN c2 ON g.w1 = c2.w1 AND g.w2 = c2.w2 "
            "JOIN c1 ON g.w1 = c1.w1 GROUP BY g.doc_id"
        ),
        "orders_customers_right": (
            # the engine's join key column is real on unmatched right
            # rows (taken from the right side), so COALESCE mirrors it
            "SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, "
            "o.o_orderkey, c.c_name "
            "FROM orders o RIGHT JOIN customer c "
            "ON o.o_custkey = c.c_custkey"
        ),
        "cap_per_source": (
            f"SELECT source, doc_id FROM (SELECT source, doc_id, "
            "ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY hash(doc_id), doc_id) AS rk FROM documents) "
            f"WHERE rk <= {_CAP_N}"
        ),
        "monthly_orders": (
            "SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year, "
            "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS month, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_cents FROM orders GROUP BY year, month"
        ),
        "time_of_week": (
            "SELECT CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY dow, hour"
        ),
        "user_value_mad": (
            "WITH e AS (SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) "
            "AS cents FROM events), "
            "m AS (SELECT user_id, quantile_disc(cents, 0.5) AS med "
            "FROM e GROUP BY user_id) "
            "SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "m.med AS median, "
            "quantile_disc(ABS(e.cents - m.med), 0.5) AS mad "
            "FROM e JOIN m ON e.user_id = m.user_id GROUP BY e.user_id, m.med"
        ),
        "user_event_mode": (
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt "
            "FROM events GROUP BY user_id, event_type), "
            "r AS (SELECT user_id, event_type, cnt, ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rk FROM c) "
            "SELECT user_id, event_type AS mode_val, CAST(cnt AS BIGINT) AS cnt "
            "FROM r WHERE rk = 1"
        ),
        "user_event_paths": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "string_agg(event_type, ',' ORDER BY ts, event_id) AS concat "
            "FROM events GROUP BY user_id"
        ),
        "user_value_quantiles": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.25) AS q25, "
            "quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.5) AS q50, "
            "quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.9) AS q90 "
            "FROM events GROUP BY user_id"
        ),
        "order_window_events": (
            "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us "
            "FROM events), "
            "iv AS (SELECT o_custkey % 150 AS ukey, o_orderkey, "
            f"{_EPOCH_2024_US} + (o_orderkey % 720) * {_HOUR_US} AS lo_us "
            "FROM orders), "
            "iv2 AS (SELECT ukey, o_orderkey, lo_us, "
            f"lo_us + ((o_orderkey % 3) + 1) * {_HOUR_US} AS hi_us FROM iv) "
            "SELECT p.user_id, p.event_id, iv2.o_orderkey "
            "FROM p JOIN iv2 ON p.user_id = iv2.ukey "
            "AND iv2.lo_us <= p.ts_us AND p.ts_us < iv2.hi_us"
        ),
        "simhash_exact_pairs": (
            "WITH s AS (SELECT doc_id, "
            "list_sort(list_distinct(string_split(text, ' '))) AS ws "
            "FROM documents) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM s a JOIN s b "
            "ON a.ws = b.ws AND a.doc_id < b.doc_id"
        ),
        "ngram_jaccard": (
            "WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws "
            "FROM documents), "
            "s AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS sh FROM w) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_shared, "
            "CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT)"
            " AS n_union "
            "FROM s a, s b WHERE a.doc_id < b.doc_id "
            "AND 5 * len(list_intersect(a.sh, b.sh)) >= "
            "4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
        ),
        "stratified_sample": (
            "SELECT doc_id, source FROM documents "
            "WHERE hash(doc_id) % 10000 < CASE source "
            "WHEN 'src1' THEN 5000 WHEN 'src2' THEN 0 ELSE 1000 END"
        ),
        "decontaminate": (
            "WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws "
            "FROM documents), "
            "s AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [text] "
            "ELSE list_transform(range(1, len(ws) - 1), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS sh FROM w), "
            # COALESCE: an empty eval set must behave as the empty shingle
            # union (n_hits=0, keep=true), matching the engine (ADVICE r3)
            "ev AS (SELECT COALESCE(list_distinct(flatten(list(sh))), []) "
            "AS esh FROM s WHERE doc_id % 97 = 0) "
            "SELECT s.doc_id, "
            "CAST(len(list_intersect(s.sh, ev.esh)) AS BIGINT) AS n_hits, "
            "len(list_intersect(s.sh, ev.esh)) < 1 AS keep "
            "FROM s, ev WHERE s.doc_id % 97 <> 0"
        ),
        "blocklist_filter": (
            # anti-join on the content fingerprint: survivors of the
            # planted corpus whose md5 fingerprint is not blocklisted
            "WITH d AS (SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 1000000 AS doc_id, text FROM documents "
            "WHERE doc_id % 7 = 0), "
            "b AS (SELECT DISTINCT md5_number_upper(text) & 9223372036854775807 "
            "AS fp FROM documents WHERE doc_id % 13 = 0) "
            "SELECT d.doc_id FROM d WHERE "
            "(md5_number_upper(d.text) & 9223372036854775807) "
            "NOT IN (SELECT fp FROM b)"
        ),
        "token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            f"'{_TOKEN_REGEX}')) AS BIGINT) AS n_tokens FROM documents"
        ),
        "winnow_fingerprints": (
            # same gram hash (md5_number_upper & mask), same clamped
            # sliding-window MIN (prefix minima in the head), same mod
            "WITH pos AS (SELECT CAST(i AS BIGINT) AS i FROM range(1, 1024) t(i)), "
            "g AS (SELECT d.doc_id, pos.i, "
            "CAST(md5_number_upper(substring(d.text, CAST(pos.i AS INTEGER), 8)) "
            "& 9223372036854775807 AS BIGINT) AS h "
            "FROM documents d, pos WHERE pos.i <= len(d.text) - 7), "
            "wm AS (SELECT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY i "
            "ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS fp FROM g), "
            "sel AS (SELECT DISTINCT doc_id, fp FROM wm) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp, "
            "CAST(SUM(fp) % 2305843009213693951 AS BIGINT) AS fp_sum "
            "FROM sel GROUP BY doc_id"
        ),
        "fingerprint": (
            "SELECT doc_id, CAST(md5_number_upper(text) & 9223372036854775807 "
            "AS BIGINT) AS fingerprint FROM documents"
        ),
        "tokens_roundtrip": tokens_summary_sql,
        # append path must reproduce the identical full-corpus summary
        "append_roundtrip": tokens_summary_sql,
        "decode_generation": (
            # the even half alone: as-of generation 0 must exclude every
            # appended (odd) row
            "SELECT source, COUNT(*) AS n_docs, "
            "CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
            # COALESCE: a group whose surviving docs are ALL zero-token
            # sums only NULL list_sums (the full-corpus oracle never
            # hits this; the even-half 'empty' group does)
            "CAST(COALESCE(SUM(list_sum(list_transform(tokens, "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i))), 0) AS BIGINT) AS checksum "
            f"FROM {corpus} "
            "WHERE NOT (doc_id LIKE '%1' OR doc_id LIKE '%3' OR doc_id LIKE '%5' "
            "OR doc_id LIKE '%7' OR doc_id LIKE '%9') GROUP BY source"
        ),
        "split_windows": (
            "SELECT doc_id, t.d AS win_idx, t.d * 384 AS win_start, "
            "LEAST(512, n_tok - t.d * 384) AS win_len, "
            "CAST(COALESCE(list_sum(list_transform("
            "tokens[t.d * 384 + 1 : t.d * 384 + LEAST(512, n_tok - t.d * 384)], "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i)), 0) AS BIGINT) "
            "AS win_checksum "
            f"FROM {corpus}, "
            "(SELECT CAST(t0.d AS BIGINT) AS d FROM range(0, 4096) t0(d)) t "
            "WHERE n_tok > 0 AND t.d * 384 < n_tok"
        ),
        "decode_point_lookup": (
            "SELECT doc_id, n_tok, "
            "CAST(COALESCE(list_sum(list_transform(tokens, "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i)), 0) AS BIGINT) AS checksum "
            f"FROM {corpus} WHERE doc_id LIKE '%00'"
        ),
        "upsert_roundtrip": (
            # n_tok as INTEGER, not BIGINT: the engine decodes int32
            # (corpus schema) and the driver value-hash is
            # dtype-sensitive — same class of red as running_totals r4
            "WITH m AS (SELECT doc_id, CASE WHEN doc_id LIKE '%3' "
            "THEN list_append(tokens, 0) ELSE tokens END AS tokens "
            f"FROM {corpus}) "
            "SELECT doc_id, CAST(len(tokens) AS INTEGER) AS n_tok, "
            "CAST(COALESCE(list_sum(list_transform(tokens, "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i)), 0) AS BIGINT) AS checksum "
            "FROM m"
        ),
        "delete_roundtrip": (
            "SELECT doc_id, n_tok, "
            "CAST(COALESCE(list_sum(list_transform(tokens, "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i)), 0) AS BIGINT) AS checksum "
            f"FROM {corpus} WHERE doc_id NOT LIKE '%7'"
        ),
        "decode_source": (
            "SELECT doc_id, n_tok, "
            "CAST(COALESCE(list_sum(list_transform(tokens, "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i)), 0) AS BIGINT) AS checksum "
            f"FROM {corpus} WHERE source = 'english'"
        ),
        "decode_ntok_range": (
            "SELECT doc_id, n_tok, "
            "CAST(COALESCE(list_sum(list_transform(tokens, "
            "(x, i) -> (CAST(x AS BIGINT) + 1) * i)), 0) AS BIGINT) AS checksum "
            f"FROM {corpus} WHERE n_tok BETWEEN {_NTOK_RANGE_LO} AND {_NTOK_RANGE_HI}"
        ),
        "encode_metrics": (
            "SELECT source, GREATEST(1, (CAST(SUM(n_tok) AS BIGINT) + "
            f"{_METRICS_BUCKET_TOKENS - 1}) // {_METRICS_BUCKET_TOKENS}) AS n_parts, "
            "COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens "
            f"FROM {corpus} GROUP BY source"
        ),
        "token_histogram": (
            f"SELECT token, n FROM (SELECT token, COUNT(*) AS n FROM "
            f"(SELECT unnest(tokens)::BIGINT AS token FROM {corpus}) "
            f"GROUP BY token ORDER BY n DESC, token LIMIT 100)"
        ),
        "explode_tokens": (
            "SELECT doc_id, CAST(generate_subscripts(tokens, 1) - 1 AS BIGINT)"
            f" AS pos, unnest(tokens) AS token FROM {corpus}"
        ),
        "bigram_histogram": (
            "WITH e AS (SELECT doc_id, "
            "CAST(generate_subscripts(tokens, 1) - 1 AS BIGINT) AS pos, "
            f"unnest(tokens)::BIGINT AS tok FROM {corpus}) "
            "SELECT token, next_token, n FROM ("
            "SELECT a.tok AS token, b.tok AS next_token, COUNT(*) AS n "
            "FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            "GROUP BY 1, 2 ORDER BY n DESC, token, next_token LIMIT 100)"
        ),
        "heavy_hitters": (
            f"SELECT token, cnt FROM (SELECT token, COUNT(*) AS cnt FROM "
            f"(SELECT unnest(tokens)::BIGINT AS token FROM {corpus}) "
            f"GROUP BY token ORDER BY cnt DESC, token LIMIT 20)"
        ),
        "media_features": (
            "SELECT doc_id AS media_id, "
            "CASE WHEN doc_id % 3 = 0 THEN 'audio/fake' ELSE 'image/fake' END "
            "AS media_type, "
            "CAST((doc_id * 7) % 496 + 16 AS INT) AS width, "
            "CAST((doc_id * 13) % 496 + 16 AS INT) AS height, "
            "8 + octet_length(encode(text)) AS n_bytes FROM documents"
        ),
        "frame_sample": (
            "WITH f AS (SELECT doc_id, "
            "octet_length(encode(text)) // 256 AS n_frames FROM documents) "
            "SELECT doc_id AS media_id, "
            "CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame_no, "
            "CAST(n_frames AS INT) AS n_frames FROM f"
        ),
        "ann_topk": (
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id) AS rank "
            "FROM embeddings q, embeddings b "
            "WHERE q.vec_id < 10 AND b.vec_id != q.vec_id) WHERE rank <= 5"
        ),
        "ann_lsh_topk": (
            "WITH aug AS (SELECT vec_id, embedding FROM embeddings UNION ALL "
            "SELECT vec_id + 10000000 AS vec_id, "
            "list_transform(embedding, x -> x * 1.001) AS embedding "
            "FROM embeddings WHERE vec_id % 50 = 0) "
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id) AS rank "
            "FROM aug q, aug b "
            "WHERE q.vec_id % 50 = 0 AND q.vec_id < 500 AND b.vec_id != q.vec_id) "
            "WHERE rank = 1"
        ),
        "ann_ivf_topk": (
            "WITH aug AS (SELECT vec_id, embedding FROM embeddings UNION ALL "
            "SELECT vec_id + 10000000 AS vec_id, "
            "list_transform(embedding, x -> x * 1.001) AS embedding "
            "FROM embeddings WHERE vec_id % 50 = 0) "
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id) AS rank "
            "FROM aug q, aug b "
            "WHERE q.vec_id % 50 = 0 AND q.vec_id < 500 AND b.vec_id != q.vec_id) "
            "WHERE rank = 1"
        ),
        "ann_lsh_exhaustive": (
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id) AS rank "
            "FROM embeddings q, embeddings b "
            "WHERE q.vec_id < 10 AND b.vec_id != q.vec_id) WHERE rank <= 5"
        ),
        "ann_ivf_disk": (
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id) AS rank "
            "FROM embeddings q, embeddings b "
            "WHERE q.vec_id < 10 AND b.vec_id != q.vec_id) WHERE rank <= 5"
        ),
        # exhaustive IVF == exact top-k: same oracle as ann_topk
        "ann_ivf_exhaustive": (
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id) AS rank "
            "FROM embeddings q, embeddings b "
            "WHERE q.vec_id < 10 AND b.vec_id != q.vec_id) WHERE rank <= 5"
        ),
    }
