"""Postings-list inverted index: build, stats, boolean AND query.

The artifact that ties the search family (search.py BM25) to the codec
family (codecs/simple.py): a term -> sorted-doc-id postings index whose
doc-id lists are DELTA + STREAM-VBYTE compressed with the engine's own
`VByteCodec` (codec id 8), written as one parquet file per term-hash
bucket so queries prune whole files by term.

Reference scope note: the reference crate (spiraldb/fsst) compresses
strings, not postings; this operator comes from the training-data /
retrieval half of the task brief. The postings layout (deltas of a
sorted id list, vbyte bytes) is the classic public IR design (see
Lemire & Boytsov, "Decoding billions of integers per second through
vectorization" — the same paper the VByteCodec cites).

Build shape (scale audit):
  1. **pair pass** (map-side): per batch, DISTINCT (term, doc_id)
     pairs via one dictionary_encode + packed-int64 np.unique — no row
     loop. The exchange moves deduped (term, doc_id) pairs; everything
     downstream is vocabulary x df sized, never corpus-text sized.
  2. **bucket groupby**: terms are md5-parity hash-bucketed into
     `n_buckets` groups, so map_groups dispatch is BOUNDED by
     n_buckets (the token_histogram lesson, vocab.py:101), never by
     vocabulary size. Inside a bucket: one lexsort, np.unique
     boundaries, then a per-TERM vbyte encode — vocabulary-bounded
     C-kernel calls, zero per-row Python.
  3. **postings row layout**: one row per term
         term: string, df: int64, first_doc: int64, body: binary
     `first_doc` carries the first id at full int64 width so the
     layout survives >2^31 doc ids; `body` is the stream-vbyte coding
     of the df-1 sorted-id DELTAS. Each delta must fit the vbyte
     int32 lane — enforced with a loud ValueError (a data-dependent
     bound must survive `python -O`, the textstats.py:426 rule).
  4. **file-per-bucket output** under `out_dir` plus `_meta.json`
     (n_buckets, totals): resumable, and `and_query` prunes to only
     the buckets its terms hash into — a 3-term query over a 64-bucket
     index touches at most 3 files regardless of corpus size.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..codecs.simple import VBYTE
from .classify import _bucket_distinct
from .textstats import _word_lists

# vbyte encodes int32 values: any single doc-id delta must stay below
# 2^31. first_doc is stored at full int64 width, so only GAPS are
# bounded — a corpus would need two adjacent postings >2^31 ids apart
# to trip this.
_MAX_DELTA = (1 << 31) - 1

_POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("first_doc", pa.int64()),
        ("body", pa.binary()),
    ]
)


def _distinct_pairs(batch: pa.Table) -> pa.Table:
    """DISTINCT (term, doc_id) pairs of one batch, fully vectorized:
    dictionary-encode the flattened words, pack (row, term_code) into
    one int64 key, np.unique. Word semantics = SQL string_split(text,
    ' ') (the word_stats / bm25 convention)."""
    words = _word_lists(batch)
    flat = words.flatten()
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.asarray(words.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    row = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(offsets))
    n_terms = len(enc.dictionary)
    # rows-in-batch and per-batch vocab are both far below 2^31, so the
    # packed key is injective within int64
    key = np.unique(row * np.int64(n_terms) + codes)
    u_row = key // n_terms
    u_code = key % n_terms
    return pa.table(
        {
            "term": enc.dictionary.take(pa.array(u_code, type=pa.int64())),
            "doc_id": pa.array(doc_ids[u_row], type=pa.int64()),
        }
    )


def _attach_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    """md5-parity bucket per pair, hashed once per DISTINCT term of the
    batch (classify.py's vectorized DuckDB md5 path)."""
    enc = pc.dictionary_encode(
        batch["term"].combine_chunks()
        if isinstance(batch["term"], pa.ChunkedArray)
        else batch["term"]
    )
    buckets = _bucket_distinct(enc.dictionary, n_buckets)
    per_row = buckets[enc.indices.to_numpy(zero_copy_only=False)]
    return batch.append_column("bucket", pa.array(per_row, type=pa.int64()))


def _encode_bucket_rows(group: pa.Table) -> pa.Table:
    """Postings rows for one bucket: lexsort (term, doc_id), np.unique
    term boundaries, per-term delta+vbyte encode."""
    terms = group["term"].to_numpy(zero_copy_only=False)
    docs = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((docs, terms))
    terms = terms[order]
    docs = docs[order]
    u_terms, starts = np.unique(terms, return_index=True)
    bounds = np.concatenate([starts, [len(terms)]])
    out_term: list[str] = []
    out_df: list[int] = []
    out_first: list[int] = []
    out_body: list[bytes] = []
    for i, t in enumerate(u_terms):  # vocabulary-bounded, never corpus-bounded
        ids = docs[bounds[i] : bounds[i + 1]]
        deltas = np.diff(ids)
        if len(deltas) and int(deltas.max()) > _MAX_DELTA:
            raise ValueError(
                f"invindex: doc-id gap {int(deltas.max())} for term {t!r} "
                f"exceeds the vbyte int32 lane ({_MAX_DELTA}); re-id the "
                "corpus or widen the postings codec"
            )
        out_term.append(str(t))
        out_df.append(len(ids))
        out_first.append(int(ids[0]))
        out_body.append(VBYTE.encode_values(deltas.astype(np.int32), None))
    return pa.table(
        {
            "term": pa.array(out_term, type=pa.string()),
            "df": pa.array(out_df, type=pa.int64()),
            "first_doc": pa.array(out_first, type=pa.int64()),
            "body": pa.array(out_body, type=pa.binary()),
        }
    )


def decode_postings(df: int, first_doc: int, body: bytes) -> np.ndarray:
    """Sorted int64 doc ids of one postings row."""
    if df <= 0:
        raise ValueError("invindex: postings row with df <= 0")
    out = np.empty(df, dtype=np.int64)
    out[0] = first_doc
    if df > 1:
        deltas = VBYTE.decode_values(body, df - 1).astype(np.int64)
        np.cumsum(deltas, out=out[1:])
        out[1:] += first_doc
    return out


def _bucket_path(out_dir: str, bucket: int) -> pathlib.Path:
    return pathlib.Path(out_dir) / f"bucket={bucket:05d}.parquet"


def build_inverted_index(ds, out_dir: str, n_buckets: int = 32) -> dict:
    """Build the index under `out_dir`; returns the meta dict.

    `ds` must have (doc_id, text). One exchange (the bucket groupby)
    moves deduped (term, doc_id) pairs; each bucket's group fn writes
    its own parquet file (file-per-bucket resumable layout) and emits
    one summary row.
    """
    if n_buckets <= 0:
        raise ValueError("invindex: n_buckets must be positive")
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group["bucket"][0].as_py())
        rows = _encode_bucket_rows(group)
        tmp = _bucket_path(out_dir, b).with_suffix(".tmp")
        pq.write_table(rows, tmp)
        tmp.rename(_bucket_path(out_dir, b))
        return pa.table(
            {
                "bucket": pa.array([b], type=pa.int64()),
                "n_terms": pa.array([len(rows)], type=pa.int64()),
                "n_postings": pa.array(
                    [int(pc.sum(rows["df"]).as_py())], type=pa.int64()
                ),
            }
        )

    summary = (
        ds.map_batches(_distinct_pairs, batch_format="pyarrow")
        .map_batches(
            _attach_bucket,
            batch_format="pyarrow",
            fn_kwargs={"n_buckets": n_buckets},
        )
        .groupby("bucket")  # group count BOUNDED by n_buckets
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()
    )
    meta = {
        "n_buckets": n_buckets,
        "buckets_written": sorted(int(r["bucket"]) for r in summary),
        "n_terms": int(sum(r["n_terms"] for r in summary)),
        "n_postings": int(sum(r["n_postings"] for r in summary)),
    }
    meta_tmp = out / "_meta.json.tmp"
    meta_tmp.write_text(json.dumps(meta, indent=1))
    meta_tmp.rename(out / "_meta.json")
    return meta


def _load_meta(index_dir: str) -> dict:
    p = pathlib.Path(index_dir) / "_meta.json"
    if not p.exists():
        raise FileNotFoundError(f"invindex: no _meta.json under {index_dir}")
    return json.loads(p.read_text())


def index_stats(index_dir: str):
    """(term, df, doc_id_sum) per term, by DECODING every postings row
    — proves the compressed lists round-trip without shipping the raw
    pairs anywhere. Returns a Ray Dataset (one map-side pass over the
    bucket files; the per-row decode loop is vocabulary-bounded)."""
    import ray.data as rd

    meta = _load_meta(index_dir)
    files = [str(_bucket_path(index_dir, b)) for b in meta["buckets_written"]]

    def stats(batch: pa.Table) -> pa.Table:
        dfs = batch["df"].to_numpy(zero_copy_only=False)
        firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
        bodies = batch["body"].to_pylist()
        sums = np.empty(len(batch), dtype=np.int64)
        for i in range(len(batch)):  # one C decode per TERM, not per row of corpus
            ids = decode_postings(int(dfs[i]), int(firsts[i]), bodies[i])
            # ids are sorted, so df * |extreme| bounds |sum|: take the
            # fast int64 path when that bound is safe, else exact
            # Python ints (ValueError, not silent wrap — the
            # textstats.py:426 loud-guard rule)
            bound = len(ids) * max(abs(int(ids[0])), abs(int(ids[-1])))
            s = int(ids.sum()) if bound < (1 << 62) else sum(int(x) for x in ids)
            if not (-(1 << 63) <= s < (1 << 63)):
                raise ValueError("invindex: doc_id_sum overflows int64")
            sums[i] = s
        return pa.table(
            {
                "term": batch["term"],
                "df": batch["df"],
                "doc_id_sum": pa.array(sums, type=pa.int64()),
            }
        )

    return rd.read_parquet(files).map_batches(stats, batch_format="pyarrow")


def and_query(index_dir: str, terms: list[str]) -> pa.Table:
    """doc_ids containing ALL `terms` (boolean AND over postings).

    Prunes to the bucket files the query terms hash into (<= |terms|
    files read, independent of corpus size), decodes only the matching
    rows, intersects smallest-first. A term absent from the index
    yields an empty result.
    """
    if not terms:
        raise ValueError("invindex: terms must be non-empty")
    terms = sorted(set(terms))
    meta = _load_meta(index_dir)
    n_buckets = int(meta["n_buckets"])
    written = set(meta["buckets_written"])
    buckets = _bucket_distinct(pa.array(terms, type=pa.string()), n_buckets)
    lists: list[np.ndarray] = []
    found: set[str] = set()
    for b in sorted({int(x) for x in buckets}):
        if b not in written:
            continue  # bucket never materialized => none of its terms exist
        want = [t for t, tb in zip(terms, buckets) if int(tb) == b]
        tbl = pq.read_table(_bucket_path(index_dir, b))
        tbl = tbl.filter(pc.is_in(tbl["term"], value_set=pa.array(want)))
        for i in range(len(tbl)):
            found.add(tbl["term"][i].as_py())
            lists.append(
                decode_postings(
                    int(tbl["df"][i].as_py()),
                    int(tbl["first_doc"][i].as_py()),
                    tbl["body"][i].as_py(),
                )
            )
    empty = pa.table({"doc_id": pa.array([], type=pa.int64())})
    if found != set(terms):
        return empty
    lists.sort(key=len)  # intersect smallest-first
    acc = lists[0]
    for ids in lists[1:]:
        acc = np.intersect1d(acc, ids, assume_unique=True)
        if len(acc) == 0:
            return empty
    return pa.table({"doc_id": pa.array(acc, type=pa.int64())})
