"""Deduplication operators: exact, prefix-key, MinHash+LSH, SimHash.

Scale notes (100 TB): exact/prefix dedup shuffle only a (hash, doc_id)
projection, not full rows; MinHash emits (band, band_hash, doc_id)
rows — the groupby co-locates candidate buckets only; verification
re-reads just the candidate docs. Connected components run on the
candidate-pair edge list, which is orders of magnitude smaller than the
corpus (union-find on the driver here; label propagation would replace
it if the edge list itself were huge).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE = (1 << 61) - 1


def exact_dedup(ds, key_expr: str = "text"):
    """Keep the min-doc_id row per exact content key.

    Returns rows (doc_id, text). Shuffle carries only (key_hash,
    doc_id, text); at scale you'd project doc_id+hash and semi-join.
    """

    def add_key(batch: pa.Table) -> pa.Table:
        col = batch[key_expr]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        keys = [hashlib.md5(t.encode()).hexdigest() for t in arr.to_pylist()]
        return batch.select(["doc_id", "text"]).append_column(
            "dedup_key", pa.array(keys, type=pa.string())
        )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        keep = group.sort_values("doc_id").head(1)
        return keep[["doc_id", "text"]]

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("dedup_key")
        .map_groups(keep_first, batch_format="pandas")
    )


def prefix_dedup(ds, prefix_chars: int = 40):
    """Near-dup-ish dedup on a text prefix key; returns
    (prefix_key, doc_id=min, n_dups)."""

    def add_key(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        key = pc.utf8_slice_codeunits(arr, 0, prefix_chars)
        return pa.table({"prefix_key": key, "doc_id": batch["doc_id"]})

    def reduce_group(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "prefix_key": [group["prefix_key"].iloc[0]],
                "doc_id": [int(group["doc_id"].min())],
                "n_dups": [len(group)],
            }
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("prefix_key")
        .map_groups(reduce_group, batch_format="pandas")
    )


# ---------------- MinHash + LSH ----------------

_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 4 rows per band


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """u64 hashes of word k-shingles."""
    words = text.split(" ")
    if len(words) < k:
        shingles = [" ".join(words)]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
         for s in set(shingles)),
        dtype=np.uint64,
    )


_rng = np.random.default_rng(20240817)
_MH_A = _rng.integers(1, MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_MH_B = _rng.integers(0, MERSENNE, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)


def _minhash_signature(shingles: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(_MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*x + b) mod p per permutation, min over shingles
    x = shingles.astype(np.object_)  # exact big-int arithmetic mod 2^61-1
    sig = np.empty(_MINHASH_PERMS, dtype=np.uint64)
    for j in range(_MINHASH_PERMS):
        vals = (int(_MH_A[j]) * x + int(_MH_B[j])) % MERSENNE
        sig[j] = np.uint64(min(vals))
    return sig


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """Explode each doc into (bucket, doc_id, signature) rows — one per
    LSH band; the signature rides along so candidate verification inside
    the bucket groupby needs no second pass over the corpus."""
    col = batch["text"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    rows_bucket, rows_doc, rows_sig = [], [], []
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    for doc_id, text in zip(doc_ids, arr.to_pylist()):
        sig = _minhash_signature(_shingle_hashes(text))
        sig_bytes = sig.tobytes()
        for band in range(_LSH_BANDS):
            h = hashlib.blake2b(
                sig[band * rows_per_band : (band + 1) * rows_per_band].tobytes(),
                digest_size=8,
            ).digest()
            rows_bucket.append(f"{band}:{int.from_bytes(h, 'little') >> 1}")
            rows_doc.append(int(doc_id))
            rows_sig.append(sig_bytes)
    return pa.table(
        {
            "bucket": pa.array(rows_bucket, type=pa.string()),
            "doc_id": pa.array(rows_doc, type=pa.int64()),
            "sig": pa.array(rows_sig, type=pa.large_binary()),
        }
    )


def _estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def _bucket_verified_pairs(threshold: float):
    def fn(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = docs["doc_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in docs["sig"]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if _estimated_jaccard(sigs[i], sigs[j]) >= threshold:
                    rows.append((int(ids[i]), int(ids[j])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"])

    return fn


def minhash_dedup(ds, jaccard_threshold: float = 0.7):
    """MinHash-LSH near-duplicate clustering.

    shingle -> 64-perm minhash -> 16 bands -> bucket groupby ->
    signature-estimated Jaccard verification inside each bucket ->
    union-find over the (small) verified edge list on the driver.
    Returns (doc_id, cluster_id); cluster_id = min doc_id of the
    component. Only (bucket, doc_id, 512-byte signature) rows shuffle —
    never the documents themselves.
    """
    bands = ds.map_batches(minhash_bands_batch, batch_format="pyarrow")
    pairs = bands.groupby("bucket").map_groups(
        _bucket_verified_pairs(jaccard_threshold), batch_format="pandas"
    )
    pair_df = pairs.to_pandas().drop_duplicates()

    all_ids = sorted(
        r["doc_id"]
        for r in ds.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ).take_all()
    )
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pair_df.get("doc_a", []), pair_df.get("doc_b", [])):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rows = [{"doc_id": d, "cluster_id": find(d)} for d in all_ids]
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    )


# ---------------- SimHash ----------------


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash per document from word hashes."""
    col = batch["text"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    out = []
    for text in arr.to_pylist():
        votes = np.zeros(64, dtype=np.int64)
        for w in set(text.split(" ")):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            votes += np.where(bits.astype(bool), 1, -1)
        out.append(int((votes > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64))) >> 1)
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, type=pa.int64())})


def simhash_near_pairs(ds, max_hamming: int = 6):
    """Candidate near-dup pairs: equal 16-bit SimHash band -> verify
    Hamming distance <= max_hamming. Returns (doc_a, doc_b, hamming)."""
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow").to_pandas()
    sig_by_doc = dict(zip(sigs["doc_id"], sigs["simhash"]))
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sh in sig_by_doc.items():
        for band in range(4):
            key = (band, (sh >> (band * 16)) & 0xFFFF)
            buckets.setdefault(key, []).append(doc_id)
    seen = set()
    rows = []
    for docs in buckets.values():
        docs = sorted(docs)
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                ham = bin(sig_by_doc[a] ^ sig_by_doc[b]).count("1")
                if ham <= max_hamming:
                    rows.append({"doc_a": a, "doc_b": b, "hamming": ham})
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
        ),
    )
