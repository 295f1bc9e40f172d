"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k: the query matrix is broadcast once
(ray.put); each batch computes a float64 matmul against it and emits
its local top-k candidates; a tiny driver-side merge keeps the global
top-k. At 100 TB this is the baseline; lsh_topk buckets vectors by
signed random projections so each query only scans matching buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _embedding_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    col = batch["embedding"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    dims = np.diff(offsets)
    dim = int(dims[0]) if len(dims) else 0
    assert dim == 0 or (dims == dim).all(), "ragged embeddings"
    mat = values.reshape(-1, dim) if dim else values.reshape(0, 0)
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return mat, ids


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _TopKScorer:
    """Actor: holds the normalized query matrix; emits per-batch local
    top-k candidate rows (query_id, neighbor_id, sim)."""

    def __init__(self, queries_ref, k):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.q_ids, self.q_mat = q
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat, ids = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        sims = self.q_mat @ _normalize(mat).T  # (n_queries, batch)
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            for j in idx:
                if ids[j] == self.q_ids[qi]:
                    continue  # exclude self
                out_q.append(int(self.q_ids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_topk(ds, query_ids: list[int], k: int = 5) -> pa.Table:
    """Exact cosine top-k for the given query vec_ids.

    Returns (query_id, rank, neighbor_id) — integer columns only, ties
    broken by neighbor_id ascending (matches the SQL oracle).
    """
    import pyarrow.compute as pc
    import ray

    qset = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_rows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qset)),
        batch_format="pyarrow",
    ).take_all()
    q_tbl = pa.Table.from_pylist(q_rows)
    q_mat, q_ids = _embedding_matrix(q_tbl)
    order = np.argsort(q_ids)
    queries_ref = ray.put((q_ids[order], _normalize(q_mat[order])))

    candidates = ds.map_batches(
        _TopKScorer,
        batch_format="pyarrow",
        fn_constructor_args=(queries_ref, k),
        concurrency=(1, 8),
    ).to_pandas()
    return _merge_topk(candidates, k)


def lsh_topk(ds, query_ids: list[int], k: int = 5, n_planes: int = 8) -> pa.Table:
    """Approximate top-k: bucket vectors by signed random projections
    and scan, per query, only the buckets in its Hamming-1 probe set.

    Distributed shape: a map stage assigns each vector its bucket code
    and scores it against the (broadcast) queries that probe that code;
    a driver-side merge keeps the global top-k per query. Only per-batch
    candidate rows leave the workers — the corpus is never collected.
    Same output schema as brute_force_topk; approximate recall.
    """
    import pyarrow.compute as pc
    import ray

    rng = np.random.default_rng(4637947)

    qset = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_rows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qset)),
        batch_format="pyarrow",
    ).take_all()
    q_tbl = pa.Table.from_pylist(q_rows)
    q_mat, q_ids = _embedding_matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
    dim = q_mat.shape[1]
    planes = rng.normal(size=(dim, n_planes))
    q_codes = ((q_mat @ planes > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
    # per query: its code plus all Hamming-1 neighbors
    probe_sets = [
        {int(c)} | {int(c) ^ (1 << b) for b in range(n_planes)} for c in q_codes
    ]
    broadcast = ray.put((q_ids, q_mat, planes, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, pl, probes = ray.get(broadcast)
        mat, ids = _embedding_matrix(batch)
        out_q, out_n, out_s = [], [], []
        if mat.size:
            mat = _normalize(mat)
            codes = ((mat @ pl > 0) @ (1 << np.arange(pl.shape[1]))).astype(np.int64)
            for quid, qvec, probe in zip(qi, qm, probes):
                cand = np.flatnonzero(
                    np.isin(codes, list(probe)) & (ids != quid)
                )
                if len(cand) == 0:
                    continue
                sims = mat[cand] @ qvec
                keep = np.argsort(-sims)[:k]
                for j in keep:
                    out_q.append(int(quid))
                    out_n.append(int(ids[cand[j]]))
                    out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return _merge_topk(candidates, k)


def _merge_topk(candidates: pd.DataFrame, k: int) -> pa.Table:
    """Driver-side merge of per-batch candidate rows into global top-k
    (query_id, rank, neighbor_id); ties broken by neighbor_id."""
    rows = []
    for qid, group in candidates.groupby("query_id"):
        group = group.drop_duplicates("neighbor_id").sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        )
        for rank, (_, r) in enumerate(group.head(k).iterrows(), start=1):
            rows.append(
                {"query_id": int(qid), "rank": rank, "neighbor_id": int(r.neighbor_id)}
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()), ("neighbor_id", pa.int64())]
        ),
    )


def _kmeans(mat: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 901) -> np.ndarray:
    """Small spherical k-means on a normalized sample (driver-side):
    cosine assignment, mean + renormalize update, empty clusters
    reseeded from the worst-fit points. Deterministic."""
    rng = np.random.default_rng(seed)
    n = mat.shape[0]
    n_centroids = min(n_centroids, n)
    cent = mat[rng.choice(n, size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = mat @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
            else:
                cent[c] = mat[int(np.argmin(np.max(sims, axis=1)))]
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    sample_every: int = 7,
    sample_max: int = 4096,
) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) index: the scale
    path beside lsh_topk.

    1. A deterministic sample (every `sample_every`-th vec_id, capped)
       trains spherical k-means centroids on the driver.
    2. Centroids + queries broadcast once (ray.put); each query probes
       its `nprobe` nearest centroids.
    3. One map pass assigns each batch vector to its nearest centroid
       (matmul) and scores it against only the queries probing that
       centroid — no shuffle, corpus never collected.

    At 100 TB the same centroids would instead key a bucketed parquet
    layout (one directory per centroid) written once and scanned
    per-probe; the map-side assignment and scoring here are exactly the
    build and search kernels of that layout. Output schema matches
    brute_force_topk; recall is approximate (grows with nprobe).
    """
    import pyarrow.compute as pc
    import ray

    qset = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_rows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qset)),
        batch_format="pyarrow",
    ).take_all()
    q_tbl = pa.Table.from_pylist(q_rows)
    q_mat, q_ids = _embedding_matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])

    def pick_sample(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % sample_every == 0))

    sample_rows = (
        ds.map_batches(pick_sample, batch_format="pyarrow").limit(sample_max).take_all()
    )
    s_mat, _ = _embedding_matrix(pa.Table.from_pylist(sample_rows))
    centroids = _kmeans(_normalize(s_mat), n_centroids)

    # per-query probe list: its nprobe nearest centroids
    q_cent = np.argsort(-(q_mat @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]
    broadcast = ray.put((q_ids, q_mat, centroids, q_cent))

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, cent, probes = ray.get(broadcast)
        mat, ids = _embedding_matrix(batch)
        out_q, out_n, out_s = [], [], []
        if mat.size:
            mat = _normalize(mat)
            assign = np.argmax(mat @ cent.T, axis=1)
            for row, (quid, qvec) in enumerate(zip(qi, qm)):
                cand = np.flatnonzero(np.isin(assign, probes[row]) & (ids != quid))
                if len(cand) == 0:
                    continue
                sims = mat[cand] @ qvec
                keep = np.argsort(-sims)[: k + 1]
                out_q.extend([int(quid)] * len(keep))
                out_n.extend(int(ids[cand[j]]) for j in keep)
                out_s.extend(float(sims[j]) for j in keep)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return _merge_topk(candidates, k)


def ivf_build(ds, out_dir: str, n_centroids: int = 64, sample_every: int = 7,
              sample_max: int = 4096) -> np.ndarray:
    """Build the on-disk IVF index: centroid-partitioned parquet
    (one directory per inverted list, hive layout `centroid=K/`) plus
    the centroid matrix. This is the 100-TB layout `ivf_topk` stands in
    for: built once with a single assignment pass, searched with
    partition pruning (only probed lists are read). Returns the
    centroid matrix (also persisted as centroids.npy)."""
    import pathlib

    import pyarrow.compute as pc

    def pick_sample(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % sample_every == 0))

    sample_rows = (
        ds.map_batches(pick_sample, batch_format="pyarrow").limit(sample_max).take_all()
    )
    s_mat, _ = _embedding_matrix(pa.Table.from_pylist(sample_rows))
    centroids = _kmeans(_normalize(s_mat), n_centroids)

    import ray

    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat, ids = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32())),
                    "centroid": pa.array([], type=pa.int64()),
                }
            )
        c = np.argmax(_normalize(mat) @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "centroid": pa.array(c, type=pa.int64()),
            }
        )

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        str(out), partition_cols=["centroid"]
    )
    np.save(out / "centroids.npy", centroids)
    return centroids


def ivf_search(index_dir: str, query_rows: pa.Table, k: int = 5, nprobe: int = 8) -> pa.Table:
    """Search the on-disk IVF index with partition pruning: only the
    union of the queries' nprobe nearest inverted-list directories is
    read (everything else never leaves storage). Output schema matches
    brute_force_topk."""
    import pathlib

    import ray

    out = pathlib.Path(index_dir)
    centroids = np.load(out / "centroids.npy")
    q_mat, q_ids = _embedding_matrix(query_rows)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
    nprobe = min(nprobe, len(centroids))
    q_cent = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    probed = sorted(set(q_cent.reshape(-1).tolist()))
    # explicit file list of only the probed inverted-list directories
    # (Ray still infers the hive `centroid` column from the paths);
    # unprobed lists never leave storage
    paths = [
        str(f)
        for c in probed
        for f in sorted((out / f"centroid={c}").glob("*.parquet"))
        if (out / f"centroid={c}").exists()
    ]
    if not paths:
        return _merge_topk(pd.DataFrame(columns=["query_id", "neighbor_id", "sim"]), k)

    broadcast = ray.put((q_ids, q_mat, q_cent))

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, probes = ray.get(broadcast)
        mat, ids = _embedding_matrix(batch)
        cent_col = batch["centroid"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        if mat.size:
            mat = _normalize(mat)
            for row, (quid, qvec) in enumerate(zip(qi, qm)):
                cand = np.flatnonzero(np.isin(cent_col, probes[row]) & (ids != quid))
                if len(cand) == 0:
                    continue
                sims = mat[cand] @ qvec
                keep = np.argsort(-sims)[: k + 1]
                out_q.extend([int(quid)] * len(keep))
                out_n.extend(int(ids[cand[j]]) for j in keep)
                out_s.extend(float(sims[j]) for j in keep)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    import ray.data as rd

    candidates = (
        rd.read_parquet(paths)
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    return _merge_topk(candidates, k)


def plant_twins(ds, every: int = 50, id_offset: int = 10_000_000, scale: float = 1.001):
    """Append a deterministic scaled twin (cosine-identical direction)
    for every `every`-th vector — makes near-dup queries non-vacuous on
    corpora without natural near-duplicates, and is exactly
    reproducible in SQL (list_transform(embedding, x -> x * scale))."""

    def add(batch: pa.Table) -> pa.Table:
        col = batch["embedding"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pick = np.flatnonzero(ids % every == 0)
        if len(pick) == 0:
            return batch.select(["vec_id", "embedding"])
        sub = arr.take(pa.array(pick))
        vals = sub.flatten().to_numpy(zero_copy_only=False).astype(np.float64) * scale
        offsets = np.asarray(sub.offsets, dtype=np.int64)
        offsets = offsets - offsets[0]
        twins = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(vals.astype(np.float32), type=pa.float32()),
        )
        twin_tbl = pa.table(
            {
                "vec_id": pa.array(ids[pick] + id_offset, type=pa.int64()),
                "embedding": twins.cast(arr.type),
            }
        )
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), twin_tbl])

    return ds.map_batches(add, batch_format="pyarrow")


def embedding_near_dups(ds, threshold: float = 0.98, n_planes: int = 8, n_tables: int = 3):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= t).

    Distributed LSH: each vector lands in one bucket per hash table
    (signed random projections); pairs are verified by exact cosine
    inside each bucket group and emitted by their lowest matching table
    only (no cross-bucket dedup pass). High-similarity pairs collide in
    at least one table with high probability
    (recall ~= 1-(1-p^planes)^tables); pair recall is approximate by
    construction — exact verification, approximate candidate recall.
    Returns a Dataset of (vec_a, vec_b).
    """

    def to_buckets(batch: pa.Table) -> pa.Table:
        mat, ids = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.string()),
                    "table_no": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32())),
                }
            )
        matn = _normalize(mat)
        dim = matn.shape[1]
        local_rng = np.random.default_rng(20240817)
        n = len(ids)
        codes = np.empty((n_tables, n), dtype=np.int64)
        for t in range(n_tables):
            planes = local_rng.normal(size=(dim, n_planes))
            codes[t] = ((matn @ planes > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
        table_no = np.repeat(np.arange(n_tables, dtype=np.int64), n)
        bucket = np.char.add(
            np.char.add(table_no.astype(str), ":"), codes.reshape(-1).astype(str)
        )
        flat = matn.astype(np.float32).reshape(-1)
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * dim, type=pa.int32()),
            pa.array(flat, type=pa.float32()),
        )
        # every table's code rides along so the lowest-matching-table
        # check uses the exact codes this pass computed (recomputing
        # from the float32-rounded embeddings could flip a sign)
        codes_list = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * n_tables, type=pa.int32()),
            pa.array(codes.T.reshape(-1), type=pa.int64()),
        )
        rep = pa.array(np.tile(np.arange(n), n_tables))
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.string()),
                "table_no": pa.array(table_no, type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, n_tables), type=pa.int64()),
                "embedding": emb.take(rep),
                "codes": codes_list.take(rep),
            }
        )

    return (
        ds.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            _near_dup_bucket_pairs(threshold, n_tables), batch_format="pyarrow"
        )
    )


def _near_dup_bucket_pairs(threshold: float, n_tables: int, max_pairs: int = 1 << 22):
    """In-bucket exact-cosine verification for embedding_near_dups,
    blocked: a hot bucket (many near-identical vectors — precisely the
    near-dup case) must not allocate the full n x n similarity matrix;
    each block is a (rows_per, n) matmul bounded to ~max_pairs
    entries. Module-level so the hot-bucket memory test can drive it
    directly."""

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], type=pa.int64()), "vec_b": pa.array([], type=pa.int64())}
        )
        vec_ids = group["vec_id"].to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(vec_ids, return_index=True)
        if len(first_idx) < 2:
            return empty
        table_no = int(group["table_no"][0].as_py())
        g = group.take(pa.array(np.sort(first_idx)))
        mat, ids = _embedding_matrix_named(g, "vec_id", "embedding")
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order].astype(np.float64)
        n = len(ids)
        rows_per = max(1, max_pairs // n)
        blk_a, blk_b = [], []
        for i0 in range(0, n - 1, rows_per):
            i1 = min(i0 + rows_per, n - 1)
            sims = mat[i0:i1] @ mat.T  # (rows, n)
            r, c = np.nonzero(sims >= threshold)
            keep = c > r + i0  # strict upper triangle
            blk_a.append(r[keep] + i0)
            blk_b.append(c[keep])
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)
        ia, ib = cat(blk_a), cat(blk_b)
        if table_no > 0 and len(ia):
            # emitted by the lowest matching table only (exact codes
            # carried from the bucketing pass)
            codes_col = g["codes"]
            codes_arr = (
                codes_col.combine_chunks()
                if isinstance(codes_col, pa.ChunkedArray)
                else codes_col
            )
            codes = (
                codes_arr.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(len(ids), n_tables)[order]
            )
            earlier = (codes[ia, :table_no] == codes[ib, :table_no]).any(axis=1)
            ia, ib = ia[~earlier], ib[~earlier]
        return pa.table(
            {
                "vec_a": pa.array(ids[ia], type=pa.int64()),
                "vec_b": pa.array(ids[ib], type=pa.int64()),
            }
        )

    return bucket_pairs


def _embedding_matrix_named(batch: pa.Table, id_col: str, emb_col: str):
    col = batch[emb_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    dims = np.diff(offsets)
    dim = int(dims[0]) if len(dims) else 0
    mat = values.reshape(-1, dim) if dim else values.reshape(0, 0)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return mat, ids


# ---------------- int8 scalar quantization (storage codec) ----------------


def _minmax_stats(ds) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the corpus: one summary row per
    block (two dim-sized float64 lists), folded on the driver —
    bounded by block count, never by row count."""

    def block_stats(batch: pa.Table) -> pa.Table:
        mat, _ = _embedding_matrix(batch)
        if mat.size == 0:
            return pa.table(
                {"mn": pa.array([], pa.list_(pa.float64())),
                 "mx": pa.array([], pa.list_(pa.float64()))}
            )
        return pa.table(
            {
                "mn": pa.array([mat.min(axis=0).tolist()], pa.list_(pa.float64())),
                "mx": pa.array([mat.max(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    rows = ds.map_batches(
        block_stats, batch_size=None, batch_format="pyarrow"
    ).take_all()
    mns = np.array([r["mn"] for r in rows], dtype=np.float64)
    mxs = np.array([r["mx"] for r in rows], dtype=np.float64)
    return mns.min(axis=0), mxs.max(axis=0)


def quantize_embeddings(ds):
    """Int8 scalar quantization of the embedding column — the 4x
    storage codec for vector corpora: per-dimension (min, max) from a
    distributed aggregate broadcast via ray.put, then each batch maps
    x -> clip(floor((x - mn)/scale + 0.5), 0, 255) with
    scale = (mx - mn)/255. All arithmetic in float64 with the exact
    operation order the SQL oracle uses (CAST to DOUBLE, scale
    computed first, floor(q + 0.5)), so the codes are bit-identical
    cross-engine — floor(+0.5) sidesteps the numpy half-even vs SQL
    half-away rounding mismatch. Returns
    (vec_id, codes: binary, code_sum, code_wsum); the int checksums
    make the query hashable without float columns."""
    import ray

    mn, mx = _minmax_stats(ds)
    scale = (mx - mn) / 255.0
    ref = ray.put((mn, scale))

    def encode(batch: pa.Table) -> pa.Table:
        mat, ids = _embedding_matrix(batch)
        b_mn, b_scale = ray.get(ref)
        if mat.size == 0:
            # placeholder sized to the CORPUS dim (len(b_mn)), not 1 —
            # every block must emit the same fixed_size_binary width or
            # downstream block concatenation breaks on mixed schemas
            codes = np.zeros((len(ids), max(len(b_mn), 1)), dtype=np.uint8)
        else:
            safe = np.where(b_scale > 0, b_scale, 1.0)
            q = np.floor((mat - b_mn) / safe + 0.5)
            q = np.where(b_scale > 0, q, 0.0)
            codes = np.clip(q, 0, 255).astype(np.uint8)
        w = np.arange(1, codes.shape[1] + 1, dtype=np.int64)
        code_sum = codes.sum(axis=1, dtype=np.int64)
        code_wsum = (codes.astype(np.int64) * w).sum(axis=1)
        if codes.shape[1] == 0:
            codes = np.zeros((len(ids), 1), dtype=np.uint8)
        code_col = pa.Array.from_buffers(
            pa.binary(codes.shape[1]),
            len(ids),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())],
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "codes": code_col,
                "code_sum": pa.array(code_sum),
                "code_wsum": pa.array(code_wsum),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def dequantize_codes(codes: np.ndarray, mn: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Reconstruction: x' = mn + code * scale (float64). Max abs error
    is scale/2 per dimension by construction (pytest-pinned)."""
    return mn + codes.astype(np.float64) * scale


# ---------------- distributed integer-exact k-means ----------------


def _code_matrix(mn: np.ndarray, scale: np.ndarray):
    """Batch -> (vec_ids, int64 code matrix) with the exact
    quantize_embeddings arithmetic (shared oracle parity)."""

    def fn(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        mat, ids = _embedding_matrix(batch)
        if mat.size == 0:
            return ids, np.zeros((len(ids), len(mn)), dtype=np.int64)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.floor((mat - mn) / safe + 0.5)
        q = np.where(scale > 0, q, 0.0)
        return ids, np.clip(q, 0, 255).astype(np.int64)

    return fn


def kmeans_codes(ds, k: int = 8, iters: int = 2):
    """Distributed Lloyd's k-means over int8-quantized embeddings —
    INTEGER-EXACT, so every iteration is bit-reproducible and
    SQL-recomputable (the distance is a sum of squared int64 code
    deltas; the centroid update is floor-division of integer sums).
    This is the at-scale centroid trainer the IVF index needs when a
    driver-side sample no longer represents the corpus: each iteration
    is one map pass emitting per-block (cluster, count, per-dim sums)
    partials — rows ≤ k per block — folded on the driver and
    re-broadcast. Nothing corpus-sized moves.

    Deterministic protocol (mirrored by the oracle): centroids
    initialize from the k smallest vec_ids' codes (cluster id = rank);
    assignment ties break to the lowest cluster id; clusters that lose
    all members are dropped from subsequent iterations. `iters` counts
    assignment passes (updates happen between them). Returns
    (vec_id, cluster, dist)."""
    import ray

    mn, mx = _minmax_stats(ds)
    scale = (mx - mn) / 255.0
    codes_fn = _code_matrix(mn, scale)

    # init: codes of the k globally-smallest vec_ids (tiny driver merge)
    def local_bottom(batch: pa.Table) -> pa.Table:
        ids, codes = codes_fn(batch)
        order = np.argsort(ids)[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "codes": pa.array(
                    [codes[i].tobytes() for i in order], pa.binary()
                ),
            }
        )

    rows = ds.map_batches(
        local_bottom, batch_size=None, batch_format="pyarrow"
    ).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    rows = rows[:k]
    assert rows, "kmeans_codes: empty embeddings dataset"
    dim = len(mn)
    # corpora smaller than k simply get one cluster per vector
    cents = np.stack(
        [np.frombuffer(r["codes"], dtype=np.int64) for r in rows]
    ).reshape(len(rows), dim)
    cluster_ids = np.arange(len(rows), dtype=np.int64)

    def assign(codes: np.ndarray, cents_: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        x2 = (codes * codes).sum(axis=1)
        c2 = (cents_ * cents_).sum(axis=1)
        dist = x2[:, None] - 2 * (codes @ cents_.T) + c2[None, :]
        a = np.argmin(dist, axis=1)  # ties -> first (lowest cluster id)
        return a, dist[np.arange(len(a)), a]

    for _ in range(max(iters - 1, 0)):
        ref = ray.put((cluster_ids, cents))

        def partials(batch: pa.Table) -> pa.Table:
            cl_ids, cents_ = ray.get(ref)
            ids, codes = codes_fn(batch)
            if len(ids) == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "sums": pa.array([], pa.binary()),
                    }
                )
            a, _ = assign(codes, cents_)
            out_cl, out_cnt, out_sums = [], [], []
            for j in np.unique(a):
                sel = codes[a == j]
                out_cl.append(int(cl_ids[j]))
                out_cnt.append(len(sel))
                out_sums.append(sel.sum(axis=0, dtype=np.int64).tobytes())
            return pa.table(
                {
                    "cluster": pa.array(out_cl, pa.int64()),
                    "cnt": pa.array(out_cnt, pa.int64()),
                    "sums": pa.array(out_sums, pa.binary()),
                }
            )

        acc: dict[int, tuple[int, np.ndarray]] = {}
        for r in ds.map_batches(
            partials, batch_size=None, batch_format="pyarrow"
        ).take_all():
            cnt, sums = acc.get(r["cluster"], (0, np.zeros(dim, np.int64)))
            acc[r["cluster"]] = (
                cnt + r["cnt"],
                sums + np.frombuffer(r["sums"], dtype=np.int64),
            )
        kept = sorted(c for c, (n, _) in acc.items() if n > 0)
        cluster_ids = np.array(kept, dtype=np.int64)
        cents = np.stack([acc[c][1] // acc[c][0] for c in kept])

    final_ref = ray.put((cluster_ids, cents))

    def final_assign(batch: pa.Table) -> pa.Table:
        cl_ids, cents_ = ray.get(final_ref)
        ids, codes = codes_fn(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        a, d = assign(codes, cents_)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl_ids[a], pa.int64()),
                "dist": pa.array(d.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")
