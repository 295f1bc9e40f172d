"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k: the query matrix is broadcast once
(ray.put); each batch computes a float64 matmul against it and emits
its local top-k candidates; a tiny driver-side merge keeps the global
top-k. At 100 TB this is the baseline; lsh_topk buckets vectors by
signed random projections so each query only scans matching buckets.
"""

from __future__ import annotations

import numpy as np
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

    rows = []
    for qid, group in candidates.groupby("query_id"):
        group = group.sort_values(["sim", "neighbor_id"], ascending=[False, True])
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


def lsh_topk(ds, query_ids: list[int], k: int = 5, n_planes: int = 8) -> pa.Table:
    """Approximate top-k: bucket vectors by signed random projections,
    scan only buckets matching each query (plus Hamming-1 probes).

    Same output schema as brute_force_topk; approximate recall.
    """
    rng = np.random.default_rng(4637947)
    planes = None

    full = ds.map_batches(lambda b: b, batch_format="pyarrow")  # passthrough
    all_rows = full.take_all()
    tbl = pa.Table.from_pylist(all_rows)
    mat, ids = _embedding_matrix(tbl)
    mat = _normalize(mat)
    planes = rng.normal(size=(mat.shape[1], n_planes))
    codes = (mat @ planes > 0) @ (1 << np.arange(n_planes))
    qsel = np.isin(ids, query_ids)

    rows = []
    for qi in np.flatnonzero(qsel):
        probe_codes = {int(codes[qi])} | {
            int(codes[qi]) ^ (1 << b) for b in range(n_planes)
        }
        cand = np.flatnonzero(np.isin(codes, list(probe_codes)) & (ids != ids[qi]))
        if len(cand) == 0:
            continue
        sims = mat[cand] @ mat[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, j in enumerate(order, start=1):
            rows.append(
                {"query_id": int(ids[qi]), "rank": rank, "neighbor_id": int(ids[cand[j]])}
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()), ("neighbor_id", pa.int64())]
        ),
    )


def embedding_near_dups(ds, threshold: float = 0.98) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= t)."""
    tbl = pa.Table.from_pylist(ds.take_all())
    mat, ids = _embedding_matrix(tbl)
    mat = _normalize(mat)
    sims = mat @ mat.T
    ia, ib = np.where(np.triu(sims >= threshold, k=1))
    order = np.lexsort((ids[ib], ids[ia]))
    return pa.table(
        {
            "vec_a": pa.array(ids[ia][order], type=pa.int64()),
            "vec_b": pa.array(ids[ib][order], type=pa.int64()),
        }
    )
