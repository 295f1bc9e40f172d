"""Full-text retrieval over the documents table: BM25 top-k.

The missing family next to the embedding ANN operators: sparse lexical
search. Two corpus passes, both map-side only — NO corpus shuffle:

  1. **stats pass**: per-batch partials (doc count, total word count,
     per-query-term document frequency) reduced to one tiny row; the
     reduce moves one row per block.
  2. **score pass**: per-batch vectorized tf counting (one boolean mask
     + bincount per query term over the flattened word array), BM25
     scoring, and a per-block top-k prune — at most k rows per query
     per block leave the map stage. The finalize groupby has
     |queries| groups (a handful), so map_groups dispatch is bounded
     by the query count, not the corpus (same rationale as
     embedding_near_dups' bounded-bucket map_groups).

**Cross-engine exact scoring.** BM25 is float math, which normally
cannot be oracle-checked bit-exactly (SQL SUM order is unspecified and
`ln` is libm-dependent — the reason distinctive_terms uses a
lexicographic rank instead). This implementation makes the score an
order-independent INTEGER:

  - rational idf  idf_t = (N - df_t + 0.5) / (df_t + 0.5)   (no log:
    every operation is a correctly-rounded IEEE double op, so numpy
    and DuckDB produce bit-identical doubles for the same expression
    shape);
  - per-term contribution
        contrib = idf_t * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    (k1 = 1.2, b = 0.75, so k1+1 = 2.2 and 1-b = 0.25 are literals in
    BOTH engines, and the expression tree is written identically);
  - quantize FIRST, sum ints AFTER:  score = Σ_t floor(contrib · 1e6)
    as int64 — integer addition commutes, so the oracle's SUM order
    cannot matter.

Word semantics match SQL string_split(text, ' ') exactly (the
convention word_stats / distinctive_terms pin against the oracle).
Ranking: score DESC, doc_id ASC (deterministic ties, the ann_topk
convention). Only docs containing at least one query term are
candidates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_Q = 1e6  # score quantization: floor(contrib * 1e6) per term


def _word_lists(batch: pa.Table) -> pa.ListArray:
    col = batch["text"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.split_pattern(arr, pattern=" ")


def bm25_topk(ds, queries: dict[int, list[str]], k: int = 10):
    """BM25 top-k retrieval for a fixed set of term queries.

    `queries`: query_id -> list of terms (terms need not be distinct
    across queries). Returns (query_id, rnk, doc_id, score) with
    score the quantized-integer BM25 described in the module docstring.
    """
    if not queries:
        raise ValueError("bm25_topk: queries must be non-empty")
    # dedupe terms WITHIN each query: a duplicated term would add its
    # quantized contribution twice here but double tf inside the
    # nonlinear saturation in a naive SQL mirror — distinct-terms is
    # the semantics both sides implement (the oracle builder dedupes
    # identically)
    queries = {q: sorted(set(ts)) for q, ts in queries.items()}
    terms = sorted({t for ts in queries.values() for t in ts})
    t_index = {t: i for i, t in enumerate(terms)}
    m = len(terms)

    # ---- pass 1: corpus stats (one tiny row per block moves) ----
    def stat_partials(batch: pa.Table) -> pa.Table:
        words = _word_lists(batch)
        offsets = np.asarray(words.offsets, dtype=np.int64)
        counts = np.diff(offsets - offsets[0])
        flat = words.flatten().to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        cols = {
            "n_docs": pa.array([batch.num_rows], type=pa.int64()),
            "total_dl": pa.array([int(counts.sum())], type=pa.int64()),
        }
        for t, i in t_index.items():
            hit_rows = rows[flat == t]
            cols[f"df_{i}"] = pa.array(
                [int(len(np.unique(hit_rows)))], type=pa.int64()
            )
        return pa.table(cols)

    stat_cols = ["n_docs", "total_dl"] + [f"df_{i}" for i in range(m)]
    stats = ds.map_batches(
        stat_partials, batch_format="pyarrow", batch_size=None
    ).sum(stat_cols)
    n_docs = int(stats["sum(n_docs)"])
    total_dl = int(stats["sum(total_dl)"])
    if n_docs == 0:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.int64()),
            }
        )
    df = np.array([int(stats[f"sum(df_{i})"]) for i in range(m)], dtype=np.int64)
    avgdl = float(total_dl) / float(n_docs)
    # rational idf, identical expression shape to the oracle SQL
    idf = (n_docs - df + 0.5) / (df + 0.5)

    qids = sorted(queries)
    q_terms = {q: np.array([t_index[t] for t in queries[q]]) for q in qids}

    # ---- pass 2: vectorized scoring + per-block top-k prune ----
    def score_block(batch: pa.Table) -> pa.Table:
        words = _word_lists(batch)
        offsets = np.asarray(words.offsets, dtype=np.int64)
        counts = np.diff(offsets - offsets[0])
        flat = words.flatten().to_numpy(zero_copy_only=False)
        nrows = batch.num_rows
        rows = np.repeat(np.arange(nrows, dtype=np.int64), counts)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = counts.astype(np.float64)
        # tf per (term, doc): one mask + bincount per query term
        tf = np.zeros((m, nrows), dtype=np.int64)
        for t, i in t_index.items():
            tf[i] = np.bincount(rows[flat == t], minlength=nrows)
        # quantized per-term contributions (expression shape mirrored
        # in the oracle SQL — see module docstring)
        denom = tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))
        contrib = idf[:, None] * (tf * 2.2) / denom
        qcontrib = np.floor(contrib * 1e6).astype(np.int64)
        qcontrib[tf == 0] = 0
        out_q, out_d, out_s = [], [], []
        for q in qids:
            ti = q_terms[q]
            score = qcontrib[ti].sum(axis=0)
            cand = np.flatnonzero(tf[ti].sum(axis=0) > 0)
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((doc_ids[cand], -score[cand]))][:k]
            out_q.append(np.full(len(order), q, dtype=np.int64))
            out_d.append(doc_ids[order])
            out_s.append(score[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        score = group["score"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -score))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": group["doc_id"].take(pa.array(order)),
                "score": group["score"].take(pa.array(order)),
            }
        )

    return (
        ds.map_batches(score_block, batch_format="pyarrow", batch_size=None)
        .groupby("query_id")
        .map_groups(finalize, batch_format="pyarrow")
    )
