"""Document-corpus sources beyond parquet: JSONL and CSV ingestion.

JSONL is the de-facto interchange format for web-scale text corpora;
this reader normalizes it to the documents schema the operators in
fsst_ray.functions expect (doc_id:int64, text:string [, lang, source]),
assigning stable doc_ids from a content+line hash when the input has
none. Reading streams through ray.data.read_json (one block per file
bundle); normalization is a vectorized map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
    ]
)


def read_documents_jsonl(path: str, text_key: str = "text", id_key: str = "doc_id"):
    """Ray Dataset over JSONL document files, normalized to
    DOCUMENTS_SCHEMA. Missing doc_ids get a deterministic 63-bit
    content hash (stable across reruns and repartitioning); missing
    lang/source become empty strings."""
    import ray.data as rd

    ds = rd.read_json(path, file_extensions=["jsonl", "json"])
    return _normalized(ds, text_key, id_key)


def _normalized(ds, text_key: str, id_key: str):
    import polars as pl

    def normalize(batch: pa.Table) -> pa.Table:
        names = set(batch.schema.names)
        if text_key not in names:
            raise ValueError(f"rows lack a '{text_key}' field: {sorted(names)}")
        text = batch[text_key]
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        if text.type != pa.string():
            text = text.cast(pa.string())
        n = batch.num_rows
        hashed = (
            pl.from_arrow(text).hash(seed=17).to_numpy().astype(np.uint64)
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        ).astype(np.int64)
        if id_key in names:
            col = batch[id_key]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            # null ids (e.g. an empty CSV field) would round-trip
            # through float NaN to INT64_MIN and collide — fall back to
            # the content hash per-row instead
            ids = np.where(
                np.asarray(col.is_null()),
                hashed,
                col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64),
            )
        else:
            ids = hashed

        def opt(col: str) -> pa.Array:
            if col in names:
                c = batch[col]
                c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                return c.cast(pa.string())
            return pa.array([""] * n, type=pa.string())

        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": text,
                "lang": opt("lang"),
                "source": opt("source"),
            },
            schema=DOCUMENTS_SCHEMA,
        )

    return ds.map_batches(normalize, batch_format="pyarrow")


def read_documents_csv(path: str, text_key: str = "text", id_key: str = "doc_id"):
    """Ray Dataset over CSV document files, normalized to
    DOCUMENTS_SCHEMA with the same rules as the JSONL reader (shared
    normalizer: content-hash ids when absent, empty lang/source).
    Reading streams through ray.data.read_csv."""
    import ray.data as rd

    ds = rd.read_csv(path, file_extensions=["csv"])
    return _normalized(ds, text_key, id_key)
