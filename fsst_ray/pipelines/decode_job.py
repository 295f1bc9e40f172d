"""Decode pass + round-trip verification."""

from __future__ import annotations

from ..stages.decoder import dataset_checksum, decode_chunks_batch
from ..state import manifest as mf


def read_encoded(out_dir: str):
    """Ray Dataset of encoded-chunk rows.

    Encoded chunk rows are a few MB each, so the default 128 MB block
    target would bundle many bucket files into one read task and cap
    decode parallelism; split to roughly one block per bucket file.
    """
    import pathlib

    import ray
    import ray.data as rd

    path = mf.chunks_dir(out_dir)
    nbytes = sum(f.stat().st_size for f in pathlib.Path(path).glob("*.parquet"))
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # bytes-aware block count (same rule as read_parquet_bundled but
    # 4x CPUs): decode blocks are heavy (payload decode writes ~2x the
    # encoded bytes), so ~2 blocks/CPU quantizes badly — a 33-block
    # read on 16 CPUs gives some workers 3 blocks and a 50% tail
    # (measured: the 16-CPU decode leg swung 10.5-18.9 s on it)
    blocks = max(4 * cpus, -(-nbytes // (256 << 20)))
    return rd.read_parquet(
        str(path),
        file_extensions=["parquet"],
        override_num_blocks=blocks,
    )


def decode_dataset(encoded_or_dir):
    """Encoded chunks -> original (doc_id, tokens, n_tok, source) rows."""
    encoded = (
        read_encoded(encoded_or_dir) if isinstance(encoded_or_dir, str) else encoded_or_dir
    )
    return encoded.map_batches(decode_chunks_batch, batch_format="pyarrow", batch_size=None)


def verify_roundtrip(original_ds, encoded_or_dir) -> dict:
    """Streaming checksum comparison: decoded content == original content
    (order-insensitive, per-row order-sensitive within tokens)."""
    left = dataset_checksum(original_ds)
    right = dataset_checksum(decode_dataset(encoded_or_dir))
    return {
        "match": left == right,
        "original": left,
        "decoded": right,
    }
