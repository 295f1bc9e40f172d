"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as `binary` columns with a
`media_type` string column. Decode / resize / feature-extraction run as
actor-pool map_batches stages with small batch sizes (large payloads).

The actual image/audio decoding libraries are NOT available in this
environment, so `RealMediaDecoder` raises NotImplementedError — it is
an explicitly marked STUB. `FakeMediaDecoder` is a deterministic
stand-in (feature = parsed header + byte statistics) so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.large_binary()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("mean_byte", pa.float64()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class RealMediaDecoder:
    """STUB: real decoder (PIL / libav) — not available in this image."""

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401

            self.available = True
        except ImportError:
            self.available = False

    def decode(self, payload: bytes, media_type: str):
        if not self.available:
            raise NotImplementedError(
                "image/audio decode libraries are not installed in this "
                "environment; use FakeMediaDecoder for plumbing tests"
            )
        raise NotImplementedError("real decode path not wired in this sandbox")


class FakeMediaDecoder:
    """Deterministic stand-in decoder: derives (width, height) from the
    synthetic 8-byte header and features from byte statistics."""

    def decode(self, payload: bytes, media_type: str):
        if len(payload) >= 8:
            width = int.from_bytes(payload[0:4], "little") & 0xFFFF
            height = int.from_bytes(payload[4:8], "little") & 0xFFFF
            body = np.frombuffer(payload, dtype=np.uint8, offset=8)
        else:
            width = height = 0
            body = np.frombuffer(payload, dtype=np.uint8)
        mean = float(body.mean()) if body.size else 0.0
        # 16-bin byte histogram as the "feature vector"
        hist = np.bincount(body >> 4, minlength=16).astype(np.float32)
        total = hist.sum()
        feature = (hist / total) if total else hist
        return width, height, len(payload), mean, feature


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize a binary media column.

    Use small batch_size (payloads are large) and concurrency sized to
    the node: ds.map_batches(MediaFeatureExtractor, batch_size=64,
    concurrency=(1, 8), batch_format="pyarrow").
    """

    def __init__(self, use_real_decoder: bool = False):
        self.decoder = RealMediaDecoder() if use_real_decoder else FakeMediaDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        types = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = {name: [] for name in FEATURE_SCHEMA.names}
        for mid, mtype, payload in zip(ids, types, payloads):
            width, height, n_bytes, mean, feature = self.decoder.decode(payload, mtype)
            rows["media_id"].append(mid)
            rows["media_type"].append(mtype)
            rows["width"].append(width)
            rows["height"].append(height)
            rows["n_bytes"].append(n_bytes)
            rows["mean_byte"].append(mean)
            rows["feature"].append(feature.tolist())
        return pa.table(rows, schema=FEATURE_SCHEMA)


def synthetic_media_dataset(n_items: int = 200, seed: int = 42):
    """Deterministic fake media table (binary payloads with an 8-byte
    width/height header) for exercising the plumbing."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_items):
        w = int(rng.integers(16, 512))
        h = int(rng.integers(16, 512))
        body = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8)
        payload = w.to_bytes(4, "little") + h.to_bytes(4, "little") + body.tobytes()
        rows.append(
            {
                "media_id": i,
                "media_type": "image/fake" if i % 3 else "audio/fake",
                "payload": payload,
            }
        )
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def media_from_documents(ds):
    """Derive a deterministic media table from the documents table:
    payload = 8-byte width/height header (pure functions of doc_id, so
    a SQL oracle can recompute them) + the document's UTF-8 bytes as
    the body. Exercises the same decode plumbing against real input
    rows instead of a synthetic table."""

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        widths = (ids * 7) % 496 + 16
        heights = (ids * 13) % 496 + 16
        payloads = [
            int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little") + t.encode()
            for w, h, t in zip(widths, heights, texts)
        ]
        types = np.where(ids % 3 == 0, "audio/fake", "image/fake")
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "media_type": pa.array(types, type=pa.string()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_no", pa.int32()),
        ("n_frames", pa.int32()),
        ("frame", pa.large_binary()),
    ]
)


class FrameSampler:
    """Actor-pool stage: treat the payload body as fixed-size frames
    and emit every `stride`-th one (video frame-sampling plumbing; a
    real build would decode containers here — the Ray-side shape is
    identical). One input row fans out to ceil(n_frames/stride) rows,
    so batches stay small like every large-binary stage."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in FRAME_SCHEMA.names}
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for mid, payload in zip(ids, payloads):
            body = payload[8:] if len(payload) >= 8 else payload
            n_frames = len(body) // self.frame_bytes
            for f in range(0, n_frames, self.stride):
                rows["media_id"].append(mid)
                rows["frame_no"].append(f)
                rows["n_frames"].append(n_frames)
                rows["frame"].append(
                    body[f * self.frame_bytes : (f + 1) * self.frame_bytes]
                )
        return pa.table(rows, schema=FRAME_SCHEMA)


def sample_frames(ds, frame_bytes: int = 256, stride: int = 4, concurrency=(1, 8)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(frame_bytes, stride),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )


class FakeResizer:
    """Actor-pool stage: 'resize' by integer byte subsampling and
    rewrite the header dims (the real PIL path is the stub in
    RealMediaDecoder; this keeps schema/actor plumbing identical)."""

    def __init__(self, factor: int = 2):
        assert factor >= 1
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        types = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = []
        for payload in payloads:
            if len(payload) >= 8:
                w = int.from_bytes(payload[0:4], "little") // self.factor
                h = int.from_bytes(payload[4:8], "little") // self.factor
                body = payload[8 :: self.factor]
                out.append(w.to_bytes(4, "little") + h.to_bytes(4, "little") + body)
            else:
                out.append(payload)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "media_type": pa.array(types, type=pa.string()),
                "payload": pa.array(out, type=pa.large_binary()),
            },
            schema=MEDIA_SCHEMA,
        )


def resize_media(ds, factor: int = 2, concurrency=(1, 8)):
    return ds.map_batches(
        FakeResizer,
        fn_constructor_args=(factor,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def extract_media_features(ds, use_real_decoder: bool = False, concurrency=(1, 8)):
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=(use_real_decoder,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
