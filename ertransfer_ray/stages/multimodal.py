"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with sidecar
metadata (mime, width/height, duration…). The Ray-side plumbing — schema,
actor-pool stage shape, batch sizing for large binaries, output layout —
is real and tested; the codec work itself is STUBBED because no image/audio
libraries exist in this container:

- ``DecodeImage`` raises ``NotImplementedError`` unless ``fake=True``, in
  which case it produces a deterministic fake decode (dimensions + checksum
  derived from the bytes) exercising the identical dataflow.
- Batch sizes for binary payloads must be SMALL (payload × batch_size ×
  concurrency bounds worker heap); the defaults assume ~1 MB payloads.

At 100 TB these stages are the GPU/codec actor pools; the contract here is
what matters: binary in, fixed-schema features out, keys carried through.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash64


IMAGE_FEATURE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
    ]
)


def make_media_table(urls: list[str], payloads: list[bytes], mime: str = "image/fake") -> pa.Table:
    """Construct the canonical media input table (url, mime, payload)."""
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "mime": pa.array([mime] * len(urls), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class DecodeImage:
    """Actor-pool decode stage (callable class → one decoder per actor).

    Real implementation would hold the codec/model handle from ``__init__``
    (load once per actor); ``__call__`` decodes a batch. Without codec
    libraries, ``fake=True`` derives deterministic pseudo-features from the
    payload bytes so the pipeline shape is fully testable.
    """

    def __init__(self, fake: bool = False, embed_dim: int = 8):
        self.fake = fake
        self.embed_dim = embed_dim
        if not fake:
            # real path: import PIL / torchvision / ffmpeg here, once per actor
            raise NotImplementedError(
                "no image codec available in this environment; construct with "
                "fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        urls = batch.column("url").to_pylist()
        mimes = batch.column("mime").to_pylist()
        n = len(payloads)
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
        checks = stable_hash64([bytes(p) for p in payloads]).astype(np.int64) >> 1
        # fake "decode": dims and a unit-norm embedding seeded by the checksum
        widths = (checks % 1920).astype(np.int32)
        heights = (checks % 1080).astype(np.int32)
        embs = []
        for c in checks:
            rng = np.random.default_rng(int(c) & 0x7FFFFFFF)
            v = rng.standard_normal(self.embed_dim).astype(np.float32)
            embs.append((v / max(np.linalg.norm(v), 1e-9)).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(mimes, pa.string()),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(sizes, pa.int64()),
                pa.array(checks, pa.int64()),
                pa.array(embs, pa.list_(pa.float32())),
            ],
            schema=IMAGE_FEATURE_SCHEMA,
        )


def decode_images(
    ds,
    fake: bool = True,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 32,
    embed_dim: int = 8,
):
    """Media table → image-feature table via the decode actor pool.

    ``batch_size`` is deliberately tiny: binary payloads are large, and
    batch_size × concurrency payloads live in worker heaps simultaneously.
    """
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake, "embed_dim": embed_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImage:
    """Image resize stage shape: decoded feature rows → fixed target dims.

    Real implementation holds the resampling kernel per actor; the stub
    recomputes the deterministic fake features at the target size so the
    contract (dims change, keys/checksum carried, embedding dim preserved)
    is fully testable."""

    def __init__(self, width: int, height: int, fake: bool = True):
        if not fake:
            raise NotImplementedError("no image codec in this environment")
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {c: batch.column(c) for c in batch.column_names}
        out["width"] = pa.array([self.width] * n, pa.int32())
        out["height"] = pa.array([self.height] * n, pa.int32())
        return pa.table(out)


def resize_images(ds, width: int, height: int, batch_size: int = 64,
                  concurrency: int | tuple = (1, 4)):
    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mime", pa.string()),
        ("n_bytes", pa.int64()),
        ("duration_ms", pa.int64()),
        ("checksum", pa.int64()),
        ("features", pa.list_(pa.float32())),
    ]
)


class DecodeAudio:
    """Audio decode/feature stage shape (url, mime, payload) →
    AUDIO_FEATURE_SCHEMA. Real path would hold the codec + feature model
    (e.g. an MFCC pipeline) per actor; the stub derives a deterministic
    duration estimate and a unit-norm feature vector from the payload bytes
    so batch sizing and schema are exercised for real."""

    def __init__(self, fake: bool = False, n_features: int = 13,
                 bytes_per_ms: int = 32):
        self.n_features = n_features
        self.bytes_per_ms = bytes_per_ms
        if not fake:
            # real path: import soundfile / torchaudio / ffmpeg here, once
            raise NotImplementedError(
                "no audio codec available in this environment; construct "
                "with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
        checks = stable_hash64([bytes(p) for p in payloads]).astype(np.int64) >> 1
        feats = []
        for c in checks:
            rng = np.random.default_rng(int(c) & 0x7FFFFFFF)
            v = rng.standard_normal(self.n_features).astype(np.float32)
            feats.append((v / max(np.linalg.norm(v), 1e-9)).tolist())
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("mime"),
                pa.array(sizes, pa.int64()),
                pa.array(sizes // self.bytes_per_ms, pa.int64()),
                pa.array(checks, pa.int64()),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            schema=AUDIO_FEATURE_SCHEMA,
        )


def decode_audio(ds, fake: bool = True, concurrency: int | tuple = (1, 4),
                 batch_size: int = 16, n_features: int = 13):
    """Media table → audio-feature table; tiny batches (large payloads ×
    batch_size × concurrency bound worker heaps)."""
    return ds.map_batches(
        DecodeAudio,
        fn_constructor_kwargs={"fake": fake, "n_features": n_features},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sampling stage shape: binary video → k evenly spaced
    frame payloads (stub: slices of the byte stream). One row in, k rows out
    (flat_map-shaped via map_batches)."""

    def __init__(self, k: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError("no video codec in this environment")
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, frames, idxs = [], [], []
        for url, payload in zip(
            batch.column("url").to_pylist(), batch.column("payload").to_pylist()
        ):
            n = max(len(payload), 1)
            step = max(n // self.k, 1)
            for i in range(self.k):
                urls.append(url)
                idxs.append(i)
                frames.append(bytes(payload[i * step : i * step + min(step, 4096)]))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds, k: int = 4, batch_size: int = 8, concurrency: int | tuple = (1, 4)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
