"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with sidecar
metadata (mime, width/height, duration…). The Ray-side plumbing — schema,
actor-pool stage shape, batch sizing for large binaries, output layout —
is real and tested. Codec status:

- ``DecodeImage(fake=False)`` / ``ResizeImage(fake=False)`` /
  ``DecodeAudio(fake=False)`` run REAL decodes for JPEG (baseline AND
  progressive), PNG, GIF, uncompressed 24-bit BMP, and PCM WAV via the
  pure-stdlib codecs in ``functions/codecs`` (numpy DCT + zlib + LZW +
  ``wave`` — round-trip property-tested). Rows whose payload is not one
  of those formats are SKIPPED (the at-scale policy: a corrupt crawl
  object must not kill the stage) — pass ``on_error="raise"`` to fail
  instead. A production deployment swaps in a SIMD codec (PIL/ffmpeg)
  inside the same actor ``__init__`` seam.
- ``FrameSampler(fake=False)`` runs REAL frame sampling for animated GIF
  (disposal-composited frames via ``functions/gif``, k picked evenly,
  re-encoded as PNG payloads). MP3 and MP4/H.264 genuinely need codec
  libraries this container lacks — those stay honest ``fake=True`` stubs,
  and ``fake=True`` remains available on every stage for shape-testing
  with synthetic payloads.
- Batch sizes for binary payloads must be SMALL (payload × batch_size ×
  concurrency bounds worker heap); the defaults assume ~1 MB payloads.

At 100 TB these stages are the GPU/codec actor pools; the contract is:
binary in, fixed-schema features out, keys carried through.
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

    ``fake=False`` (default) decodes PNG/BMP payloads for real
    (``functions/codecs``): true width/height, and the embedding is the
    deterministic aHash-style mean-centered grayscale thumbnail
    fingerprint. Undecodable payloads are skipped (``on_error="raise"``
    to fail). ``fake=True`` derives deterministic pseudo-features from the
    payload bytes — the shape-testing path for formats without a codec.
    A heavier model/codec belongs here in ``__init__`` (once per actor).
    """

    def __init__(
        self, fake: bool = False, embed_dim: int = 8, on_error: str = "skip"
    ):
        self.fake = fake
        self.embed_dim = embed_dim
        if on_error not in ("skip", "raise"):
            raise ValueError(f"on_error must be skip|raise, got {on_error!r}")
        self.on_error = on_error

    def _real(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
            image_embedding,
        )

        urls, mimes, widths, heights, sizes, checks, embs = (
            [], [], [], [], [], [], [],
        )
        all_checks = (
            stable_hash64(
                [bytes(p) for p in batch.column("payload").to_pylist()]
            ).astype(np.int64)
            >> 1
        )
        for i, (url, payload) in enumerate(
            zip(batch.column("url").to_pylist(),
                batch.column("payload").to_pylist())
        ):
            payload = bytes(payload)
            try:
                if payload[:8] == b"\x89PNG\r\n\x1a\n":
                    img, mime = decode_png(payload), "image/png"
                elif payload[:2] == b"BM":
                    img, mime = decode_bmp(payload), "image/bmp"
                elif payload[:3] == b"\xff\xd8\xff":
                    img, mime = decode_jpeg(payload), "image/jpeg"
                elif payload[:6] in (b"GIF87a", b"GIF89a"):
                    img, mime = decode_gif(payload), "image/gif"
                else:
                    raise ValueError("unrecognized image format")
            except Exception:
                if self.on_error == "raise":
                    raise
                continue
            urls.append(url)
            mimes.append(mime)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            sizes.append(len(payload))
            checks.append(int(all_checks[i]))
            embs.append(image_embedding(img, self.embed_dim).tolist())
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            return self._real(batch)
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
    """Image resize stage.

    ``fake=False``: consumes the MEDIA table (url, mime, payload), decodes
    PNG/BMP, nearest-neighbor resizes to the target dims, and re-encodes
    as PNG — payload in, payload out, the real thumbnailing dataflow
    (undecodable rows skipped, matching DecodeImage's at-scale policy).
    ``fake=True``: consumes decoded FEATURE rows and rewrites the dims so
    the contract (dims change, keys carried) stays testable without a
    payload."""

    def __init__(self, width: int, height: int, fake: bool = True):
        self.fake = fake
        self.width = width
        self.height = height

    def _real(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
            encode_png,
            resize_nearest,
        )

        urls, mimes, payloads = [], [], []
        for url, payload in zip(
            batch.column("url").to_pylist(), batch.column("payload").to_pylist()
        ):
            payload = bytes(payload)
            try:
                if payload[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(payload)
                elif payload[:2] == b"BM":
                    img = decode_bmp(payload)
                elif payload[:3] == b"\xff\xd8\xff":
                    img = decode_jpeg(payload)
                elif payload[:6] in (b"GIF87a", b"GIF89a"):
                    img = decode_gif(payload)
                else:
                    continue
            except Exception:
                continue
            urls.append(url)
            mimes.append("image/png")
            payloads.append(encode_png(resize_nearest(img, self.height, self.width)))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "mime": pa.array(mimes, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            return self._real(batch)
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
    """Audio decode/feature stage (url, mime, payload) →
    AUDIO_FEATURE_SCHEMA.

    ``fake=False``: decodes PCM WAV for real (``functions/codecs``) —
    true duration from frames/rate, features are the unit-norm
    log-segment-energy fingerprint; non-WAV rows are skipped
    (``on_error="raise"`` to fail). ``fake=True`` derives a deterministic
    duration estimate and feature vector from the payload bytes so batch
    sizing and schema are exercised without a codec (MP3/OGG etc.)."""

    def __init__(self, fake: bool = False, n_features: int = 13,
                 bytes_per_ms: int = 32, on_error: str = "skip"):
        self.fake = fake
        self.n_features = n_features
        self.bytes_per_ms = bytes_per_ms
        if on_error not in ("skip", "raise"):
            raise ValueError(f"on_error must be skip|raise, got {on_error!r}")
        self.on_error = on_error

    def _real(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import audio_features, decode_wav

        urls, mimes, sizes, durs, checks, feats = [], [], [], [], [], []
        all_checks = (
            stable_hash64(
                [bytes(p) for p in batch.column("payload").to_pylist()]
            ).astype(np.int64)
            >> 1
        )
        for i, (url, payload) in enumerate(
            zip(batch.column("url").to_pylist(),
                batch.column("payload").to_pylist())
        ):
            payload = bytes(payload)
            try:
                samples, rate = decode_wav(payload)
            except Exception:
                if self.on_error == "raise":
                    raise
                continue
            urls.append(url)
            mimes.append("audio/wav")
            sizes.append(len(payload))
            durs.append(round(1000 * len(samples) / max(rate, 1)))
            checks.append(int(all_checks[i]))
            feats.append(audio_features(samples, self.n_features).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(mimes, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(durs, pa.int64()),
                pa.array(checks, pa.int64()),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            schema=AUDIO_FEATURE_SCHEMA,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            return self._real(batch)
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
    """Video frame-sampling stage: binary video → k evenly spaced frame
    payloads. One row in, ≤ k rows out (flat_map-shaped via map_batches).

    ``fake=False`` runs REAL sampling for the two motion formats decodable
    in this container: animated GIF (``functions/gif`` — frames are
    disposal-composited) and MJPEG-in-AVI (``functions/avi`` walks the
    RIFF container header-only; picked frames decode via
    ``functions/jpeg``). k frames are picked evenly across the animation
    and each is re-encoded as PNG (lossless) into ``frame_payload``.
    Other payloads are skipped (at-scale policy) or raised per
    ``on_error``. MP4/H.264 genuinely need a codec library; the same
    stage seam takes an ffmpeg-backed sampler in production.
    ``fake=True`` keeps the byte-slice stub for shape tests with
    synthetic payloads."""

    def __init__(self, k: int = 4, fake: bool = True, on_error: str = "skip"):
        if on_error not in ("skip", "raise"):
            raise ValueError("on_error must be 'skip' or 'raise'")
        self.k = k
        self.fake = fake
        self.on_error = on_error

    @staticmethod
    def _even_picks(n_frames: int, k: int) -> set[int]:
        return set(
            np.unique(
                np.linspace(0, n_frames - 1, num=min(k, n_frames))
                .round()
                .astype(np.int64)
            ).tolist()
        )

    def _real(self, batch: pa.Table) -> pa.Table:
        from ..functions.avi import count_avi_frames, is_avi, iter_avi_mjpeg_frames
        from ..functions.codecs import encode_png
        from ..functions.gif import _iter_raw_frames, decode_gif_frames
        from ..functions.jpeg import decode_jpeg

        urls, frames, idxs = [], [], []
        for url, payload in zip(
            batch.column("url").to_pylist(), batch.column("payload").to_pylist()
        ):
            payload = bytes(payload)
            try:
                if payload[:6] in (b"GIF87a", b"GIF89a"):
                    # count pass first: holding EVERY composited canvas of
                    # a 300-frame crawl GIF (x batch x actors) blows worker
                    # heaps; index grids live one at a time here, and the
                    # composite pass below keeps only the k picked frames
                    n_frames = sum(1 for _ in _iter_raw_frames(payload))
                    if n_frames == 0:
                        raise ValueError("GIF contains no image frame")
                    picks = self._even_picks(n_frames, self.k)
                    kept = [
                        f
                        for fi, f in enumerate(decode_gif_frames(payload))
                        if fi in picks
                    ]
                elif is_avi(payload):
                    # same two-pass shape: the count pass walks RIFF chunk
                    # headers only (no byte copies, no entropy decode), then
                    # exactly the k picked 00dc chunks pay the JPEG decode
                    n_frames = count_avi_frames(payload)
                    if n_frames == 0:
                        raise ValueError("AVI contains no video frame")
                    picks = self._even_picks(n_frames, self.k)
                    kept = [
                        decode_jpeg(jpg)
                        for fi, jpg in enumerate(iter_avi_mjpeg_frames(payload))
                        if fi in picks
                    ]
                else:
                    raise ValueError("not an animated-GIF or MJPEG-AVI payload")
            except Exception:
                if self.on_error == "raise":
                    raise
                continue
            for i, frame in enumerate(kept):
                urls.append(url)
                idxs.append(i)
                frames.append(encode_png(frame))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            return self._real(batch)
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


def sample_frames(
    ds, k: int = 4, batch_size: int = 8,
    concurrency: int | tuple = (1, 4), *, fake: bool = True,
):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k": k, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
