"""Measure the image-decode actor pool at scale: synthesize a corpus of
JPEG payloads (the dominant crawl format), run ``decode_images``
(fake=False — real entropy decode + IDCT + embedding) at one or more CPU
counts, and report images/s. This substantiates the codec cost model in
``functions/jpeg.py``: per-image decode is Python-entropy-bound, so
throughput scales ACROSS images via the actor pool.

``--video`` benches the OTHER real media pool: MJPEG-AVI clips through
``sample_frames(fake=False)`` — the header-only count pass plus k picked
JPEG decodes per clip — reporting clips/s and sampled frames/s.

Usage: python tools/bench_multimodal.py [n_images=4000] [cpus=32[,8]]
       python tools/bench_multimodal.py --video [n_clips=800] [cpus=32[,8]]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build_corpus(n_images: int) -> str:
    """n deterministic photo-like 96x128 JPEGs as parquet (url, mime,
    payload); idempotent per n."""
    out = f"/tmp/graft_bench/media_{n_images}.parquet"
    if os.path.exists(out):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ertransfer_ray.functions.jpeg import encode_jpeg

    os.makedirs("/tmp/graft_bench", exist_ok=True)
    yy, xx = np.mgrid[0:96, 0:128]
    rows_url, rows_payload = [], []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        base = 128 + 60 * np.sin((yy + i) / 37.0) + 50 * np.cos((xx + 2 * i) / 53.0)
        img = np.clip(
            base[..., None] + rng.normal(0, 10, (96, 128, 3)), 0, 255
        ).astype(np.uint8)
        rows_url.append(f"http://media.test/{i}.jpg")
        rows_payload.append(encode_jpeg(img, quality=80, subsample=True))
    t = pa.table(
        {
            "url": pa.array(rows_url),
            "mime": pa.array(["image/jpeg"] * n_images),
            "payload": pa.array(rows_payload, pa.binary()),
        }
    )
    pq.write_table(t, out)
    return out


def _leg(num_cpus: int, parquet: str) -> dict:
    code = f"""
import json, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import sys; sys.path.insert(0, {REPO!r})
import ray.data as rd
from ertransfer_ray.stages.multimodal import decode_images
ds = rd.read_parquet({parquet!r})
n = ds.count()
t0 = time.perf_counter()
out = decode_images(ds, fake=False, concurrency=(1, {num_cpus}),
                    batch_size=32).count()
dt = time.perf_counter() - t0
print(json.dumps({{"decoded": out, "sec": round(dt, 3)}}))
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _build_video_corpus(n_clips: int, frames_per_clip: int = 12) -> str:
    """n deterministic MJPEG-AVI clips (96x128, ~12 frames) as parquet;
    idempotent per n."""
    out = f"/tmp/graft_bench/video_{n_clips}.parquet"
    if os.path.exists(out):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ertransfer_ray.functions.avi import encode_avi_mjpeg

    os.makedirs("/tmp/graft_bench", exist_ok=True)
    yy, xx = np.mgrid[0:96, 0:128]
    rows_url, rows_payload = [], []
    rng = np.random.default_rng(1)
    for i in range(n_clips):
        frames = []
        for f in range(frames_per_clip):
            base = 128 + 60 * np.sin((yy + i + 3 * f) / 37.0) + 50 * np.cos(
                (xx + 2 * i + f) / 53.0
            )
            frames.append(
                np.clip(
                    base[..., None] + rng.normal(0, 10, (96, 128, 3)), 0, 255
                ).astype(np.uint8)
            )
        rows_url.append(f"http://media.test/{i}.avi")
        rows_payload.append(encode_avi_mjpeg(frames, fps=10, quality=80))
    t = pa.table(
        {
            "url": pa.array(rows_url),
            "mime": pa.array(["video/x-msvideo"] * n_clips),
            "payload": pa.array(rows_payload, pa.binary()),
        }
    )
    pq.write_table(t, out)
    return out


def _video_leg(num_cpus: int, parquet: str, k: int = 4) -> dict:
    code = f"""
import json, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import sys; sys.path.insert(0, {REPO!r})
import ray.data as rd
from ertransfer_ray.stages.multimodal import sample_frames
ds = rd.read_parquet({parquet!r})
n = ds.count()
t0 = time.perf_counter()
out = sample_frames(ds, k={k}, batch_size=8, fake=False,
                    concurrency=(1, {num_cpus})).count()
dt = time.perf_counter() - t0
print(json.dumps({{"clips": n, "frames": out, "sec": round(dt, 3)}}))
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    argv = [a for a in sys.argv[1:] if a != "--video"]
    video = "--video" in sys.argv
    if video:
        n_clips = int(argv[0]) if argv else 800
        cpus = [int(c) for c in (argv[1] if len(argv) > 1 else "32").split(",")]
        parquet = _build_video_corpus(n_clips)
        result = {"metric": "mjpeg_avi_sample_clips_per_sec", "n_clips": n_clips}
        for c in cpus:
            leg = min((_video_leg(c, parquet) for _ in range(2)),
                      key=lambda r: r["sec"])
            result[f"sec_{c}"] = leg["sec"]
            result[f"clips_per_sec_{c}"] = round(leg["clips"] / leg["sec"], 1)
            result[f"frames_per_sec_{c}"] = round(leg["frames"] / leg["sec"], 1)
            result["frames"] = leg["frames"]
        print(json.dumps(result))
        return
    n_images = int(argv[0]) if argv else 4000
    cpus = [int(c) for c in (argv[1] if len(argv) > 1 else "32").split(",")]
    parquet = _build_corpus(n_images)
    result = {"metric": "jpeg_decode_images_per_sec", "n_images": n_images}
    for c in cpus:
        leg = min((_leg(c, parquet) for _ in range(2)), key=lambda r: r["sec"])
        result[f"sec_{c}"] = leg["sec"]
        result[f"images_per_sec_{c}"] = round(leg["decoded"] / leg["sec"], 1)
        result["decoded"] = leg["decoded"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
