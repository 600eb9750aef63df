"""Minimal AVI (RIFF) container for MJPEG video — public-spec only
(Microsoft RIFF/AVI file format; OpenDML index conventions are not
needed for the sequential read this module does).

MJPEG-in-AVI is the simplest real video format a crawl pipeline meets:
each video frame is an ordinary baseline-JFIF image stored as a ``00dc``
chunk inside the ``movi`` list, so the existing :mod:`functions.jpeg`
codec handles all pixel work and this module only walks the container.

- :func:`iter_avi_mjpeg_frames` yields each frame's raw JPEG bytes
  lazily — a frame COUNT pass touches only chunk headers (seek-skip per
  frame, no entropy decode), which is what the video sampler's two-pass
  shape needs (count → pick k → decode only the picked frames).
- :func:`avi_info` reads the ``avih``/``strh``/``strf`` headers:
  (width, height, n_frames, fps, fourcc).
- :func:`encode_avi_mjpeg` writes frames (encoded via
  ``functions.jpeg.encode_jpeg``) into a spec-shaped AVI with an
  ``idx1`` index — the test/sink side of the round-trip, and the shape
  real players accept.

Like the PNG/GIF/JPEG/WAV siblings: pure numpy/stdlib, per-payload cost
is fine because corpus parallelism is across videos in the FrameSampler
actor pool (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sI")


def _pad(n: int) -> int:
    """RIFF chunks are word-aligned: odd sizes carry one pad byte."""
    return n + (n & 1)


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"bad AVI: {msg}")


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in
    data[start:end]; LIST chunks yield their list type as fourcc
    ``LIST:<type>`` with the payload covering the list body AFTER the
    type word. Truncated trailing chunks stop iteration (crawl payloads
    are routinely cut mid-transfer)."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = _HDR.unpack_from(data, pos)
        body = pos + 8
        if fourcc == b"LIST" and size >= 4 and body + 4 <= end:
            # a LIST cut mid-body still holds complete leading sub-chunks:
            # clamp so the recursive walk keeps them (crawl payloads are
            # routinely truncated mid-transfer)
            yield b"LIST:" + data[body : body + 4], body + 4, min(size, end - body) - 4
        elif body + size > end:
            return  # truncated leaf chunk: keep what parsed
        else:
            yield fourcc, body, size
        pos = body + _pad(size)


def avi_info(data: bytes) -> dict:
    """Header metadata: {width, height, n_frames, fps, fourcc}. ``fps``
    comes from the stream header's rate/scale (falls back to the main
    header's microseconds-per-frame); ``n_frames`` is the HEADER count —
    :func:`iter_avi_mjpeg_frames` is the ground truth for data chunks."""
    _expect(is_avi(data), "not a RIFF/AVI payload")
    info = {"width": 0, "height": 0, "n_frames": 0, "fps": 0.0, "fourcc": ""}
    us_per_frame = 0
    for cc, off, size in _iter_chunks(data, 12, len(data)):
        if cc != b"LIST:hdrl":
            continue
        for c2, o2, s2 in _iter_chunks(data, off, off + size):
            if c2 == b"avih" and s2 >= 40:
                us_per_frame = struct.unpack_from("<I", data, o2)[0]
                info["n_frames"] = struct.unpack_from("<I", data, o2 + 16)[0]
                info["width"] = struct.unpack_from("<I", data, o2 + 32)[0]
                info["height"] = struct.unpack_from("<I", data, o2 + 36)[0]
            elif c2 == b"LIST:strl":
                for c3, o3, s3 in _iter_chunks(data, o2, o2 + s2):
                    if c3 == b"strh" and s3 >= 32:
                        info["fourcc"] = data[o3 + 4 : o3 + 8].decode(
                            "ascii", "replace"
                        )
                        scale = struct.unpack_from("<I", data, o3 + 20)[0]
                        rate = struct.unpack_from("<I", data, o3 + 24)[0]
                        if scale:
                            info["fps"] = rate / scale
        break
    if not info["fps"] and us_per_frame:
        info["fps"] = 1_000_000.0 / us_per_frame
    return info


def count_avi_frames(data: bytes) -> int:
    """Number of video-frame chunks, walking chunk HEADERS only — no frame
    bytes are sliced/copied (what the sampler's count pass wants; a
    300-frame clip would otherwise copy its whole ``movi`` body just to be
    counted). Same stream/codec validation as the frame iterator."""
    _expect(is_avi(data), "not a RIFF/AVI payload")
    fourcc = avi_info(data)["fourcc"].upper()
    _expect(fourcc in ("MJPG", "DMB1", ""), f"stream codec {fourcc!r} is not MJPEG")
    n = 0
    for cc, off, size in _iter_chunks(data, 12, len(data)):
        if cc != b"LIST:movi":
            continue
        for c2, _o2, s2 in _iter_chunks(data, off, off + size):
            if c2 in (b"00dc", b"00db") and s2 > 0:
                n += 1
        break
    return n


def iter_avi_mjpeg_frames(data: bytes):
    """Yield raw JPEG bytes per video frame (``00dc``/``00db`` chunks of
    stream 0 in the ``movi`` list), lazily — header-only walking until a
    frame is consumed. Non-MJPEG streams raise (callers sniff first via
    :func:`avi_info`; the FrameSampler maps that to its on_error policy)."""
    _expect(is_avi(data), "not a RIFF/AVI payload")
    fourcc = avi_info(data)["fourcc"].upper()
    _expect(fourcc in ("MJPG", "DMB1", ""), f"stream codec {fourcc!r} is not MJPEG")
    for cc, off, size in _iter_chunks(data, 12, len(data)):
        if cc != b"LIST:movi":
            continue
        for c2, o2, s2 in _iter_chunks(data, off, off + size):
            if c2 in (b"00dc", b"00db") and s2 > 0:
                yield data[o2 : o2 + s2]
        break


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """uint8 frames (H,W) / (H,W,3), all same shape -> MJPEG AVI bytes.
    Each frame is JPEG-encoded via ``functions.jpeg.encode_jpeg`` (so the
    round-trip through :func:`iter_avi_mjpeg_frames` + ``decode_jpeg`` is
    bit-deterministic), with a standard ``idx1`` chunk index."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    shape0 = frames[0].shape[:2]
    if any(f.shape[:2] != shape0 for f in frames):
        raise ValueError("all frames must share one (H, W)")
    h, w = int(shape0[0]), int(shape0[1])
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cc: bytes, body: bytes) -> bytes:
        return _HDR.pack(cc, len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<10I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec (advisory)
        0,                         # dwPaddingGranularity
        0x10,                      # AVIF_HASINDEX
        len(payloads), 0,          # dwTotalFrames, dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        w, h,
    ) + struct.pack("<4I", 0, 0, 0, 0)  # dwReserved[4]
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I", 0)        # dwFlags
        + struct.pack("<HH", 0, 0)    # wPriority, wLanguage
        + struct.pack("<I", 0)        # dwInitialFrames
        + struct.pack("<II", 1, max(fps, 1))  # dwScale, dwRate
        + struct.pack("<III", 0, len(payloads), max_bytes)
        + struct.pack("<iI", -1, 0)   # dwQuality, dwSampleSize
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(b"00dc", p) for p in payloads]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: offsets are relative to the start of the 'movi' list type word
    idx_entries = []
    off = 4
    for p in payloads:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += 8 + _pad(len(p))
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return _HDR.pack(b"RIFF", len(riff_body)) + riff_body
