"""MJPEG-in-AVI container (functions/avi): header parse, lazy frame walk,
encoder round-trip, and the FrameSampler real-video path. Beyond-reference
multimodal operator (the reference engine has no video handling); public
RIFF/AVI spec only."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ertransfer_ray.functions.avi import (
    avi_info,
    encode_avi_mjpeg,
    is_avi,
    iter_avi_mjpeg_frames,
)
from ertransfer_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _frames(n=5, h=16, w=24, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_roundtrip_frames_bit_identical_to_jpeg():
    """Container adds nothing lossy: each extracted frame's bytes are the
    exact encode_jpeg output, so decode matches frame-by-frame."""
    frames = _frames(5)
    avi = encode_avi_mjpeg(frames, fps=12, quality=80)
    assert is_avi(avi)
    got = list(iter_avi_mjpeg_frames(avi))
    assert len(got) == 5
    for f, jpg in zip(frames, got):
        assert jpg == encode_jpeg(f, quality=80)
        assert np.array_equal(decode_jpeg(jpg), decode_jpeg(encode_jpeg(f, quality=80)))


def test_header_metadata():
    frames = _frames(7, h=10, w=14)
    info = avi_info(encode_avi_mjpeg(frames, fps=25))
    assert (info["width"], info["height"]) == (14, 10)
    assert info["n_frames"] == 7
    assert info["fourcc"] == "MJPG"
    assert info["fps"] == pytest.approx(25.0)


def test_truncated_tail_keeps_parsed_frames():
    """Crawl payloads are routinely cut mid-transfer: a truncated AVI
    yields the frames whose chunks fully landed, no raise."""
    frames = _frames(4)
    avi = encode_avi_mjpeg(frames)
    full = list(iter_avi_mjpeg_frames(avi))
    # cut inside the LAST frame's chunk body
    cut = avi.rfind(full[-1]) + len(full[-1]) // 2
    got = list(iter_avi_mjpeg_frames(avi[:cut]))
    assert got == full[:3]


def test_rejects_non_avi_and_non_mjpeg():
    with pytest.raises(ValueError):
        list(iter_avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE"))
    avi = bytearray(encode_avi_mjpeg(_frames(2)))
    i = avi.find(b"MJPG")  # strh fccHandler
    avi[i : i + 4] = b"H264"
    with pytest.raises(ValueError):
        list(iter_avi_mjpeg_frames(bytes(avi)))
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([np.zeros((4, 4), np.uint8), np.zeros((6, 4), np.uint8)])


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**16),
)
def test_property_roundtrip(n, h, w, fps, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    avi = encode_avi_mjpeg(frames, fps=fps)
    info = avi_info(avi)
    assert info["n_frames"] == n and (info["width"], info["height"]) == (w, h)
    got = list(iter_avi_mjpeg_frames(avi))
    assert [decode_jpeg(g).shape for g in got] == [(h, w, 3)] * n


def test_frame_sampler_real_avi():
    """FrameSampler(fake=False) on MJPEG-AVI: k evenly spaced frames out as
    PNG, exact pixels of the decoded picked JPEGs; junk rows skipped."""
    from ertransfer_ray.functions.codecs import decode_png
    from ertransfer_ray.stages.multimodal import FrameSampler

    frames = [np.full((8, 8, 3), 40 * i, np.uint8) for i in range(6)]
    avi = encode_avi_mjpeg(frames, quality=95)
    batch = pa.table(
        {
            "url": pa.array(["http://a/clip.avi", "http://a/not-video"]),
            "mime": pa.array(["video/x-msvideo", "application/octet-stream"]),
            "payload": pa.array([avi, b"junk"], pa.binary()),
        }
    )
    out = FrameSampler(k=3, fake=False)(batch)
    assert out.num_rows == 3
    rows = out.to_pylist()
    assert [r["frame_index"] for r in rows] == [0, 1, 2]
    jpgs = list(iter_avi_mjpeg_frames(avi))
    picks = [0, 2, 5]  # linspace(0, 5, 3) rounded
    for row, pick in zip(rows, picks):
        assert np.array_equal(decode_png(row["frame_payload"]), decode_jpeg(jpgs[pick]))


def test_frame_sampler_raise_policy_covers_avi():
    from ertransfer_ray.stages.multimodal import FrameSampler

    bad = pa.table(
        {
            "url": pa.array(["u"]),
            "mime": pa.array(["video/x-msvideo"]),
            "payload": pa.array([b"RIFF\x04\x00\x00\x00AVI "], pa.binary()),
        }
    )
    with pytest.raises(ValueError):
        FrameSampler(k=2, fake=False, on_error="raise")(bad)
    assert FrameSampler(k=2, fake=False)(bad).num_rows == 0


def test_sniff_mime_avi():
    from ertransfer_ray.functions.codecs import sniff_mime

    assert sniff_mime(encode_avi_mjpeg(_frames(1))) == "video/x-msvideo"


def test_count_avi_frames_matches_iterator():
    from ertransfer_ray.functions.avi import count_avi_frames

    frames = _frames(6)
    avi = encode_avi_mjpeg(frames)
    assert count_avi_frames(avi) == len(list(iter_avi_mjpeg_frames(avi))) == 6
    # truncated payloads count exactly the frames the iterator yields
    full = list(iter_avi_mjpeg_frames(avi))
    cut = avi.rfind(full[-1]) + len(full[-1]) // 2
    assert count_avi_frames(avi[:cut]) == 5
    with pytest.raises(ValueError):
        count_avi_frames(b"not avi")
