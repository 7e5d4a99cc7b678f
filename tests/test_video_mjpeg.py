"""MJPEG-in-AVI: the REAL video decode path (round-2 verdict item #6).

Kernel round-trips (mux → demux → JFIF decode) plus the Spark operator over
generated AVI bytes; QVID stays accepted, other containers still raise.
"""

import numpy as np
import pandas as pd
import pytest

from quadtree_block_compression_spark.kernels.avi import (
    encode_mjpeg_avi, is_avi, mjpeg_frames)
from quadtree_block_compression_spark.kernels.jfif import decode_jfif
from quadtree_block_compression_spark.kernels.similarity import psnr


def _frames(n=7, h=24, w=40, seed=3):
    base = (np.linspace(10, 220, w)[None, :, None]
            * np.ones((h, 1, 3))).astype(np.float64)
    return [np.clip(base + 3.0 * f, 0, 255).astype(np.uint8) for f in range(n)]


def test_avi_roundtrip_kernel():
    frames = _frames()
    data = encode_mjpeg_avi(frames, fps=12, quality=90)
    assert is_avi(data)
    payloads = mjpeg_frames(data)
    assert len(payloads) == len(frames)
    for orig, p in zip(frames, payloads):
        assert p[:2] == b"\xff\xd8"
        dec = decode_jfif(p)
        assert dec.shape == orig.shape
        assert psnr(orig, dec) >= 40


def test_avi_odd_payload_padding():
    """RIFF word-alignment: odd-length JPEG chunks must still demux."""
    frames = _frames(n=3, h=17, w=19)  # odd dims → odd-ish payload sizes
    data = encode_mjpeg_avi(frames, fps=5, quality=75)
    assert len(mjpeg_frames(data)) == 3


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        mjpeg_frames(b"RIFFxxxxWAVEfmt ")
    with pytest.raises(ValueError):
        mjpeg_frames(b"\x00" * 32)


def test_video_frame_sample_real_avi(spark):
    from quadtree_block_compression_spark.operators.multimodal import (
        make_mjpeg_avi_clip, video_frame_sample)
    vid = spark.createDataFrame(pd.DataFrame(
        {"video_id": [1, 2],
         "bytes": [make_mjpeg_avi_clip(1, nf=12), make_mjpeg_avi_clip(2, nf=12)]}))
    rows = video_frame_sample(vid, every_n=5).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r)
    assert set(by_vid) == {1, 2}
    for vid_id, rs in by_vid.items():
        assert sorted(r.frame_idx for r in rs) == [0, 5, 10]
        for r in rs:
            assert (r.w, r.h) == (48, 32)
            # gradient mean drifts +4 per frame — decoded means must track it
            assert 0 <= r.mean_r <= 255
            assert r.frame_png[:8] == b"\x89PNG\r\n\x1a\n"
    # later frames are brighter (the +4f drift survives the lossy round-trip)
    m = {r.frame_idx: r.mean_g for r in by_vid[1]}
    assert m[10] > m[0]


def test_video_frame_sample_still_accepts_qvid_and_rejects_others(spark):
    from quadtree_block_compression_spark.operators.multimodal import (
        make_fake_video, video_frame_sample)
    vid = spark.createDataFrame(pd.DataFrame(
        {"video_id": [5], "bytes": [make_fake_video(5, nf=30)]}))
    frames = video_frame_sample(vid, every_n=10).collect()
    assert [r.frame_idx for r in frames] == [0, 10, 20]
    bad = spark.createDataFrame(pd.DataFrame(
        {"video_id": [9], "bytes": [b"\x00\x00\x00\x20ftypisom"]}))
    with pytest.raises(Exception, match="NotImplementedError|inter-frame"):
        video_frame_sample(bad).collect()
