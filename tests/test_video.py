"""AVI video ingestion (reference m_playType video mode, SLAM.cpp:288-309).

Covers: MJPEG round-trip through the pure-RIFF writer/reader, OpenCV
interop both directions, and the reference-parity property that a video
run produces the SAME trajectory as the equivalent %04d.jpg directory
(same JPEG payloads -> identical decoded frames -> identical filter)."""

import io as _io
import os

import numpy as np
import pytest

from cv_monoslam_tpu.io.video import (VideoSequence, index_avi_frames,
                                      write_mjpeg_avi)


def _frames(n=5, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, h, w), dtype=np.uint8)


def test_mjpeg_roundtrip(tmp_path):
    frames = _frames()
    path = str(tmp_path / "seq.avi")
    write_mjpeg_avi(path, frames, quality=95)
    vs = VideoSequence(path)
    assert len(vs) == len(frames)
    for k in (0, 2, 4, 1):                    # random access order
        got = vs.get(k)
        assert got.shape == frames[k].shape
        err = np.abs(got - frames[k].astype(np.float32)).mean()
        assert err < 12.0, err                # JPEG-lossy bound


def test_opencv_reads_our_avi(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = _frames(3)
    path = str(tmp_path / "ours.avi")
    write_mjpeg_avi(path, frames, quality=95)
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    ok, f0 = cap.read()
    assert ok and f0.shape[:2] == frames[0].shape


def test_we_read_opencv_avi(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = _frames(3)
    path = str(tmp_path / "cv.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                        (frames.shape[2], frames.shape[1]))
    assert w.isOpened()
    for f in frames:
        w.write(np.stack([f] * 3, axis=-1))
    w.release()
    assert len(index_avi_frames(path)) == 3
    vs = VideoSequence(path)
    got = vs.get(1)
    assert np.abs(got - frames[1].astype(np.float32)).mean() < 12.0


def test_video_run_matches_image_dir(tmp_path, tiny_sequence):
    """Same JPEG payloads as a directory and as an .avi -> identical
    trajectories (the reference's two play modes are interchangeable)."""
    from PIL import Image

    from cv_monoslam_tpu.api import SlamSession
    from cv_monoslam_tpu.config import SlamConfig
    from cv_monoslam_tpu.io.dataset import ImageSequence

    seq, track, gt_xy, _ = tiny_sequence
    n_imgs = int(track.frame_id.max()) + 1
    payloads = []
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    h = w = None
    for i in range(n_imgs):
        frame = np.clip(seq.get(i), 0, 255).astype(np.uint8)
        h, w = frame.shape
        buf = _io.BytesIO()
        Image.fromarray(frame, "L").convert("RGB").save(buf, format="JPEG",
                                                        quality=95)
        payloads.append(buf.getvalue())
        with open(img_dir / f"{i:04d}.jpg", "wb") as f:
            f.write(payloads[-1])
    avi = str(tmp_path / "seq.avi")
    write_mjpeg_avi(avi, payloads=payloads, size=(w, h))

    cfg = SlamConfig(max_landmarks=12, max_new_per_frame=6,
                     max_detections=24)
    s_dir = SlamSession(cfg, ImageSequence(
        pattern=str(img_dir / "%04d.jpg")), track)
    s_vid = SlamSession(cfg, VideoSequence(avi), track)
    t_dir = s_dir.run(8)
    t_vid = s_vid.run(8)
    np.testing.assert_allclose(t_vid, t_dir, rtol=0, atol=1e-6)
