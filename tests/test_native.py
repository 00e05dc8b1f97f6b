"""Native C++ host-runtime (native/cvms_runtime.cpp) vs Python fallbacks.

Covers the reference's ingestion/recording semantics (SLAM.cpp:363-543,
3499-3603) through the ctypes bindings: odometry preprocessing parity,
JPEG grayscale decode, the threaded prefetcher, and the text recorder.
"""

import os

import numpy as np
import pytest

from cv_monoslam_tpu.io import native
from cv_monoslam_tpu.io.dataset import (load_odometry_file,
                                        parse_odometry_text,
                                        preprocess_odometry)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def _write_odo(path, rows):
    with open(path, "w") as f:
        for (i, t, x, y, th) in rows:
            f.write(f"{i} : {t} {x} {y} {th}\n")


def test_native_odometry_matches_python(tmp_path):
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.uniform(0, 0.03, 60))
    y = np.cumsum(rng.uniform(0, 0.02, 60))
    th = np.cumsum(rng.uniform(-0.2, 0.9, 60))
    rows = [(i, 0.1 * i, x[i], y[i], th[i]) for i in range(60)]
    p = tmp_path / "odo.txt"
    _write_odo(p, rows)

    ids_n, xy_n, th_n, rd_n = native.load_odometry(str(p))
    track = load_odometry_file(str(p))

    np.testing.assert_array_equal(ids_n, track.frame_id)
    np.testing.assert_allclose(xy_n, track.xy, rtol=0, atol=1e-12)
    np.testing.assert_allclose(th_n, track.theta, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(rd_n, track.redirect)


def test_native_odometry_min_step_filter(tmp_path):
    # rows below the 0.01 m min-step must be dropped (SLAM.cpp:419-432)
    rows = [(0, 0.0, 0.0, 0.0, 0.0),
            (1, 0.1, 0.001, 0.001, 0.0),    # dropped
            (2, 0.2, 0.05, 0.0, 0.0),
            (3, 0.3, 0.052, 0.001, 0.0),    # dropped
            (4, 0.4, 0.10, 0.0, 2.0)]       # kept + redirect (|dth|>45deg)
    p = tmp_path / "odo.txt"
    _write_odo(p, rows)
    ids, xy, th, rd = native.load_odometry(str(p))
    assert list(ids) == [0, 2, 4]
    assert rd.tolist() == [False, False, True]


def test_native_jpeg_decode_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), np.uint8)
    p = tmp_path / "0000.jpg"
    Image.fromarray(img, mode="L").save(p, quality=95)

    got = native.decode_jpeg_gray(str(p))
    want = np.asarray(Image.open(p).convert("L"), np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1.0)


def test_native_prefetcher_order_and_content(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    frames = []
    for i in range(6):
        img = rng.integers(0, 256, (32, 40), np.uint8)
        Image.fromarray(img, mode="L").save(
            tmp_path / f"{i:04d}.jpg", quality=100)
        frames.append(img)

    pf = native.NativePrefetcher(str(tmp_path / "%04d.jpg"),
                                 np.arange(6), width=40, height=32, depth=3)
    for i in range(6):
        got = pf.next()
        assert got is not None and got.shape == (32, 40)
        # quality-100 jpeg of gray image is near-lossless
        assert np.abs(got - frames[i]).mean() < 3.0
    assert pf.next() is None
    pf.close()


def test_native_recorder_format(tmp_path):
    rp = tmp_path / "RobotPath.txt"
    fp = tmp_path / "FeaturesInfo.txt"
    rec = native.NativeRecorder(str(rp), str(fp))
    rec.record_robot(3, (0.1, 0.2), (0.11, 0.19),
                     np.array([[1e-4, 0.0], [0.0, 2e-4]]))
    rec.record_features(np.array([7, 8]),
                        np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
                        np.array([1, 0], np.uint8))
    rec.close()

    rows = np.loadtxt(rp).reshape(-1, 9)
    assert rows[0, 0] == 3
    np.testing.assert_allclose(rows[0, 1:5], [0.1, 0.2, 0.11, 0.19])
    np.testing.assert_allclose(rows[0, 5:], [1e-4, 0.0, 0.0, 2e-4])

    frows = np.loadtxt(fp).reshape(-1, 4)
    assert frows.shape == (1, 4)          # only the valid landmark
    np.testing.assert_allclose(frows[0], [7, 1.0, 2.0, 3.0])


def test_parse_odometry_text_python_oracle():
    text = "0 : 0.0 1.0 2.0 0.5\nbad line\n1 : 0.1 1.5 2.5 0.6\n"
    rows = parse_odometry_text(text)
    assert rows.shape == (2, 4)
    track = preprocess_odometry(rows)
    assert len(track) == 2
