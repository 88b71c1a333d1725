"""Native host kernels vs cv2/numpy oracles."""

import numpy as np
import pytest

from gaussctrl_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (no g++)")


def test_undistort_matches_cv2_same_K():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(96, 128, 3)).astype(np.float32)
    # smooth it so bilinear-vs-bilinear comparison is meaningful
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    fx, fy, cx, cy = 110.0, 108.0, 64.0, 48.0
    dist6 = np.array([0.08, -0.02, 0.001, 0.0, 0.002, -0.001])
    out = native.undistort(img, fx, fy, cx, cy, dist6)

    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    d = np.array([dist6[0], dist6[1], dist6[4], dist6[5], dist6[2], dist6[3],
                  0.0, 0.0])
    ref = cv2.undistort(img, K, d, None, K)
    # compare away from borders (border handling differs)
    a, b = out[10:-10, 10:-10], ref[10:-10, 10:-10]
    assert np.abs(a - b).mean() < 5e-3
    assert np.abs(a - b).max() < 0.15


def test_undistort_identity_when_no_distortion():
    img = np.random.default_rng(1).uniform(size=(32, 40, 3)).astype(np.float32)
    out = native.undistort(img, 50, 50, 20, 16, np.zeros(6))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_knn_matches_bruteforce():
    pts = np.random.default_rng(2).normal(size=(3000, 3)).astype(np.float32)
    d = native.knn_mean_dist(pts, 3)
    for i in np.random.default_rng(3).integers(0, 3000, 20):
        ref = np.sort(np.linalg.norm(pts - pts[i], axis=1))[1:4].mean()
        assert abs(d[i] - ref) < 1e-4, (i, d[i], ref)


def test_resize_matches_cv2_linear():
    import cv2

    img = np.random.default_rng(4).uniform(size=(64, 64, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    out = native.resize(img, 32, 48)
    ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out - ref).mean() < 2e-3
