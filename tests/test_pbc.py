"""PBC helpers: min-image, wrap, and the Refined Bai–Breen group center
(gorder CHANGELOG §1.0.0; groan_rs ≥0.9 center algorithm)."""

import numpy as np

from gorder_tpu.core.pbc import circular_mean_cog, min_image, naive_cog, wrap


def test_min_image_and_wrap():
    box = np.array([10.0, 10.0, 10.0], np.float32)
    d = np.array([[6.0, -6.0, 0.5]], np.float32)
    np.testing.assert_allclose(np.asarray(min_image(d, box)),
                               [[-4.0, 4.0, 0.5]], atol=1e-6)
    x = np.array([[12.5, -0.5, 3.0]], np.float32)
    np.testing.assert_allclose(np.asarray(wrap(x, box)),
                               [[2.5, 9.5, 3.0]], atol=1e-6)


def test_refined_cog_recovers_exact_center():
    """A dispersed cluster straddling the box boundary: the refined
    estimate must equal the true (unwrapped) arithmetic mean, which the
    plain circular mean only approximates."""
    rng = np.random.default_rng(3)
    box = np.array([10.0, 10.0, 10.0], np.float32)
    true_center = np.array([0.3, 9.8, 5.0], np.float32)  # near two faces
    cloud = true_center + rng.uniform(-2.4, 2.4, (400, 3)).astype(np.float32)
    exact = wrap(np.asarray(cloud.mean(0), np.float32), box)
    points = np.asarray(wrap(cloud, box))
    mask = np.ones(len(points), np.float32)
    got = np.asarray(circular_mean_cog(points, mask, box))
    np.testing.assert_allclose(got, np.asarray(exact), atol=2e-5)


def test_refined_cog_weighted_subset():
    box = np.array([8.0, 8.0, 8.0], np.float32)
    pts = np.array([[1.0, 1.0, 1.0], [3.0, 1.0, 1.0], [7.5, 4.0, 4.0]],
                   np.float32)
    mask = np.array([1.0, 1.0, 0.0], np.float32)  # third point ignored
    got = np.asarray(circular_mean_cog(pts, mask, box))
    np.testing.assert_allclose(got, [2.0, 1.0, 1.0], atol=1e-5)


def test_naive_cog():
    pts = np.array([[0.0, 0.0, 0.0], [2.0, 4.0, 6.0]], np.float32)
    mask = np.ones(2, np.float32)
    np.testing.assert_allclose(np.asarray(naive_cog(pts, mask)),
                               [1.0, 2.0, 3.0], atol=1e-6)
