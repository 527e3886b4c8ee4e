"""Timewise (error estimation / convergence) hand values from the
reference's own unit tests (src/analysis/timewise.rs:594-648,
estimate_error and test_prefix_average)."""

import numpy as np

from gorder_tpu.core.timewise import estimate_error, prefix_average

_SCALE = 1_000_000


def test_prefix_average_hand_values():
    # timewise.rs:625 test_prefix_average (epsilon 1e-5)
    order = np.array([10, 12, 15, 10, 9, 12, 98432], np.int64) * _SCALE
    samples = np.array([13, 15, 20, 12, 11, 14, 98432], np.int64)
    expected = [0.769230769, 0.785714286, 0.770833333, 0.783333333,
                0.788732394, 0.8, 0.999827441]
    got = prefix_average(order, samples)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_estimate_error_hand_value():
    # timewise.rs:594 estimate_error: 17 frames, 5 blocks of 3 (the last
    # two frames are dropped), sample std of the block means = 0.0514468
    order = np.array([10, 15, 18, 12, 14, 15, 16, 20, 21, 18, 9, 11, 13,
                      14, 19, 16, 17], np.int64) * _SCALE
    samples = np.array([10, 12, 15, 11, 13, 11, 11, 17, 18, 15, 8, 10, 12,
                        13, 17, 14, 15], np.int64)
    got = estimate_error(order, samples, 5)
    np.testing.assert_allclose(got, 0.0514468, atol=1e-6)


def test_estimate_error_empty():
    # timewise.rs:619 estimate_error_empty_structure → None
    assert np.isnan(estimate_error(np.array([], np.int64),
                                   np.array([], np.int64), 5))
