"""Course generators, path buffer, and the in-jit reference resampler."""

import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.paths import (
    PathBuffer,
    circle_course,
    dkan_course,
    filtered_square_course,
    resample_reference,
    spline_resample_course,
    sum_of_cosines_course,
    waypoint_course,
)
from ccv_mppi_path_tracker_tpu.paths.resample import nearest_index


def test_sum_of_cosines_starts_at_origin_offset():
    # y(0) = sum A_k cos(delta_k) - sum A_k; with delta=pi/2 -> y(0) ~ 0
    c = sum_of_cosines_course(
        amplitudes=(1.0, 0.0, 0.0),
        frequencies=(0.25, 0.0, 0.0),
        deltas=(np.pi / 2, np.pi / 2, np.pi / 2),
        course_length=8.0,
    )
    np.testing.assert_allclose(c[0], [0.0, -1.0], atol=1e-12)
    assert c.shape[0] == 80
    # x is arc-parameter spaced
    np.testing.assert_allclose(np.diff(c[:, 0]), 0.1, rtol=1e-9)


def test_circle_course_radius():
    c = circle_course(radius=5.0, resolution=0.1)
    center = np.array([0.0, 5.0])
    r = np.hypot(*(c - center).T)
    np.testing.assert_allclose(r, 5.0, rtol=1e-9)
    # arc-length spacing ~ resolution
    seg = np.hypot(*np.diff(c, axis=0).T)
    np.testing.assert_allclose(seg, 0.1, rtol=1e-3)


def test_dkan_course_shape():
    c = dkan_course(resolution=0.1)
    # corridor legs: 17.7 + 8.0 + 17.7 meters at 0.1 m spacing
    assert abs(len(c) - (177 + 80 + 177)) <= 3
    np.testing.assert_allclose(c[0], [0.0, 0.0])


def test_filtered_square_course_smooth():
    c = filtered_square_course(length=10.0, amplitude=2.0)
    assert np.max(np.abs(np.diff(c[:, 1]))) < 0.1  # low-passed: no jumps
    assert np.max(c[:, 1]) < 3.0


def test_waypoint_course_straight():
    c = waypoint_course([[0, 0], [1, 0]], resolution=0.25)
    np.testing.assert_allclose(c[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(c[:, 0], [0.0, 0.25, 0.5, 0.75])


def test_spline_resample_passes_near_waypoints():
    pts = [[0, 0], [1, 1], [2, 0], [3, 1]]
    c = spline_resample_course(pts, resolution=0.05)
    for p in pts[:-1]:
        d = np.min(np.hypot(c[:, 0] - p[0], c[:, 1] - p[1]))
        assert d < 0.06


def test_path_buffer_padding_and_nearest():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    path = PathBuffer.from_points(pts, 1.0, capacity=8, dtype=np.float64)
    assert path.xy.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(path.xy[3:]), [[2.0, 0.0]] * 5)
    assert int(nearest_index(path, jnp.array([1.2, 0.5]))) == 1
    # reference quirk: all points farther than 100 m -> index 0
    assert int(nearest_index(path, jnp.array([500.0, 0.0]))) == 0


def test_resample_reference_matches_naive():
    course = sum_of_cosines_course(course_length=15.0)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float64)
    pos = jnp.array([3.05, course[30, 1]])
    ref = resample_reference(path, pos, v_ref=0.8, dt=0.1, horizon=10)
    # naive: index step = 0.8*0.1/0.1 = 0.8 -> floor(i*0.8)
    cur = int(np.argmin(np.hypot(*(course - np.asarray(pos)).T)))
    idx = cur + np.floor(np.arange(10) * 0.8).astype(int)
    np.testing.assert_allclose(np.asarray(ref.xy), course[idx], rtol=1e-12)
    # yaws are segment headings
    expect_yaw = np.arctan2(
        course[idx[1:], 1] - course[idx[:-1], 1],
        course[idx[1:], 0] - course[idx[:-1], 0],
    )
    np.testing.assert_allclose(np.asarray(ref.yaw[:-1]), expect_yaw, rtol=1e-9)


def test_resample_reference_clamps_at_course_end():
    course = np.stack([np.arange(20) * 0.1, np.zeros(20)], -1)
    path = PathBuffer.from_points(course, 0.1, dtype=np.float64)
    ref = resample_reference(path, jnp.array([1.9, 0.0]), 1.0, 0.5, 8)
    np.testing.assert_allclose(np.asarray(ref.xy), [[1.9, 0.0]] * 8)


def test_circle_course_legacy_step_quirk():
    """The reference's circle branch steps the parameter by
    (resolution/2)*pi*R per sample (operator-precedence quirk,
    src/reference_path_creator.cpp:58); legacy_step=True reproduces it."""
    c = circle_course(radius=2.0, resolution=0.1, legacy_step=True)
    # step = 0.05*pi*2 = 0.1*pi rad; 200*pi span -> 2000 points (+1)
    assert abs(len(c) - 2001) <= 1
    # all points still on the circle
    r = np.hypot(c[:, 0], c[:, 1] - 2.0)
    np.testing.assert_allclose(r, 2.0, rtol=1e-9)
