"""Unit tests: math3d against hand values and the independent numpy oracle."""

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu import math3d
from reference_renderer import look_to_lh as np_look_to_lh
from reference_renderer import perspective_fov_lh as np_perspective


def test_perspective_matches_oracle():
    m = math3d.perspective_fov_lh(np.pi / 4, 1.5, 0.1, 100.0)
    mn = np_perspective(np.pi / 4, 1.5, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(m), mn, rtol=1e-6)


def test_perspective_depth_range():
    near, far = 0.1, 100.0
    m = math3d.perspective_fov_lh(np.pi / 4, 1.0, near, far)
    for z, expect in [(near, 0.0), (far, 1.0)]:
        p = jnp.asarray([0.0, 0.0, z])
        h = math3d.transform_points_h(p, m)
        ndc_z = h[2] / h[3]
        np.testing.assert_allclose(float(ndc_z), expect, atol=1e-6)


def test_look_to_matches_oracle(rng):
    eye = rng.normal(size=3)
    fwd = rng.normal(size=3)
    up = np.asarray([0.0, 1.0, 0.0])
    m = math3d.look_to_lh(jnp.asarray(eye, jnp.float32), jnp.asarray(fwd, jnp.float32), jnp.asarray(up, jnp.float32))
    mn = np_look_to_lh(eye, fwd, up)
    np.testing.assert_allclose(np.asarray(m), mn, atol=1e-5)


def test_look_to_basic():
    # camera at origin looking +z: view is identity
    m = math3d.look_to_lh(
        jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.0, 1.0, 0.0])
    )
    np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-6)


def test_translation_row_vector():
    m = math3d.translation(1.0, 2.0, 3.0)
    p = math3d.transform_points(jnp.asarray([10.0, 20.0, 30.0]), m)
    np.testing.assert_allclose(np.asarray(p), [11.0, 22.0, 33.0], atol=1e-6)


def test_yaw_pitch_to_cartesian():
    v = math3d.yaw_pitch_to_cartesian(jnp.asarray(0.0), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(v), [0, 0, 1], atol=1e-7)
    v = math3d.yaw_pitch_to_cartesian(jnp.asarray(np.pi / 2), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(v), [1, 0, 0], atol=1e-7)
    v = math3d.yaw_pitch_to_cartesian(jnp.asarray(0.0), jnp.asarray(np.pi / 2))
    np.testing.assert_allclose(np.asarray(v), [0, 1, 0], atol=1e-7)


def test_inverse_roundtrip(rng):
    m = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32) + 4 * jnp.eye(4)
    np.testing.assert_allclose(np.asarray(m @ math3d.inverse(m)), np.eye(4), atol=1e-4)
