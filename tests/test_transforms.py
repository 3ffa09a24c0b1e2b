"""Transform/GLSL-math layer (gl_eigen.{h,cpp} semantics)."""
import numpy as np
import jax.numpy as jnp

from montecarlo_pathtracing_tpu.utils import transforms as tf


def test_translate_scale_rotate_compose():
    m = tf.translate(1, 2, 3) @ tf.scale(2.0) @ tf.rotate_z(90)
    p = tf.apply(m, (1, 0, 0))
    np.testing.assert_allclose(p, [1.0, 4.0, 3.0], atol=1e-5)


def test_rotate_axis_matches_euler():
    np.testing.assert_allclose(
        tf.rotate(37.0, (0, 0, 1)), tf.rotate_z(37.0), atol=1e-6)
    np.testing.assert_allclose(
        tf.rotate(-12.0, (1, 0, 0)), tf.rotate_x(-12.0), atol=1e-6)


def test_inverse_roundtrip():
    m = tf.translate(5, -3, 2) @ tf.rotate_y(33) @ tf.scale(2, 3, 4)
    np.testing.assert_allclose(m @ tf.inverse(m), np.eye(4), atol=1e-5)


def test_reflect_glsl_semantics():
    i = jnp.array([[1.0, -1.0, 0.0]], jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    r = tf.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r[0]), [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_glsl_builtin():
    n = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    i = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)   # head-on
    out = tf.refract_glsl(i, n, 1.5)
    np.testing.assert_allclose(np.asarray(out[0]), [0, 0, -1], atol=1e-6)
    # TIR from dense medium at grazing angle -> vec3(0)
    g = jnp.array([[0.9, 0.0, -np.sqrt(1 - 0.81)]], jnp.float32)
    out = tf.refract_glsl(g, n, 1.5)
    np.testing.assert_allclose(np.asarray(out[0]), [0, 0, 0], atol=1e-6)


def test_refract_host_reference_quirks():
    """Host refract (gl_eigen.h:149-162): ratio IS eta, reflect fallback on
    TIR, normalized output, handles flipped N."""
    n = np.array([0.0, 0.0, 1.0], np.float32)
    i = np.array([0.6, 0.0, -0.8], np.float32)
    out = tf.refract_host(i, n, 1.0 / 1.5)
    assert np.isclose(np.linalg.norm(out), 1.0, atol=1e-6)
    assert out[2] < 0
    # TIR -> reflect
    g = np.array([0.9, 0.0, -np.sqrt(1 - 0.81)], np.float32)
    out = tf.refract_host(g, n, 1.5)
    np.testing.assert_allclose(out, tf.reflect_host(g, n), atol=1e-6)


def test_transform_point_dir_broadcast():
    m = jnp.asarray(tf.translate(1, 0, 0) @ tf.scale(2.0))
    p = jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tf.transform_point(m, p)), [[3, 2, 2], [1, 0, 0]],
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tf.transform_dir(m, p)), [[2, 2, 2], [0, 0, 0]],
        atol=1e-6)


def test_normalize_matches_glsl():
    v = jnp.array([[3.0, 4.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tf.normalize(v)[0]), [0.6, 0.8, 0.0], atol=1e-6)
