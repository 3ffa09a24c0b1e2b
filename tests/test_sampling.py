"""Hemisphere-sampler statistics (tp/montecarlo.frag:49-89) and the
wrong-sampler foils as negative controls (SURVEY.md §4: the foils must FAIL
the tests that the correct sampler passes)."""
import numpy as np
import jax.numpy as jnp

from montecarlo_pathtracing_tpu.ops import rng, sampling


def _states(n, seed_pass=0):
    tc = jnp.stack(
        [jnp.linspace(0.01, 0.99, n), jnp.linspace(0.99, 0.01, n)], -1)
    return rng.srand(tc, seed_pass)


def test_sample_hemisphere_upper_and_normalized():
    st = _states(4096)
    d, _ = sampling.sample_hemisphere(st, roughness=0.7)
    v = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert (v[:, 2] > 0.0).all()          # local frame: upper hemisphere


def test_roughness_controls_concentration():
    """Low roughness -> samples hug the pole; high roughness -> spread.
    (matches the captures/ sampling screenshots at roughness 1/0.5/0.1)"""
    st = _states(8192)
    lo, _ = sampling.sample_hemisphere(st, roughness=0.1)
    hi, _ = sampling.sample_hemisphere(st, roughness=1.0)
    cz_lo = float(np.asarray(lo)[:, 2].mean())
    cz_hi = float(np.asarray(hi)[:, 2].mean())
    assert cz_lo > 0.99
    assert cz_hi < cz_lo - 0.1


def test_random_ray_oriented_about_d():
    st = _states(4096)
    d = jnp.broadcast_to(
        jnp.asarray(np.array([1.0, 2.0, -0.5], np.float32)
                    / np.linalg.norm([1.0, 2.0, -0.5])), (4096, 3))
    out, _ = sampling.random_ray(st, d, roughness=0.3)
    v = np.asarray(out)
    cos = v @ np.asarray(d[0])
    assert (cos > 0.0).mean() > 0.999     # concentrated about +d
    assert cos.mean() > 0.9


def test_orient_frame_orthonormal():
    d = jnp.asarray(np.random.RandomState(3).normal(size=(64, 3))
                    .astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    m = sampling.orient_frame(d)
    eye = jnp.einsum("nij,nik->njk", m, m)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(3), (64, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m[..., 2]), np.asarray(d),
                               atol=1e-6)


def test_schlick_limits():
    n = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    i = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)   # head-on: x = 0
    r = sampling.schlick(i, n, refract_ind=1.5)
    r0 = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
    assert np.isclose(float(r[0]), r0, atol=1e-6)
    g = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)   # grazing: x = 1
    r = sampling.schlick(g, n, refract_ind=1.5)
    assert np.isclose(float(r[0]), 1.0, atol=1e-6)


def test_wrong_samplers_fail_the_statistics():
    """Foil check: both deliberately-wrong samplers must violate what the
    correct sampler guarantees."""
    st = _states(8192)
    w1, _ = sampling.sample_hemisphere_wrong(st)       # normalize(u^3 in [0,1]^3)
    w2, _ = sampling.sample_hemisphere_wrong2(st)      # normalize(2u^3-1)
    # wrong1: all components positive -> z-mean far from the roughness-1
    # distribution AND confined to the positive octant
    v1 = np.asarray(w1)
    assert (v1 >= 0).all()                 # octant artifact
    # wrong2: full sphere -> z goes negative (not a hemisphere at all)
    v2 = np.asarray(w2)
    assert (v2[:, 2] < 0).mean() > 0.3


def test_masked_random_ray_matches_unmasked_where_active():
    st = _states(512)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (512, 3))
    mask = jnp.asarray((np.arange(512) % 3 == 0))
    full, st_full = sampling.random_ray(st, d, 0.5)
    part, st_part = sampling.random_ray_masked(st, d, 0.5, mask)
    np.testing.assert_array_equal(
        np.asarray(full)[np.asarray(mask)], np.asarray(part)[np.asarray(mask)])
    np.testing.assert_array_equal(
        np.asarray(st_part)[~np.asarray(mask)], np.asarray(st)[~np.asarray(mask)])
