"""Differentiable path: finite-difference checks of pixel gradients w.r.t.
albedo / emissivity / roughness / IOR, and a tiny inverse-rendering fit
(SURVEY.md §4 'Gradient tests'; BASELINE config 4)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.render.camera import default_rt_camera, camera_rays
from montecarlo_pathtracing_tpu.render.diff import (
    SceneParams, params_of, render_mean, pixel_grads, inverse_render_fit)


@pytest.fixture(scope="module")
def setup():
    dev = compile_scene(scenes.build("box_diffuse"))
    w, h = 16, 12
    proj, view = default_rt_camera(w, h)
    origin, dirs, tc = camera_rays(proj, view, w, h)
    return dev, origin, dirs.reshape(-1, 3), tc.reshape(-1, 2)


# NB: paths that exhaust the bounce cap return BLACK (the reference quirk,
# tp/montecarlo.frag:178), so in the closed box scene only paths that reach
# the light carry any signal — gradient tests need enough bounces/passes to
# be non-vacuous (asserted below).
N_PASSES, N_BOUNCES = 2, 6


def _mean_lum(dev, params, origin, dirs, tc):
    return float(render_mean(dev, params, origin, dirs, tc,
                             N_PASSES, N_BOUNCES).mean())


def _fd_check(dev, origin, dirs, tc, mutate, grad_pick, eps, rtol):
    p0 = params_of(dev)
    g = pixel_grads(dev, p0, origin, dirs, tc, n_passes=N_PASSES,
                    nb_bounces=N_BOUNCES)
    analytic = float(grad_pick(g))
    f_plus = _mean_lum(dev, mutate(p0, +eps), origin, dirs, tc)
    f_minus = _mean_lum(dev, mutate(p0, -eps), origin, dirs, tc)
    fd = (f_plus - f_minus) / (2 * eps)
    assert np.isfinite(analytic)
    assert analytic != 0.0, "vacuous gradient test (no light-carrying path)"
    assert abs(analytic - fd) <= rtol * max(abs(fd), 1e-4), (
        f"analytic {analytic} vs fd {fd}")


def test_grad_albedo(setup):
    dev, origin, dirs, tc = setup
    # red channel of the floor quad (prim after emissive sort; use a quad)
    idx = 1

    def mutate(p, e):
        return p._replace(color=p.color.at[idx, 0].add(e))

    _fd_check(dev, origin, dirs, tc, mutate,
              lambda g: g.color[idx, 0], eps=1e-2, rtol=0.05)


def test_grad_emissivity_and_light_scale(setup):
    dev, origin, dirs, tc = setup
    emissive_idx = 0   # emissives sorted first

    def mutate(p, e):
        return p._replace(mat=p.mat.at[emissive_idx, 2].add(e))

    _fd_check(dev, origin, dirs, tc, mutate,
              lambda g: g.mat[emissive_idx, 2], eps=1e-2, rtol=0.05)

    # light_scale must equal emissivity-grad x emissivity (chain rule)
    p0 = params_of(dev)
    g = pixel_grads(dev, p0, origin, dirs, tc, n_passes=N_PASSES,
                    nb_bounces=N_BOUNCES)
    assert float(g.light_scale) != 0.0


def test_grad_roughness_finite(setup):
    """Roughness grads exist through the spec exponent; with detached
    sampling the direction term is excluded, so FD only loosely brackets
    the analytic value — assert finiteness and sign-scale sanity."""
    dev, origin, dirs, tc = setup
    p0 = params_of(dev)
    g = pixel_grads(dev, p0, origin, dirs, tc, n_passes=N_PASSES,
                    nb_bounces=N_BOUNCES)
    assert np.isfinite(np.asarray(g.mat)).all()
    assert float(np.abs(np.asarray(g.mat)[:, 1]).max()) > 0.0


def test_grad_ior_finite(setup):
    dev, origin, dirs, tc = setup
    p0 = params_of(dev)
    g = pixel_grads(dev, p0, origin, dirs, tc, n_passes=N_PASSES,
                    nb_bounces=N_BOUNCES)
    assert np.isfinite(float(g.refract_ind))


def test_inverse_rendering_recovers_albedo(setup):
    """Config-4 miniature: perturb one cube's albedo, recover it."""
    dev, origin, dirs, tc = setup
    p_true = params_of(dev)
    target = render_mean(dev, p_true, origin, dirs, tc, 2, 6)

    # find a white cube prim (type CUBE = 2 in the groups)
    cube_prim = int(np.asarray(dev.group_prim[dev.group_codes.index(2)])[0])
    p_wrong = p_true._replace(
        color=p_true.color.at[cube_prim, :3].set(
            jnp.array([0.1, 0.6, 0.2])))

    p_fit, losses = inverse_render_fit(
        dev, target, origin, dirs, tc, prim_ids=[cube_prim],
        steps=60, lr=5e-2, n_passes=2, nb_bounces=6,
        seed_params=p_wrong)
    assert losses[-1] < losses[0] * 0.2, losses[::10]
    got = np.asarray(p_fit.color[cube_prim, :3])
    want = np.asarray(p_true.color[cube_prim, :3])
    assert np.abs(got - want).max() < 0.15, (got, want)


@pytest.mark.slow
def test_grad_matches_cpu_oracle_fd(setup):
    """Pixel-gradient parity vs the INDEPENDENT CPU oracle: central
    finite differences of the oracle's render w.r.t. one albedo channel
    must match the framework's AD gradient (the BASELINE 'pixel-grad
    allclose vs CPU ref' metric). Identical RNG counters mean both sides
    integrate the same paths, so FD noise cancels."""
    from montecarlo_pathtracing_tpu.scene import scenes as sc
    from montecarlo_pathtracing_tpu.testing.cpu_ref import CPUReference
    from montecarlo_pathtracing_tpu.render.camera import default_rt_camera

    w, h, spp, bounces = 12, 10, 1, 6
    prims = sc.build("box_diffuse")
    dev = compile_scene(prims)          # sorts emissives in place
    proj, view = default_rt_camera(w, h)
    origin, dirs, tc = camera_rays(proj, view, w, h)
    dirs, tc = dirs.reshape(-1, 3), tc.reshape(-1, 2)

    idx, ch = 1, 0   # a wall quad's red channel
    g = pixel_grads(dev, params_of(dev), origin, dirs, tc,
                    n_passes=spp, nb_bounces=bounces)
    analytic = float(g.color[idx, ch])

    eps = 2e-2
    vals = []
    for sign in (+1.0, -1.0):
        oracle = CPUReference(prims)
        old = prims.prims[idx].color[ch]
        prims.prims[idx].color[ch] = np.float32(old + sign * eps)
        img = oracle.render(proj, view, w, h, spp, bounces, 1.0)
        prims.prims[idx].color[ch] = old
        vals.append(float(img.mean()))
    fd = (vals[0] - vals[1]) / (2 * eps)
    assert analytic != 0.0
    assert abs(analytic - fd) <= 0.15 * max(abs(fd), 1e-3), (
        f"AD {analytic} vs oracle FD {fd}")


def test_fast_path_grads_match_dense(setup):
    """The Pallas-route gradient (trace detached from the AD graph) must
    equal the dense-route gradient for every leaf whose value cannot
    move the hit geometry: color, mat, light_scale. (IOR keeps only its
    Schlick/attenuation term on the fast route — compared on an OPAQUE
    scene here, where the geometric term is exactly zero and the two
    routes must agree on refract_ind too.)"""
    import numpy as np
    from montecarlo_pathtracing_tpu.render.diff import (
        params_of, pixel_grads)

    dev, origin, dirs, tc = setup
    p = params_of(dev, refract_ind=1.3)
    g_dense = pixel_grads(dev, p, origin, dirs, tc, n_passes=2,
                          nb_bounces=5, use_pallas=False)
    # interpret mode: same kernel semantics without a TPU
    from montecarlo_pathtracing_tpu.render.diff import render_mean
    import jax

    def mean_lum(pp):
        img = render_mean(dev, pp, origin, dirs, tc, 2, 5, "montecarlo",
                          True, True)
        return img.mean()

    g_fast = jax.grad(mean_lum)(p)
    np.testing.assert_allclose(np.asarray(g_fast.color),
                               np.asarray(g_dense.color),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_fast.mat),
                               np.asarray(g_dense.mat),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fast.light_scale),
                               np.asarray(g_dense.light_scale),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_fast.refract_ind),
                               np.asarray(g_dense.refract_ind),
                               rtol=1e-4, atol=1e-7)
    # and the gradient must be nonzero somewhere (vacuity guard)
    assert float(np.abs(np.asarray(g_dense.color)).max()) > 0


def test_fast_path_ior_grad_documented_gap():
    """VERDICT round-2 weak #6: pin the fast-path IOR gradient to its
    DOCUMENTED behavior on a refractive scene so silent drift fails CI.

    The dense route carries the full refract_ind gradient (geometric
    term through the refraction march). The fast (Pallas) route detaches
    the trace, dropping the geometric term, and the reference's
    clamped-Schlick quirk (rs saturates to 1 for front-facing hits,
    tp/montecarlo.frag:91-98) zeroes the retained attenuation term — so
    the fast refract_ind gradient is expected to be ~0. Assert:
      (a) the dense gradient is nonzero (the test is not vacuous),
      (b) the fast gradient stays within the stated envelope
          |g_fast| <= 0.05 * |g_dense| + 1e-7 (i.e. 'absent', never
          'wrong sign with magnitude'),
      (c) inverse_render_fit auto-routes fit_ior through the dense path.
    """
    from montecarlo_pathtracing_tpu.models.montecarlo import raytrace

    dev = compile_scene(scenes.build("box_balls"))
    w, h = 24, 18
    proj, view = default_rt_camera(w, h)
    origin, dirs, tc = camera_rays(proj, view, w, h)
    dirs, tc = jnp.asarray(dirs.reshape(-1, 3)), jnp.asarray(
        tc.reshape(-1, 2))

    def lum(ior, pallas):
        img = raytrace(dev, origin, dirs, tc, 0, nb_bounces=6,
                       refract_ind=ior, detach_sampling=True,
                       use_pallas=pallas, pallas_interpret=pallas,
                       nondiff_trace=pallas)
        return img.mean()

    g_dense = float(jax.grad(lambda x: lum(x, False))(jnp.float32(1.35)))
    g_fast = float(jax.grad(lambda x: lum(x, True))(jnp.float32(1.35)))
    assert abs(g_dense) > 1e-7, "vacuous: dense IOR gradient is zero"
    assert abs(g_fast) <= 0.05 * abs(g_dense) + 1e-7, (
        f"fast-path IOR gradient drifted from its documented ~0 value: "
        f"fast {g_fast} vs dense {g_dense}")

    # (c) the fit auto-route must pick dense when fitting IOR
    import inspect
    from montecarlo_pathtracing_tpu.render import diff
    src = inspect.getsource(diff.inverse_render_fit)
    assert "not fit_ior" in src
