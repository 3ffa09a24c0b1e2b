"""Fused per-bounce kernel (models/bounce_kernel.py) parity tests.

Interpret-mode kernel vs the dense XLA integrator on mesh scenes —
the same harness shape as tests/test_megakernel.py. Tolerances are
loose-ulp: the fused route matches the dense fold to a few ulp except
on exact-distance ties (nearest-first walk order) and through the MXU
one-hot winner gather (~1 ulp on extracted vertex attributes).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.scene import ScenePrimitives, Material
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.scene import mesh as meshlib
from montecarlo_pathtracing_tpu.render.camera import (
    default_rt_camera, camera_rays)
from montecarlo_pathtracing_tpu.models.montecarlo import raytrace
from montecarlo_pathtracing_tpu.models.bounce_kernel import (
    raytrace_fused, fused_eligible)
from montecarlo_pathtracing_tpu.utils.transforms import (
    translate as T, scale as S)

W = H = 32


def _rays():
    proj, view = default_rt_camera(W, H)
    origin, dirs, tc = camera_rays(proj, view, W, H)
    return (jnp.asarray(origin), jnp.asarray(dirs.reshape(-1, 3)),
            jnp.asarray(tc.reshape(-1, 2)))


def _cmp(dev, bounces=4, ior=1.0, tol=1e-3, frac=0.005, **kw):
    O, D, TC = _rays()
    ref = np.asarray(raytrace(dev, O, D, TC, 3, nb_bounces=bounces,
                              refract_ind=ior, use_pallas=False))
    got = np.asarray(raytrace_fused(dev, O, D, TC, 3, nb_bounces=bounces,
                                    refract_ind=ior, interpret=True, **kw))
    diff = np.abs(ref - got).max(axis=1)
    # allow a tiny fraction of winner-flip pixels (tie-order caveat)
    assert (diff > tol).mean() <= frac, (
        f"{(diff > tol).sum()} pixels differ, max {diff.max()}")


def test_mesh_demo_parity():
    # 3 instances, transparent material -> exercises the inner re-trace
    dev = compile_scene(scenes.build("mesh_demo"))
    assert fused_eligible(dev)
    _cmp(dev, bounces=4)


def test_mesh_demo_parity_sorted_matches_unsorted():
    dev = compile_scene(scenes.build("mesh_demo"))
    O, D, TC = _rays()
    a = np.asarray(raytrace_fused(dev, O, D, TC, 5, nb_bounces=3,
                                  refract_ind=1.2, interpret=True,
                                  sort_rays=True))
    b = np.asarray(raytrace_fused(dev, O, D, TC, 5, nb_bounces=3,
                                  refract_ind=1.2, interpret=True,
                                  sort_rays=False))
    # per-lane math is permutation-invariant; winners identical
    np.testing.assert_allclose(a, b, atol=2e-5)


def _opaque_mesh_scene():
    s = ScenePrimitives()
    s.add_oriented_quad(T(0, 0, -60) @ S(400, 400, 1), Material((1, 1, 1, 1)))
    sph = s.add_mesh_geometry(meshlib.sphere(12))
    s.place_mesh(sph, T(0, 0, -20) @ S(35), Material((1, 0.2, 0.2, 1), 0.3, 0.9))
    s.add_oriented_quad(T(0, 0, 150) @ S(60, 60, 1),
                        Material.light((1, 1, 1, 1), 12.0))
    return s


def test_opaque_mesh_scene_parity():
    # has_transparent=False: single-trace bounce body
    dev = compile_scene(_opaque_mesh_scene())
    assert not dev.has_transparent
    assert fused_eligible(dev)
    _cmp(dev, bounces=3)


def test_flat_face_parity():
    dev = compile_scene(_opaque_mesh_scene(), flat_face=True)
    _cmp(dev, bounces=3)


def test_routing_auto_selects_fused():
    dev = compile_scene(scenes.build("mesh_demo"))
    from montecarlo_pathtracing_tpu.models.megakernel import mega_eligible
    assert not mega_eligible(dev)       # meshes exclude the megakernel
    assert fused_eligible(dev)
    # analytic-only scenes never route here
    box = compile_scene(scenes.build("box_diffuse"))
    assert not fused_eligible(box)


def test_raytrace_use_fused_kwarg_interpret():
    dev = compile_scene(_opaque_mesh_scene())
    O, D, TC = _rays()
    a = np.asarray(raytrace(dev, O, D, TC, 2, nb_bounces=3,
                            refract_ind=1.0, use_pallas=True,
                            use_fused=True, pallas_interpret=True))
    b = np.asarray(raytrace_fused(dev, O, D, TC, 2, nb_bounces=3,
                                  refract_ind=1.0, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_large_analytic_scene_parity():
    # >ANA_SCENE_MIN prims -> chunked HBM analytic pool + whole-path mode
    dev = compile_scene(scenes.scene_stress(n_prims=4200))
    assert dev.ana_groups and fused_eligible(dev)
    # grazing sphere hits amplify extraction/recompute ulps through the
    # Phong exponent (se up to 100) — allow a slightly larger flip
    # fraction than the mesh scenes at this tiny resolution
    _cmp(dev, bounces=3, frac=0.015)


def test_whole_path_matches_wavefront():
    dev = compile_scene(scenes.scene_stress(n_prims=4200))
    O, D, TC = _rays()
    a = np.asarray(raytrace_fused(dev, O, D, TC, 4, nb_bounces=3,
                                  refract_ind=1.0, interpret=True,
                                  whole_path=True))
    b = np.asarray(raytrace_fused(dev, O, D, TC, 4, nb_bounces=3,
                                  refract_ind=1.0, interpret=True,
                                  whole_path=False))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_culled_smem_fold_parity():
    # colonnes-class scene: big SMEM table -> the megakernel-style
    # culled fold inside the fused kernel, fed by per-bounce schedules
    from montecarlo_pathtracing_tpu.models.bounce_kernel import cull_small
    dev = compile_scene(scenes.build("colonnes"))
    assert cull_small(dev)
    O, D, TC = _rays()
    ref = np.asarray(raytrace(dev, O, D, TC, 3, nb_bounces=3,
                              refract_ind=1.0, use_pallas=False))
    got = np.asarray(raytrace_fused(dev, O, D, TC, 3, nb_bounces=3,
                                    refract_ind=1.0, interpret=True))
    diff = np.abs(ref - got).max(axis=1)
    assert (diff > 1e-3).mean() <= 0.005, (diff > 1e-3).sum()


@pytest.mark.parametrize("n", [1023, 1026, 4000, 4094, 4100])
def test_no_routing_hole_across_smem_boundaries(n):
    # every stress size near the SMEM-table boundaries must land on a
    # fast whole-program engine — the round-4 cliff was a scene size
    # (1024-4096ish) that neither engine claimed (5.5x slower); the
    # padded-total rule in scene/device.py keeps them aligned
    from montecarlo_pathtracing_tpu.models.megakernel import mega_eligible
    dev = compile_scene(scenes.scene_stress(n_prims=n))
    assert mega_eligible(dev) or fused_eligible(dev), n
