"""Scene builder: AABBs, emissive sort, demo-scene registry, device
compile (bvh_gpu/scene.cpp + gpu_bvh_scene.cpp semantics)."""
import numpy as np

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.scene import (
    Material, ScenePrimitives, CODE_SPHERE)
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.utils import transforms as tf


def test_prim_bb_padding():
    """World AABB uses the +-1.005 padded cube corners (scene.cpp:18-42)."""
    s = ScenePrimitives()
    s.add_sphere(tf.translate(10, 0, 0) @ tf.scale(2.0),
                 Material(np.array([1, 0, 0, 1], np.float32)))
    center, mn, mx = s.prim_bb(0)
    np.testing.assert_allclose(center, [10, 0, 0], atol=1e-5)
    np.testing.assert_allclose(mn, [10 - 2.01, -2.01, -2.01], atol=1e-4)
    np.testing.assert_allclose(mx, [10 + 2.01, 2.01, 2.01], atol=1e-4)


def test_quad_bb_flattened():
    """Quads are flattened to +-0.001005 in z (scene.cpp:25-30)."""
    s = ScenePrimitives()
    s.add_oriented_quad(tf.scale(100.0),
                        Material(np.array([1, 1, 1, 1], np.float32)))
    _, mn, mx = s.prim_bb(0)
    assert mx[2] - mn[2] < 0.3       # 100 * 0.001005 * 2
    assert mx[0] - mn[0] > 200.0


def test_emissive_sort_partition():
    s = ScenePrimitives()
    white = np.array([1, 1, 1, 1], np.float32)
    s.add_sphere(tf.scale(1.0), Material(white))                 # 0
    s.add_sphere(tf.scale(1.0), Material.light(white, 5.0))      # 1 emissive
    s.add_sphere(tf.scale(1.0), Material(white))                 # 2
    s.add_sphere(tf.scale(1.0), Material.light(white, 2.0))      # 3 emissive
    n = s.sort_emissive_first()
    assert n == 2
    assert all(p.mat[2] > 0 for p in s.prims[:2])
    assert all(p.mat[2] == 0 for p in s.prims[2:])


def test_all_demo_scenes_build_and_compile():
    for name in scenes.SCENES:
        s = scenes.build(name)
        assert s.nb > 0
        dev = compile_scene(s)
        assert dev.nb_prims == s.nb
        assert dev.nb_emissives >= 0
        # every prim accounted for exactly once across groups + meshes
        ids = []
        for g in dev.group_prim:
            ids += [int(i) for i in np.asarray(g) if i >= 0]
        ids += list(dev.mesh_prim_index)
        assert sorted(ids) == list(range(s.nb))


def test_scene_sizes_match_reference():
    """Prim counts from montecarlo.cpp scene constructors."""
    assert scenes.build("box_diffuse").nb == 9
    assert scenes.build("box_balls").nb == 14
    assert scenes.build("materials").nb == 1 + 11 * 11
    # colonnes: 9x9 grid x 11 prims/column + ground + 3 extras
    # (montecarlo.cpp:772-795: 4 base/shaft cylinders + 1 cap cube +
    #  4 angled beams + 2 top cylinders)
    assert scenes.build("colonnes").nb == 1 + 81 * 11 + 3


def test_menger_recursion_count():
    s = ScenePrimitives()
    scenes.menger(s, tf.scale(1.0), 0, 0.9,
                  Material(np.array([1, 0, 0, 1], np.float32)))
    assert s.nb == 20
    s2 = ScenePrimitives()
    scenes.menger(s2, tf.scale(1.0), 1, 0.9,
                  Material(np.array([1, 0, 0, 1], np.float32)))
    assert s2.nb == 400


def test_mesh_instancing_shares_geometry():
    from montecarlo_pathtracing_tpu.scene import mesh as meshlib
    s = ScenePrimitives()
    g = s.add_mesh_geometry(meshlib.cube())
    m = Material(np.array([1, 1, 1, 1], np.float32))
    s.place_mesh(g, tf.translate(0, 0, 0), m)
    s.place_mesh(g, tf.translate(5, 0, 0), m)
    dev = compile_scene(s)
    assert dev.nb_meshes == 2
    assert dev.tri_va.shape[0] == 2 * dev.mesh_tri_padded[0]


def test_stress_scene_builds_and_renders():
    """The procedural large-scene stress fixture (benchmarks/
    stress_curve.py): exact prim count, one emissive, non-black tiny
    render through the auto route."""
    import jax.numpy as jnp
    from montecarlo_pathtracing_tpu.scene.scenes import scene_stress
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.render.renderer import (
        RenderConfig, Renderer)
    from montecarlo_pathtracing_tpu.render.camera import default_rt_camera

    dev = compile_scene(scene_stress(n_prims=300))
    assert dev.nb_prims == 300
    assert dev.nb_emissives == 1
    cfg = RenderConfig(width=48, height=32, nb_bounces=3)
    proj, view = default_rt_camera(48, 32, pitch=-40.0, zoom=2.0)
    r = Renderer(dev, cfg, proj, view)
    img = r.run(2)
    assert float(jnp.mean(img)) > 0.01
