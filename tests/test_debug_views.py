"""Debug raster analogs: first-hit channels, BVH level boxes, mesh IO."""
import numpy as np
import pytest

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.render.camera import default_rt_camera, camera_rays
from montecarlo_pathtracing_tpu.models.debug_views import (
    first_hit_views, render_debug_png, bvh_level_boxes, bvh_level_image)


@pytest.fixture(scope="module")
def setup():
    dev = compile_scene(scenes.build("box_diffuse"))
    proj, view = default_rt_camera(32, 24)
    return dev, proj, view


def test_first_hit_channels(setup):
    dev, proj, view = setup
    origin, dirs, _ = camera_rays(proj, view, 32, 24)
    v = first_hit_views(dev, origin, dirs.reshape(-1, 3))
    assert np.isfinite(np.asarray(v["albedo"])).all()
    n = np.asarray(v["normal"])
    hits = np.asarray(v["shape"]) >= 0
    assert hits.sum() > 100
    # normals encoded to [0,1]
    assert (n[hits] >= 0).all() and (n[hits] <= 1).all()
    assert np.isfinite(np.asarray(v["depth"])[hits]).all()


def test_debug_pngs(setup, tmp_path):
    dev, proj, view = setup
    for ch in ("albedo", "normal", "depth", "prim_id"):
        img = render_debug_png(dev, proj, view, 32, 24,
                               str(tmp_path / f"{ch}.png"), channel=ch)
        assert img.shape == (24, 32, 3)


def test_bvh_level_boxes(setup):
    dev, _, _ = setup
    root = bvh_level_boxes(dev, 0)
    assert root.shape == (1, 2, 3)
    l2 = bvh_level_boxes(dev, 2)
    assert l2.shape == (4, 2, 3)
    # children contained in root
    assert (l2[:, 0] >= root[0, 0] - 1e-4).all()
    assert (l2[:, 1] <= root[0, 1] + 1e-4).all()


def test_bvh_level_image(setup, tmp_path):
    dev, proj, view = setup
    img = bvh_level_image(dev, proj, view, 48, 32, level=1,
                          path=str(tmp_path / "bvh.png"))
    assert (img.sum(-1) > 0).sum() > 20   # wires drawn


def test_ply_roundtrip(tmp_path):
    from montecarlo_pathtracing_tpu.scene import mesh as meshlib
    cube = meshlib.cube()
    p = tmp_path / "cube.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(cube.vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(cube.triangles)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in cube.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in cube.triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    loaded = meshlib.load_mesh(str(p))
    np.testing.assert_allclose(loaded.vertices, cube.vertices)
    np.testing.assert_array_equal(loaded.triangles, cube.triangles)


def test_obj_roundtrip(tmp_path):
    from montecarlo_pathtracing_tpu.scene import mesh as meshlib
    sph = meshlib.sphere(6)
    p = tmp_path / "s.obj"
    with open(p, "w") as f:
        for v in sph.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in sph.triangles:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    loaded = meshlib.load_mesh(str(p))
    np.testing.assert_allclose(loaded.vertices, sph.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.triangles, sph.triangles)
