"""Whole-path Pallas megakernel vs the SoA integrator: same images.

The megakernel re-implements the full bounce loop in-kernel with a
bit-identical RNG draw schedule, so the only differences are float
reassociation (Mosaic vs XLA fusion) — gated by allclose with a high
exact-lane rate, same protocol as the SoA-vs-AoS test.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.render.camera import (
    default_rt_camera, camera_rays)
from montecarlo_pathtracing_tpu.models.montecarlo import raytrace as soa
from montecarlo_pathtracing_tpu.models.megakernel import (
    raytrace_mega, mega_eligible)


def _rays(scene_name, w=24, h=18):
    dev = compile_scene(scenes.build(scene_name))
    proj, view = default_rt_camera(w, h)
    origin, dirs, tc = camera_rays(proj, view, w, h)
    return dev, origin, dirs.reshape(-1, 3), tc.reshape(-1, 2)


@pytest.mark.parametrize("scene_name,ior", [
    ("box_diffuse", 1.0),     # opaque: single trace per bounce
    ("box_balls", 1.3),       # all 4 material cases + inner re-trace
    ("materials", 1.5),       # sphere/cube/cylinder/cone sweep
])
def test_megakernel_matches_soa(scene_name, ior):
    dev, origin, dirs, tc = _rays(scene_name)
    assert mega_eligible(dev)
    for pass_index in (0, 3):
        ref = np.asarray(soa(dev, origin, dirs, tc, jnp.int32(pass_index),
                             nb_bounces=4, refract_ind=jnp.float32(ior),
                             use_megakernel=False))
        got = np.asarray(raytrace_mega(
            dev, origin, dirs, tc, jnp.int32(pass_index),
            nb_bounces=4, refract_ind=jnp.float32(ior), interpret=True))
        close = np.all(np.abs(ref - got) <= 1e-3 + 1e-3 * np.abs(ref), -1)
        assert close.mean() > 0.98, (
            f"{scene_name} pass {pass_index}: match {close.mean():.3f}")
        assert abs(ref.mean() - got.mean()) < 2e-3


def test_megakernel_routing():
    """Auto-route: eligible analytic scene + use_pallas -> megakernel;
    mesh scenes stay on the chunked path."""
    dev, origin, dirs, tc = _rays("box_diffuse")
    assert mega_eligible(dev)
    via_route = np.asarray(soa(
        dev, origin, dirs, tc, jnp.int32(1), nb_bounces=3,
        refract_ind=jnp.float32(1.0), use_pallas=True,
        pallas_interpret=True))
    direct = np.asarray(raytrace_mega(
        dev, origin, dirs, tc, jnp.int32(1), nb_bounces=3,
        refract_ind=jnp.float32(1.0), interpret=True))
    np.testing.assert_array_equal(via_route, direct)

    mesh_dev = compile_scene(scenes.build("mesh_demo"))
    assert not mega_eligible(mesh_dev)


def test_megakernel_zero_bounces_black():
    dev, origin, dirs, tc = _rays("box_diffuse", w=8, h=8)
    got = np.asarray(raytrace_mega(
        dev, origin, dirs, tc, jnp.int32(0), nb_bounces=0,
        refract_ind=jnp.float32(1.0), interpret=True))
    assert (got == 0.0).all()


def test_megakernel_pad_columns_never_hit():
    """Regression: group-padding columns carry identity transforms; before
    the ok-flag mask the megakernel traced them as phantom unit prims at
    the world origin (caught as 3 bright pixels at 96x96 on box_diffuse).
    A scene whose real geometry is far from the origin must show sky, not
    a phantom, for rays through the origin."""
    from montecarlo_pathtracing_tpu.scene.scene import (
        ScenePrimitives, Material)
    from montecarlo_pathtracing_tpu.utils.transforms import translate
    from montecarlo_pathtracing_tpu.models.megakernel import (
        TILE_ROWS, LANES, _mega_meta)

    sc = ScenePrimitives()
    sc.add_cube(translate(40.0, 0.0, 0.0), Material((0.9, 0.2, 0.2, 1.0)))
    sc.add_cube(translate(-40.0, 0.0, 0.0), Material((0.2, 0.9, 0.2, 1.0)))
    dev = compile_scene(sc)
    groups, total = _mega_meta(dev)
    assert total > dev.nb_prims, "fixture must actually have pad columns"

    n = TILE_ROWS * LANES
    # rays from above straight down through the origin: nothing real there
    D = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(-1.0)
    O = jnp.array([0.0, 0.0, 50.0], jnp.float32)
    tc = jnp.zeros((n, 2), jnp.float32)
    ref = np.asarray(soa(dev, O, D, tc, jnp.int32(0), nb_bounces=2,
                         refract_ind=jnp.float32(1.0), use_megakernel=False))
    got = np.asarray(raytrace_mega(dev, O, D, tc, jnp.int32(0),
                                   nb_bounces=2,
                                   refract_ind=jnp.float32(1.0),
                                   interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # and the miss must be the sky for straight-down rays, not black/phantom
    sky_low = np.array([0.5, 0.5, 0.9]) * 0.8   # attenu 0.8 * sky(d.z<0)
    np.testing.assert_allclose(ref[0], sky_low, atol=1e-5)
