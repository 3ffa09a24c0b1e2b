"""Inverse-rendering demo (BASELINE config 4).

Renders a target image of the box_diffuse scene, perturbs one cube's
albedo, then recovers it by Adam descent on the pixel MSE using the
detached-sampling gradients. Writes target / initial / recovered PNGs
and prints the loss curve + recovered RGB.

  python examples/inverse_rendering.py [--cpu] [--steps 80]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.render.camera import (
        default_rt_camera, camera_rays)
    from montecarlo_pathtracing_tpu.render.diff import (
        params_of, render_mean, inverse_render_fit)
    from montecarlo_pathtracing_tpu.utils.image import write_png

    w, h = args.width, args.height
    dev = compile_scene(scenes.build("box_diffuse"))
    proj, view = default_rt_camera(w, h)
    origin, dirs, tc = camera_rays(proj, view, w, h)
    dirs, tc = dirs.reshape(-1, 3), tc.reshape(-1, 2)

    p_true = params_of(dev)
    target = render_mean(dev, p_true, origin, dirs, tc, 4, 6)
    write_png(f"{args.outdir}/inv_target.png",
              np.asarray(target).reshape(h, w, 3))

    cube = int(np.asarray(dev.group_prim[dev.group_codes.index(2)])[0])
    p0 = p_true._replace(
        color=p_true.color.at[cube, :3].set(jnp.array([0.05, 0.55, 0.3])))
    init_img = render_mean(dev, p0, origin, dirs, tc, 4, 6)
    write_png(f"{args.outdir}/inv_initial.png",
              np.asarray(init_img).reshape(h, w, 3))

    p_fit, losses = inverse_render_fit(
        dev, target, origin, dirs, tc, prim_ids=[cube],
        steps=args.steps, lr=5e-2, n_passes=4, nb_bounces=6,
        seed_params=p0, verbose=True)

    final = render_mean(dev, p_fit, origin, dirs, tc, 4, 6)
    write_png(f"{args.outdir}/inv_recovered.png",
              np.asarray(final).reshape(h, w, 3))
    print(f"loss: {losses[0]:.6f} -> {losses[-1]:.6f}")
    print("true albedo:     ", np.asarray(p_true.color[cube, :3]))
    print("recovered albedo:", np.asarray(p_fit.color[cube, :3]))


if __name__ == "__main__":
    main()
