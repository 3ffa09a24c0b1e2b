"""Measure the baseline denominator for bench.py's vs_baseline.

BASELINE.md's target is ">=10x llvmpipe rays/s per chip". The reference
is an OpenGL app and llvmpipe (Mesa's software rasterizer) is not
available in this environment, so the measured stand-in is this
framework's own dense-XLA path on CPU — a software execution of the
exact same shader logic (same scene, resolution, bounce count as
bench.py: box_diffuse, 800x600, 3 bounces), which is the closest
honest analog of "the shader on a software renderer".

Writes benchmarks/baseline_cpu.json: {"rays_per_s": ..., "config": ...,
"host": ...}. bench.py reads it and reports
vs_baseline = tpu_rays_per_s / (10 * cpu_rays_per_s)  (>= 1.0 = target
met). Run once per host class:

    JAX_PLATFORMS=cpu python benchmarks/measure_baseline.py
"""
from __future__ import annotations

import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    # sitecustomize imports jax before this script runs, so env vars are
    # too late — force the platform through the config instead.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "cpu", "baseline must run on CPU"

    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.render.renderer import (
        RenderConfig, Renderer)

    width, height, bounces = 800, 600, 3
    dev = compile_scene(scenes.build("box_diffuse"))
    r = Renderer(dev, RenderConfig(width=width, height=height,
                                   nb_bounces=bounces, tile_rays=1 << 17,
                                   use_pallas=False, passes_per_call=1))
    r.render_pass()                      # compile + warm
    float(jnp.sum(r._acc))
    timed = 4
    t0 = time.perf_counter()
    for _ in range(timed):
        r.render_pass()
    float(jnp.sum(r._acc))
    dt = time.perf_counter() - t0
    rays_per_s = width * height * timed * bounces / dt

    out = {
        "rays_per_s": round(rays_per_s, 1),
        "config": {"scene": "box_diffuse", "width": width, "height": height,
                   "bounces": bounces, "passes": timed, "path": "dense-xla"},
        "host": {"machine": platform.machine(),
                 "cpus": os.cpu_count(),
                 "python": platform.python_version()},
        "seconds": round(dt, 3),
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
