"""Measure the CPU baseline denominators for vs_baseline ratios.

BASELINE.md's target is ">=10x llvmpipe rays/s per chip". The reference
is an OpenGL app and llvmpipe (Mesa's software rasterizer) is not
available in this environment, so the measured stand-in is this
framework's own dense-XLA path on CPU — a software execution of the
exact same shader logic. Caveats (stated wherever the numbers are
used): the host is a 2-vCPU VM, and per-scene rates are measured at
reduced resolution so the heavy scenes finish (dense-CPU cost per ray
is resolution-independent to first order; box_diffuse is measured at
both sizes as a sanity cross-check and both are recorded).

Outputs:
  benchmarks/baseline_cpu.json        — the headline denominator
      (box_diffuse, 800x600, matching bench.py's config)
  benchmarks/baseline_per_scene.json  — per-scene denominators for
      report.json's per-scene vs_baseline column (round-2 verdict:
      a single-scene denominator flattered mesh scenes)

Run once per host class:

    python benchmarks/measure_baseline.py [--per-scene] [--headline]
"""
from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _host():
    return {"machine": platform.machine(), "cpus": os.cpu_count(),
            "python": platform.python_version()}


def _measure(name, width, height, bounces=3, max_seconds=60.0):
    """Dense-XLA CPU rays/s for one scene. Times as many passes as fit
    in ~max_seconds after a compile+warm pass."""
    import jax.numpy as jnp
    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.render.renderer import (
        RenderConfig, Renderer)

    dev = compile_scene(scenes.build(name))
    r = Renderer(dev, RenderConfig(width=width, height=height,
                                   nb_bounces=bounces, tile_rays=1 << 17,
                                   use_pallas=False, passes_per_call=1))
    t0 = time.perf_counter()
    r.render_pass()                      # compile + warm
    float(jnp.sum(r._acc))
    warm = time.perf_counter() - t0
    timed = max(1, min(4, int(max_seconds / max(warm, 1e-3))))
    t0 = time.perf_counter()
    for _ in range(timed):
        r.render_pass()
    float(jnp.sum(r._acc))
    dt = time.perf_counter() - t0
    return {
        "rays_per_s": round(width * height * timed * bounces / dt, 1),
        "width": width, "height": height, "bounces": bounces,
        "passes": timed, "seconds": round(dt, 3), "prims": dev.nb_prims,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-scene", action="store_true")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=96)
    args = ap.parse_args()
    if not (args.per_scene or args.headline):
        args.per_scene = args.headline = True

    import jax
    # sitecustomize imports jax before this script runs, so env vars are
    # too late — force the platform through the config instead.
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", "baseline must run on CPU"

    here = os.path.dirname(__file__)

    if args.headline:
        m = _measure("box_diffuse", 800, 600)
        out = {
            "rays_per_s": m["rays_per_s"],
            "config": {"scene": "box_diffuse", "width": 800, "height": 600,
                       "bounces": 3, "passes": m["passes"],
                       "path": "dense-xla"},
            "host": _host(),
            "seconds": m["seconds"],
        }
        path = os.path.join(here, "baseline_cpu.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        print("wrote", path, flush=True)

    if args.per_scene:
        from montecarlo_pathtracing_tpu.scene import scenes
        per = {}
        for name in scenes.SCENES:
            try:
                per[name] = _measure(name, args.width, args.height)
                print(name, per[name], flush=True)
            except Exception as e:              # keep sweeping
                per[name] = {"error": str(e)[:200]}
                print(name, "ERROR", e, flush=True)
        out = {
            "note": ("dense-XLA CPU rays/s per scene at reduced "
                     "resolution (heavy scenes are minutes/pass at "
                     "800x600 on this 2-vCPU host); per-ray cost is "
                     "resolution-independent to first order — compare "
                     "box_diffuse here vs baseline_cpu.json for the "
                     "cross-check"),
            "path": "dense-xla",
            "host": _host(),
            "scenes": per,
        }
        path = os.path.join(here, "baseline_per_scene.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
