"""Micro-profile: break one progressive pass into stages and time each on
the real chip. Not part of the test suite — a scratch tool for perf work."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.render.camera import default_rt_camera, camera_rays
from montecarlo_pathtracing_tpu.ops import rng, vec
from montecarlo_pathtracing_tpu.ops.trace import trace_soa
from montecarlo_pathtracing_tpu.models.montecarlo import random_path_soa, raytrace


def bench(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    w, h, bounces = 800, 600, 3
    dev = compile_scene(scenes.build("box_diffuse"))
    proj, view = default_rt_camera(w, h)
    O, D, tc = camera_rays(proj, view, w, h)
    D = D.reshape(-1, 3)
    tc = tc.reshape(-1, 2)
    n = D.shape[0]
    pad = ((n + 1023) // 1024) * 1024
    print(f"n={n} pad={pad} platform={jax.devices()[0].platform}")

    d = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    dx = jnp.zeros((pad,), jnp.float32).at[:n].set(d[:, 0])
    dy = jnp.zeros((pad,), jnp.float32).at[:n].set(d[:, 1])
    dz = jnp.ones((pad,), jnp.float32).at[:n].set(d[:, 2])
    o3 = np.asarray(O, np.float32)
    o = tuple(jnp.full((pad,), o3[i]) for i in range(3))
    u = jnp.zeros((pad,), jnp.float32).at[:n].set(tc[:, 0])
    v = jnp.zeros((pad,), jnp.float32).at[:n].set(tc[:, 1])

    # stage 1: trace only
    f_trace = jax.jit(lambda o, dx, dy, dz: trace_soa(dev, o, (dx, dy, dz)))
    t = bench(f_trace, o, dx, dy, dz)
    print(f"trace_soa single      : {t*1e3:8.3f} ms")

    # stage 2: full path, use_pallas
    def full(o, dx, dy, dz, u, v):
        state = rng.srand_soa(u, v, jnp.int32(0), 0.0)
        rgb, _ = random_path_soa(dev, o, (dx, dy, dz), state,
                                 nb_bounces=bounces,
                                 refract_ind=jnp.float32(1.0),
                                 use_pallas=True)
        return rgb
    f_full = jax.jit(full)
    t_full = bench(f_full, o, dx, dy, dz, u, v)
    print(f"full path 3 bounces   : {t_full*1e3:8.3f} ms "
          f"(3x trace = {3*t*1e3:.3f})")

    # stage 3: RNG only
    def rng_only(u, v):
        state = rng.srand_soa(u, v, jnp.int32(0), 0.0)
        r0, state = rng.uniform_masked_soa(state, jnp.ones(u.shape, bool))
        return r0
    t_rng = bench(jax.jit(rng_only), u, v)
    print(f"srand + 1 draw        : {t_rng*1e3:8.3f} ms")

    # stage 4: raytrace API (what the renderer calls per pass)
    f_rt = jax.jit(lambda O_, D_, tc_: raytrace(
        dev, O_, D_, tc_, jnp.int32(0), nb_bounces=bounces,
        refract_ind=jnp.float32(1.0), use_pallas=True))
    t_rt = bench(f_rt, jnp.asarray(O), D, tc)
    print(f"raytrace() end-to-end : {t_rt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
