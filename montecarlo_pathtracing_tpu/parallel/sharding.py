"""Multi-chip parallelism: ray sharding + sample-axis DP over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — its only
"collective" is framebuffer additive blending. The TPU framework introduces
two first-class distribution axes over a `jax.sharding.Mesh`:

  1. PIXEL/RAY SHARDING (primary): the flattened ray batch is sharded over
     the mesh's "rays" axis; each chip traces its own pixel tile against the
     replicated scene. Zero communication per pass — the sharded
     accumulator IS the distributed framebuffer; only the final image
     assembly gathers (all_gather on host 0 analog).

  2. SAMPLE-AXIS DP (`shard_map` + psum): every chip renders the SAME
     pixels with a different pass index and the per-chip partial sums are
     psum-reduced over ICI — the progressive-accumulation analog of
     gradient all-reduce, and the axis that scales SPP throughput for the
     1024-SPP convergence configs (BASELINE.json config 5).

Determinism: the RNG seed is a pure function of (pixel uv, pass index)
(ops/rng.srand), so ANY sharding of pixels or samples yields bit-identical
images to the single-device render — asserted in tests/test_sharding.py.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.registry import get_integrator


def make_mesh(n_devices: int | None = None, axis_name: str = "rays") -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def shard_rays(mesh: Mesh, dirs, tc, axis_name: str = "rays"):
    """Pad the flattened ray batch to the mesh size and shard it.
    Returns (dirs, tc, n_padded) with leading dim sharded over `axis_name`."""
    n = dirs.shape[0]
    nd = mesh.shape[axis_name]
    pad = _round_up(n, nd)
    if pad != n:
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                                    (pad - n, 3))])
        tc = jnp.concatenate([tc, jnp.zeros((pad - n, 2), jnp.float32)])
    sh = NamedSharding(mesh, P(axis_name))
    return jax.device_put(dirs, sh), jax.device_put(tc, sh), pad


def make_sharded_pass(mesh: Mesh, integrator_name: str = "montecarlo", *,
                      nb_bounces: int = 3, detach_sampling: bool = False,
                      axis_name: str = "rays", date: float = 0.0,
                      route: dict | None = None):
    """Pixel-sharded progressive pass: acc/dirs/tc sharded over the ray
    axis, scene replicated. Returns a jitted fn(scene, acc, dirs, tc,
    origin, pass_index, refract_ind) -> acc.

    route: engine-routing kwargs forwarded to the integrator (e.g.
    dict(use_pallas=True, pallas_interpret=True)) — the knobs the
    renderer's fallback chain uses. The dense route partitions under
    plain GSPMD (no collectives needed); any route that reaches a
    pallas_call (worklist / megakernel / fused bounce kernel) is
    dispatched through shard_map instead, because GSPMD cannot
    partition a custom call — each device then runs the full engine on
    its ray shard, which is the production TPU layout (per-pixel seeds
    are pure functions of (uv, pass), so results are bit-identical to
    single-device either way)."""
    import inspect

    integrator = get_integrator(integrator_name)
    route = dict(route or {})
    params = inspect.signature(integrator).parameters
    kw = {k: v for k, v in route.items() if k in params}
    via_shard_map = bool(route.get("use_pallas")
                         or route.get("use_megakernel")
                         or route.get("use_fused"))
    ray_sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def one_pass(scene, acc, dirs, tc, origin, pass_index, refract_ind):
        rgb = integrator(scene, origin, dirs, tc, pass_index,
                         nb_bounces=nb_bounces, refract_ind=refract_ind,
                         date=date, detach_sampling=detach_sampling, **kw)
        return acc + rgb

    if via_shard_map:
        fn = jax.shard_map(
            one_pass, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                      P(), P(), P()),
            out_specs=P(axis_name),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(1,))
    return jax.jit(
        one_pass,
        donate_argnums=(1,),
        in_shardings=(rep, ray_sh, ray_sh, ray_sh, rep, rep, rep),
        out_shardings=ray_sh,
    )


def make_sample_sharded_pass(mesh: Mesh, integrator_name: str = "montecarlo",
                             *, nb_bounces: int = 3,
                             detach_sampling: bool = False,
                             axis_name: str = "spp", date: float = 0.0,
                             route: dict | None = None):
    """Sample-axis DP via shard_map: chip k renders pass (base + k) of the
    SAME pixels; partial images psum over the mesh axis (ICI). One call
    advances the accumulator by mesh_size passes. Returns
    fn(scene, dirs, tc, origin, base_pass, refract_ind) -> summed rgb."""
    import inspect

    integrator = get_integrator(integrator_name)
    nd = mesh.shape[axis_name]
    kw = {k: v for k, v in dict(route or {}).items()
          if k in inspect.signature(integrator).parameters}

    def per_chip(scene, dirs, tc, origin, base_pass, refract_ind):
        k = jax.lax.axis_index(axis_name)
        rgb = integrator(scene, origin, dirs, tc, base_pass + k,
                         nb_bounces=nb_bounces, refract_ind=refract_ind,
                         date=date, detach_sampling=detach_sampling, **kw)
        return jax.lax.psum(rgb, axis_name)

    fn = jax.shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    jitted.n_passes_per_call = nd
    return jitted
