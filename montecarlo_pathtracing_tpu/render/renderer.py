"""Progressive renderer: accumulation as a running sum in HBM.

The TPU replacement for the reference's FBO additive-blend protocol
(MontecarloGPU/montecarlo.cpp:420-476): each pass renders 1 spp per pixel
with a pass-indexed RNG seed and adds into an f32 accumulator
(GL_ONE/GL_ONE blending analog); the resolve divides by the pass count
(inline fs_frag, montecarlo.cpp:59-70 / shaders/average.frag). The
accumulator buffer is donated back to the jitted pass so XLA updates it
in place in HBM.

Unlike the reference — whose accumulation state lives only in the FBO and
dies on any interaction (montecarlo.cpp:238-246) — the accumulator, pass
count and RNG pass index serialize to an .npz so long renders checkpoint
and resume (SURVEY.md §5).

Large images are processed in ray tiles via `lax.map` so HBM stays bounded
while the megakernel is compiled once.
"""
from __future__ import annotations

import inspect
import json
import os
import sys
from dataclasses import dataclass, asdict, replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models.registry import get_integrator
from ..scene.device import DeviceScene, compile_scene
from ..utils.image import write_png
from .camera import default_rt_camera, camera_rays


@dataclass(frozen=True)
class RenderConfig:
    """The reference's knobs (ImGui sliders + defaults,
    montecarlo.cpp:128-130,584-606,801) as a config dataclass."""
    width: int = 1280
    height: int = 1000
    nb_bounces: int = 3          # slider 0-9
    paths_per_pass: int = 1      # slider 1-8
    subsampling: int = 0         # power-of-2 resolution divisor, 0-5
    refract_ind: float = 1.0     # slider 1.0-2.5
    light_intensity: float = 1.2
    date: float = 0.0            # deterministic stand-in for wall clock
    integrator: str = "montecarlo"
    flat_face: bool = False
    detach_sampling: bool = False
    use_pallas: bool = False     # fused VMEM trace kernel (TPU)
    use_megakernel: bool | None = None  # None = auto-route (montecarlo.py)
    cull_chunks: bool | None = None     # None = auto (on for multi-chunk)
    pixel_order: str = "block32"  # ray layout: "block32" tiles the image
    # into 32x32 pixel blocks so each kernel ray tile is screen-compact
    # (tight frustum -> AABB culls bite); "scanline" = row-major
    passes_per_call: int = 8     # passes folded into one jitted call
    shard_devices: int = 0       # >1: shard rays over a device mesh
    tile_rays: int = 1 << 16

    @property
    def render_width(self) -> int:
        return max(1, self.width >> self.subsampling)

    @property
    def render_height(self) -> int:
        return max(1, self.height >> self.subsampling)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _block_perm(w: int, h: int, bs: int = 32) -> np.ndarray:
    """Permutation putting pixels in bs x bs screen blocks (row-major
    blocks, row-major within a block). A 1024-ray kernel tile then covers
    one 32x32 block instead of 1.3 full-width scanlines, which is what
    makes the chunk/prim AABB frontier culls effective."""
    idx = np.arange(w * h).reshape(h, w)
    parts = []
    for by in range(0, h, bs):
        for bx in range(0, w, bs):
            parts.append(idx[by:by + bs, bx:bx + bs].ravel())
    return np.concatenate(parts)


# Messages that identify a Pallas/Mosaic kernel-compilation failure (as
# opposed to a user error): these, and only these, trigger the fallback
# chain. The reference analog is the shader-compile error path
# (shader_program.cpp:95-169, 309-320) where a failed compile degrades
# instead of killing the app.
_KERNEL_ERROR_MARKERS = (
    "Mosaic", "mosaic", "failed to legalize", "Pallas", "pallas",
    "RESOURCE_EXHAUSTED", "XLA:TPU compile",
    "Only interpret mode is supported",  # Pallas on a CPU-only backend
)


def _is_kernel_compile_error(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return any(m in msg for m in _KERNEL_ERROR_MARKERS)


class Renderer:
    """Progressive path-tracing renderer over a compiled device scene."""

    def __init__(self, scene: DeviceScene, config: RenderConfig,
                 proj: np.ndarray | None = None,
                 view: np.ndarray | None = None):
        self.scene = scene
        self.config = config
        w, h = config.render_width, config.render_height
        if proj is None or view is None:
            proj, view = default_rt_camera(w, h)
        self.proj, self.view = proj, view
        origin, dirs, tc = camera_rays(proj, view, w, h)
        npix = w * h
        pad = _round_up(npix, min(config.tile_rays, _round_up(npix, 256)))
        self._npix = npix
        self._tile = min(config.tile_rays, pad)
        self._ntiles = pad // self._tile
        if config.pixel_order == "block32":
            perm = _block_perm(w, h)
        else:
            perm = np.arange(npix)
        self._inv_perm = np.argsort(perm)
        d = jnp.concatenate(
            [jnp.asarray(np.asarray(dirs.reshape(npix, 3))[perm]),
             jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                              (pad - npix, 3))])
        t = jnp.concatenate(
            [jnp.asarray(np.asarray(tc.reshape(npix, 2))[perm]),
             jnp.zeros((pad - npix, 2), jnp.float32)])
        self._origin = origin
        self._dirs = d.reshape(self._ntiles, self._tile, 3)
        self._tc = t.reshape(self._ntiles, self._tile, 2)
        self._sharding = None
        if config.shard_devices > 1:
            # pixel/ray DP: shard the within-tile ray axis over the mesh;
            # GSPMD partitions the megakernel with zero collectives
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.sharding import make_mesh
            mesh = make_mesh(config.shard_devices)
            self._sharding = NamedSharding(mesh, P(None, "rays", None))
            self._dirs = jax.device_put(self._dirs, self._sharding)
            self._tc = jax.device_put(self._tc, self._sharding)
        self._integrator = get_integrator(config.integrator)
        # Kernel fallback chain (shader_program.cpp:95-169 analog): if a
        # Pallas/Mosaic compile fails at call time, degrade one level and
        # retry instead of killing the render. Level 0 is the configured
        # route; the last level is the always-compilable dense XLA path.
        levels = []
        if config.use_pallas:
            if config.use_megakernel is not False:
                # auto: whole-path megakernel (analytic) or fused
                # per-bounce kernel (meshes) — models/montecarlo.raytrace
                levels.append(("pallas-fused(auto)",
                               dict(use_pallas=True, use_megakernel=None,
                                    use_fused=None)))
            levels.append(("pallas-trace",
                           dict(use_pallas=True, use_megakernel=False,
                                use_fused=False)))
        levels.append(("dense-xla",
                       dict(use_pallas=False, use_megakernel=False,
                            use_fused=False)))
        if config.use_megakernel:
            levels.insert(0, ("pallas-megakernel(forced)",
                              dict(use_pallas=True, use_megakernel=True,
                                   use_fused=False)))
        self._levels = tuple(levels)
        self._level = 0
        self._pass_fn = self._build_pass_fn(1)
        self._multi_fn = None   # built lazily for batched runs
        self._multi_n = None
        self.reset()

    # -- pass compilation --------------------------------------------------

    def _build_pass_fn(self, n_passes: int):
        """Jitted accumulate step folding n_passes progressive passes into
        one device call. Batching matters: per-call dispatch latency
        (hundreds of ms through a remote-TPU tunnel) would otherwise dwarf
        the per-pass compute. The passes are folded by a lax.fori_loop
        over pass indices wrapping a static python loop over ray tiles
        (accumulating in pass order into the donated accumulator) — NOT
        lax.map over (pass, tile) items, whose scan staging of per-item
        outputs measured 7x slower on chip. Accumulation is bit-identical
        to sequential single passes."""
        cfg = self.config
        integrator = self._integrator
        ntiles = self._ntiles
        route = dict(self._levels[self._level][1])
        route["cull_chunks"] = cfg.cull_chunks
        params = inspect.signature(integrator).parameters
        kw = {k: v for k, v in route.items() if k in params}

        def multi_pass(scene, acc, dirs, tc, origin, base_pass, refract_ind):
            # fori_loop over passes x static python loop over ray tiles.
            # NOT lax.map over (pass, tile) items: map lowers to a scan
            # that stacked/restaged the whole per-item output — measured
            # 7x slower than this form for the megakernel on chip (60 vs
            # 509 Mrays/s at 16 passes). Accumulation is element-per-pass
            # adds in pass order either way, so results stay bit-identical
            # to sequential single-pass dispatches.
            def one_pass(k, acc):
                for t in range(ntiles):
                    rgb = integrator(
                        scene, origin, dirs[t], tc[t], base_pass + k,
                        nb_bounces=cfg.nb_bounces, refract_ind=refract_ind,
                        date=cfg.date, detach_sampling=cfg.detach_sampling,
                        **kw)
                    acc = acc.at[t].add(rgb)
                return acc

            if n_passes == 1:
                return one_pass(jnp.int32(0), acc)
            return jax.lax.fori_loop(0, n_passes, one_pass, acc)

        return jax.jit(multi_pass, donate_argnums=(1,))

    # -- kernel-compile fallback (Mosaic-error UX) --------------------------

    def _degrade(self, err: BaseException):
        """Report a kernel compile failure and rebuild the pass functions
        one fallback level down — the analog of the reference's highlighted
        shader-error printer + graceful degrade."""
        old = self._levels[self._level][0]
        self._level += 1
        new = self._levels[self._level][0]
        cfg = self.config
        first_line = str(err).strip().splitlines()[0][:300]
        print(
            f"[montecarlo-tpu] kernel compile FAILED on route '{old}' "
            f"(integrator={cfg.integrator}, "
            f"{cfg.render_width}x{cfg.render_height}, "
            f"bounces={cfg.nb_bounces}, "
            f"prims={self.scene.nb_prims}, tile={self._tile}): "
            f"{type(err).__name__}: {first_line}\n"
            f"[montecarlo-tpu] falling back to route '{new}'",
            file=sys.stderr)
        self._pass_fn = self._build_pass_fn(1)
        if self._multi_n is not None:
            self._multi_fn = self._build_pass_fn(self._multi_n)

    def _invoke(self, which: str, *args):
        """Run a jitted pass fn; on Mosaic/Pallas compile failure, degrade
        a level and retry (donation only consumes inputs once execution
        starts, so the accumulator survives a failed compile)."""
        while True:
            fn = self._pass_fn if which == "single" else self._multi_fn
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001 — filtered below
                if (self._level + 1 >= len(self._levels)
                        or not _is_kernel_compile_error(e)):
                    raise
                self._degrade(e)

    # -- accumulation protocol --------------------------------------------

    def reset(self):
        """Camera move / slider / scene switch analog: clear the FBO and
        pass counter (montecarlo.cpp:238-246)."""
        self._acc = jnp.zeros((self._ntiles, self._tile, 3), jnp.float32,
                              device=self._sharding)
        self.nb_passes = 0

    def render_pass(self):
        """One progressive pass (paths_per_pass sub-passes, each with its
        own pass index — montecarlo.cpp:454-466)."""
        for _ in range(self.config.paths_per_pass):
            self._acc = self._invoke(
                "single",
                self.scene, self._acc, self._dirs, self._tc, self._origin,
                jnp.int32(self.nb_passes),
                jnp.float32(self.config.refract_ind))
            self.nb_passes += 1

    def advance(self, spp: int) -> None:
        """Render up to spp passes with batched multi-pass calls, WITHOUT
        resolving an image — the resolve fetches the whole accumulator to
        the host (~0.3 s for a 6 MB accumulator through the remote-TPU
        tunnel, vs ~50 ms for a 16-pass batched render), so progressive
        loops and benchmarks call this and resolve once at the end.

        The paths_per_pass knob (the reference's paths-per-frame slider,
        montecarlo.cpp:454-466) folds into the same batched builder: a
        "frame" of k paths is just k consecutive pass indices, so batching
        them into one device call is accumulation-identical to k
        sequential dispatches and gets the same dispatch amortization as
        spp batching."""
        ppc = max(max(1, self.config.passes_per_call),
                  max(1, self.config.paths_per_pass))
        while self.nb_passes + ppc <= spp:
            if self._multi_fn is None or self._multi_n != ppc:
                self._multi_n = ppc
                self._multi_fn = self._build_pass_fn(ppc)
            self._acc = self._invoke(
                "multi",
                self.scene, self._acc, self._dirs, self._tc, self._origin,
                jnp.int32(self.nb_passes),
                jnp.float32(self.config.refract_ind))
            self.nb_passes += ppc
        while self.nb_passes < spp:
            self.render_pass()
        jax.block_until_ready(self._acc)

    def run(self, spp: int):
        """advance(spp) + resolve: returns the [H, W, 3] image."""
        self.advance(spp)
        return self.image()

    def resolve(self, acc=None, passes: int | None = None) -> np.ndarray:
        """Resolve an accumulator into an image: undo the pixel-block
        layout permutation, divide by the pass count (average.frag
        analog). `acc` defaults to this renderer's accumulator; passing an
        externally-summed accumulator (e.g. the cross-process sum in
        parallel/launcher.run_multihost_render) keeps the inverse
        permutation in ONE place so every resolve path agrees."""
        w, h = self.config.render_width, self.config.render_height
        if passes is None:
            passes = self.nb_passes
        a = np.asarray(self._acc if acc is None else acc)
        a = a.reshape(-1, 3)[: self._npix]
        a = a[self._inv_perm]              # undo the pixel-block layout
        return (a / max(1, passes)).reshape(h, w, 3)

    def image(self) -> np.ndarray:
        """Resolve: accumulated sum / pass count (average.frag analog).
        Returns [H, W, 3] float32, row 0 = bottom."""
        return self.resolve()

    def save_png(self, path: str):
        write_png(path, self.image())

    # -- checkpoint / resume ----------------------------------------------

    def save_checkpoint(self, path: str):
        np.savez_compressed(
            path,
            acc=np.asarray(self._acc),
            nb_passes=self.nb_passes,
            config=json.dumps(asdict(self.config)),
        )

    def load_checkpoint(self, path: str):
        """Resume from an .npz checkpoint. Configs are compared with
        forward/backward compatibility: keys absent from the saved config
        (written by an older build, before a RenderConfig field existed)
        are filled with the field's DATACLASS default — not the current
        run's value, which would let a new non-default setting slip past
        the check — and unknown saved keys are ignored, so upgrading the
        framework does not orphan in-flight checkpoints. Any remaining
        mismatch still rejects, because every compared field affects
        either the accumulator layout (width/height/subsampling/
        pixel_order/tile_rays) or the accumulated radiance itself
        (bounces/IOR/integrator/...). Engine-routing knobs
        (use_pallas/use_megakernel/cull_chunks) are exempt with a
        warning: their radiance effect is negligible EXCEPT on exact
        float distance ties, where the nearest-first sparse route may
        pick a different — equally closest — winner prim than the
        ascending-order fold (different material/normal on those rays;
        see ops/sparse_trace.py tie-order caveat). The accepted
        tolerance is explicit: resumed accumulators may mix samples
        from both winners on tied rays."""
        z = np.load(path, allow_pickle=False)
        saved = json.loads(str(z["config"]))
        current = asdict(self.config)
        defaults = asdict(type(self.config)())
        routing_only = {"use_pallas", "use_megakernel", "cull_chunks"}
        merged = {k: saved.get(k, defaults[k]) for k in current}
        diff = {k: (merged[k], current[k]) for k in current
                if merged[k] != current[k] and k not in routing_only}
        if diff:
            raise ValueError(
                f"checkpoint config mismatch (saved, current): {diff}")
        route_diff = {k: (merged[k], current[k]) for k in routing_only
                      if merged[k] != current[k]}
        if route_diff:
            import warnings
            warnings.warn(
                "resuming under a different engine route "
                f"{route_diff}: radiance identical except on exact "
                "distance ties (different winner prim possible there)",
                stacklevel=2)
        self._acc = jnp.asarray(z["acc"])
        self.nb_passes = int(z["nb_passes"])


def render_scene(scene_prims, config: RenderConfig, spp: int,
                 proj=None, view=None) -> np.ndarray:
    """Convenience one-shot: compile + render spp passes + resolve."""
    dev = compile_scene(scene_prims, flat_face=config.flat_face)
    r = Renderer(dev, config, proj, view)
    return r.run(spp)
