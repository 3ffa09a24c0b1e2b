"""Profiling & observability — the FPS-counter/GPU-memory-query layer.

The reference's only instruments are an FPS average over 50-frame windows
(easycppogl/gl_viewer.cpp:412-418), a BVH-build wall-time print
(MontecarloGPU/montecarlo.cpp:354-363), and NVX GPU-memory queries
(gl_viewer.cpp:443-452). TPU equivalents:

  - PassTimer: windowed passes/s + rays/s counters (the FPS analog)
  - trace_context: jax.profiler trace to a directory for xprof
  - device_memory_stats: per-device HBM usage (the NVX query analog)
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


class PassTimer:
    """Windowed throughput counter (50-pass window like the reference's
    50-frame FPS window)."""

    def __init__(self, rays_per_pass: int, window: int = 50):
        self.rays_per_pass = rays_per_pass
        self.times = deque(maxlen=window + 1)

    def tick(self):
        self.times.append(time.perf_counter())

    @property
    def passes_per_s(self) -> float:
        if len(self.times) < 2:
            return 0.0
        dt = self.times[-1] - self.times[0]
        return (len(self.times) - 1) / dt if dt > 0 else 0.0

    @property
    def rays_per_s(self) -> float:
        return self.passes_per_s * self.rays_per_pass


@contextlib.contextmanager
def trace_context(logdir: str):
    """jax.profiler trace for xprof / tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats():
    """Per-device memory stats dict (bytes); empty entries where the
    backend doesn't report (CPU)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out


def timed_block(fn, *args, sync=True):
    """(result, seconds) with device sync — correct TPU timing needs
    block_until_ready, not wall clock around dispatch."""
    t0 = time.perf_counter()
    out = fn(*args)
    if sync:
        out = jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 2.0) -> None:
    """Persistent XLA/Mosaic compilation cache, shared across processes.

    The whole-path megakernel takes minutes to compile through the remote
    Mosaic pipeline; with the cache the second process loads it in
    milliseconds. Called by every entry point (bench.py, the CLI,
    __graft_entry__). Opt out with MCPT_NO_COMPILE_CACHE=1.
    """
    import hashlib
    import os

    if os.environ.get("MCPT_NO_COMPILE_CACHE"):
        return
    if path is None:
        path = os.environ.get(
            "MCPT_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
        # The persistent cache exists for the minutes-long Mosaic/TPU
        # kernel compiles. NEVER enable it for XLA:CPU: CPU AOT results
        # are stamped with the build process's ISA features plus tuning
        # pseudo-features (+prefer-no-scatter/-gather) that the loader's
        # host check does not recognize, so every load — even by an
        # identical process on the same host — raises cpu_aot_loader
        # "could lead to SIGILL" errors, and a genuinely different host
        # really can SIGILL. CPU entry-point compiles are seconds, not
        # minutes; the multi-host launcher scenario runs on TPU where
        # Mosaic artifacts are machine-portable.
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "unknown"
        if backend == "cpu":
            return
        fp = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        flags = " ".join(sorted(line.split(":", 1)[1].split()))
                        fp = hashlib.sha1(flags.encode()).hexdigest()[:12]
                        break
        except OSError:
            pass
        path = os.path.join(path, f"{backend}-{fp or 'nofp'}")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        pass  # older jax without the knobs: cache is an optimization only
