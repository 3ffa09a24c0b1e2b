"""Kernel compile-failure fallback (the shader-error-printer analog).

Round 1's benchmark died because a Mosaic compile failure in the
megakernel propagated out of the renderer with no fallback
(VERDICT.md Weak #1-2). The Renderer now degrades through
pallas-megakernel -> pallas-trace -> dense-xla at call time.

On this CPU test mesh, requesting use_pallas=True raises a REAL kernel
compile error ("Only interpret mode is supported on CPU backend"), so
the chain is exercised end-to-end, not with a mock: the megakernel
level fails, the pallas-trace level takes over (on a small scene it is
the pure-XLA small-group fold, so it runs anywhere), and the image
matches a dense-only run to float ulp (same seeds, same winners;
fusion order differs between routes).
"""
from __future__ import annotations

import numpy as np
import pytest

from montecarlo_pathtracing_tpu.render.renderer import (
    RenderConfig, Renderer, _is_kernel_compile_error)
from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene


def test_fallback_degrades_to_dense_and_matches():
    dev = compile_scene(scenes.build("box_diffuse"))
    cfg_p = RenderConfig(width=24, height=18, nb_bounces=3,
                         use_pallas=True, passes_per_call=1)
    cfg_d = RenderConfig(width=24, height=18, nb_bounces=3,
                         use_pallas=False, passes_per_call=1)
    rp = Renderer(dev, cfg_p)
    rd = Renderer(dev, cfg_d)
    assert [name for name, _ in rp._levels] == [
        "pallas-fused(auto)", "pallas-trace", "dense-xla"]
    rp.render_pass()            # degrades off the megakernel, then renders
    rd.render_pass()
    assert rp._level > 0
    np.testing.assert_allclose(rp.image(), rd.image(),
                               rtol=1e-4, atol=1e-5)


def test_forced_megakernel_level_order():
    dev = compile_scene(scenes.build("box_diffuse"))
    cfg = RenderConfig(width=24, height=18, use_pallas=True,
                       use_megakernel=True)
    r = Renderer(dev, cfg)
    assert r._levels[0][0] == "pallas-megakernel(forced)"
    assert r._levels[-1][0] == "dense-xla"


def test_non_kernel_errors_do_not_trigger_fallback():
    assert not _is_kernel_compile_error(ValueError("shape mismatch"))
    assert _is_kernel_compile_error(
        RuntimeError("INTERNAL: Mosaic failed to compile TPU kernel"))
    assert _is_kernel_compile_error(
        Exception("failed to legalize operation 'scf.for'"))
