"""Real-compile smoke tests for every Pallas kernel.

Round 1 shipped a megakernel whose Mosaic compile failed on actual TPU
hardware while every test passed, because all Pallas tests ran with
interpret=True — interpret mode validates semantics, not Mosaic legality.
This module runs each kernel at the smallest legal shape through the REAL
compile pipeline (interpret=False) on whatever platform JAX selected.

Used two ways:
  * bench.py calls run_smoke() before timing, so a Mosaic regression
    fails loudly with a kernel name instead of poisoning the benchmark;
  * tests/test_tpu_compile.py runs it under pytest when a TPU is visible
    (it is skipped on the CPU-forced test mesh, where interpret-mode
    parity tests already cover semantics).

Each entry returns a short status line; failures raise with the kernel
name prefixed (the analog of the reference's named shader compile errors,
easycppogl/shader_program.cpp:95-169).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _smoke_group_plain():
    from ..ops.pallas_trace import (
        group_best_rows, _pad_group, RAY_TILE)
    from ..ops.intersect import CODE_SPHERE
    n = RAY_TILE
    o = jnp.zeros((3, n), jnp.float32)
    d = jnp.zeros((3, n), jnp.float32).at[2].set(1.0)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
    inv_r, trf_r, pid = _pad_group(eye, eye, jnp.zeros((1,), jnp.int32))
    dist, row, a, _ = group_best_rows(o, d, CODE_SPHERE, inv_r, trf_r, pid)
    jax.block_until_ready(dist)


def _smoke_group_culled():
    from ..ops.pallas_trace import (
        group_best_rows, _pad_group, RAY_TILE, PRIM_CHUNK)
    from ..ops.intersect import CODE_SPHERE
    n = RAY_TILE
    o = jnp.zeros((3, n), jnp.float32)
    d = jnp.zeros((3, n), jnp.float32).at[2].set(1.0)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
    inv_r, trf_r, pid = _pad_group(eye, eye, jnp.zeros((1,), jnp.int32))
    nchunks = inv_r.shape[1] // PRIM_CHUNK
    cbb = jnp.tile(jnp.array([[-2.0]] * 3 + [[2.0]] * 3, jnp.float32),
                   (1, nchunks))
    dist, row, a, _ = group_best_rows(o, d, CODE_SPHERE, inv_r, trf_r, pid,
                                      cbb=cbb)
    jax.block_until_ready(dist)


def _smoke_mesh():
    from ..ops.pallas_trace import mesh_best_rows, pad_tris, RAY_TILE
    n = RAY_TILE
    o = jnp.zeros((3, n), jnp.float32)
    d = jnp.zeros((3, n), jnp.float32).at[2].set(1.0)
    va = jnp.array([[-1.0, -1.0, 2.0]], jnp.float32)
    vb = jnp.array([[1.0, -1.0, 2.0]], jnp.float32)
    vc = jnp.array([[0.0, 1.0, 2.0]], jnp.float32)
    a, row = mesh_best_rows(o, d, pad_tris(va, vb, vc))
    jax.block_until_ready(a)


def _mesh_fixture():
    import numpy as np
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..ops.pallas_trace import pad_tris, RAY_TILE

    dev = compile_scene(scenes.build("mesh_demo"))
    off, cnt = dev.mesh_tri_offset[0], dev.mesh_tri_padded[0]
    tri = pad_tris(dev.tri_va[off:off + cnt], dev.tri_vb[off:off + cnt],
                   dev.tri_vc[off:off + cnt])
    rs = np.random.RandomState(7)
    O = rs.uniform(-3, 3, (RAY_TILE, 3)).astype(np.float32)
    D = rs.normal(size=(RAY_TILE, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    return dev, tri, jnp.asarray(O.T), jnp.asarray(D.T)


def _smoke_mesh_culled():
    """Compile the round-2 two-level culled triangle kernel (still the
    fallback for rays counts that don't tile MESH_TILE) AND assert
    winner equality against the plain fold through the REAL pipeline,
    with a fixture whose leaf-chunk table has super-alignment PAD
    chunks. Interpret mode skips pad-chunk bodies by predicate; Mosaic
    has been seen to execute them (round 2), which only this
    real-compile check catches."""
    import numpy as np
    from ..ops.pallas_trace import mesh_best_rows, RAY_TILE

    dev, tri, o, d = _mesh_fixture()
    assert dev.mesh_chunk_bb[0].shape[1] > tri.shape[1] // 128, \
        "fixture must have pad chunks"
    ap, rp = mesh_best_rows(o, d, tri, cbb=None)
    ac, rc = mesh_best_rows(o, d, tri, cbb=dev.mesh_chunk_bb[0],
                            sbb=dev.mesh_super_bb[0])
    if not (np.array_equal(np.asarray(rp), np.asarray(rc))
            and np.array_equal(np.asarray(ap), np.asarray(ac))):
        nbad = int((np.asarray(rp) != np.asarray(rc)).sum())
        raise AssertionError(
            f"culled mesh kernel winners diverge from plain on real "
            f"compile ({nbad}/{RAY_TILE} rays)")


def _smoke_mesh_sparse():
    """Compile the occlusion-refined worklist mesh kernel (the
    production mesh route, ops/sparse_trace.py) through the REAL
    pipeline — dynamic grids, scalar prefetch, while_loop — and assert
    winner equality against the plain fold."""
    import numpy as np
    from ..ops.pallas_trace import mesh_best_rows
    from ..ops.sparse_trace import mesh_best_rows_sparse

    dev, tri, o, d = _mesh_fixture()
    ap, rp = mesh_best_rows(o, d, tri, cbb=None)
    ac, rc = mesh_best_rows_sparse(o, d, tri, dev.mesh_chunk_bb[0])
    if not (np.array_equal(np.asarray(rp), np.asarray(rc))
            and np.array_equal(np.asarray(ap), np.asarray(ac))):
        nbad = int((np.asarray(rp) != np.asarray(rc)).sum())
        raise AssertionError(
            f"sparse mesh kernel winners diverge from plain on real "
            f"compile ({nbad} rays)")


def _smoke_group_sparse():
    """Compile the worklist analytic-group kernel (the production route
    for >96-prim groups) and assert winner equality vs the plain fold."""
    import numpy as np
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..ops.pallas_trace import group_best_rows, _pad_group, RAY_TILE
    from ..ops.sparse_trace import group_best_rows_sparse

    dev = compile_scene(scenes.build("colonnes"))
    gi = max(range(len(dev.group_codes)),
             key=lambda i: dev.group_prim[i].shape[0])
    inv_r, trf_r, pid = _pad_group(
        dev.group_transfo[gi], dev.group_inv[gi], dev.group_prim[gi])
    rs = np.random.RandomState(11)
    O = rs.uniform(-40, 40, (RAY_TILE, 3)).astype(np.float32)
    D = rs.normal(size=(RAY_TILE, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    o, d = jnp.asarray(O.T), jnp.asarray(D.T)
    code = dev.group_codes[gi]
    dp, rp, apn, _ = group_best_rows(o, d, code, inv_r, trf_r, pid)
    ds, rso, as_, _ = group_best_rows_sparse(
        o, d, code, inv_r, trf_r, pid, dev.group_super_bb[gi])
    if not (np.array_equal(np.asarray(rp), np.asarray(rso))
            and np.array_equal(np.asarray(dp), np.asarray(ds))):
        nbad = int((np.asarray(rp) != np.asarray(rso)).sum())
        raise AssertionError(
            f"sparse group kernel winners diverge from plain on real "
            f"compile ({nbad} rays)")


def _smoke_megakernel():
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..models.megakernel import raytrace_mega, TILE_ROWS, LANES
    dev = compile_scene(scenes.build("box_diffuse"))
    n = TILE_ROWS * LANES
    D = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    tc = jnp.zeros((n, 2), jnp.float32)
    O = jnp.zeros((3,), jnp.float32)
    rgb = raytrace_mega(dev, O, D, tc, 0, nb_bounces=2, refract_ind=1.0)
    jax.block_until_ready(rgb)


def _smoke_megakernel_transparent():
    # the refraction inner re-trace doubles the fold count — compile it too
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..models.megakernel import raytrace_mega, TILE_ROWS, LANES
    dev = compile_scene(scenes.build("box_balls"))
    n = TILE_ROWS * LANES
    D = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    tc = jnp.zeros((n, 2), jnp.float32)
    O = jnp.zeros((3,), jnp.float32)
    rgb = raytrace_mega(dev, O, D, tc, 0, nb_bounces=2, refract_ind=1.3)
    jax.block_until_ready(rgb)


def _smoke_megakernel_culled():
    """Compile the two-level per-prim-culled megakernel (>=64 prims
    activates it) through the REAL pipeline and assert the image matches
    the dense XLA integrator — the real-compile guard for mispredicated
    @pl.when bodies (pads are ok-flag-masked and indices clamped, so
    even a Mosaic mispredication must not change winners)."""
    import numpy as np
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..models.megakernel import raytrace_mega, TILE_ROWS, LANES
    from ..models.montecarlo import raytrace

    dev = compile_scene(scenes.build("materials"))
    assert dev.nb_prims >= 64, "fixture must activate the per-prim cull"
    n = TILE_ROWS * LANES
    rs = np.random.RandomState(3)
    D = rs.normal(size=(n, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    D = jnp.asarray(D)
    tc = jnp.asarray(rs.uniform(0, 1, (n, 2)).astype(np.float32))
    O = jnp.array([0.0, -40.0, 100.0], jnp.float32)
    got = np.asarray(raytrace_mega(dev, O, D, tc, 0, nb_bounces=3,
                                   refract_ind=1.2))
    ref = np.asarray(raytrace(dev, O, D, tc, 0, nb_bounces=3,
                              refract_ind=jnp.float32(1.2),
                              use_pallas=False, use_megakernel=False))
    close = np.all(np.abs(got - ref) <= 1e-3 + 1e-3 * np.abs(ref), -1)
    if close.mean() <= 0.98:
        raise AssertionError(
            f"culled megakernel diverges from dense on real compile "
            f"(match {close.mean():.3f})")


def _smoke_fused_bounce():
    """Compile the fused per-bounce kernel (mesh walk + culled SMEM
    fold + shading in one Pallas call, models/bounce_kernel.py) through
    the real pipeline. Parity vs the dense integrator lives in
    tests/test_bounce_kernel.py — compiling the dense mesh reference
    here would double this smoke's wall time for no new signal."""
    import numpy as np
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..models.bounce_kernel import raytrace_fused, TILE

    dev = compile_scene(scenes.build("mesh_demo"))
    n = 4 * TILE
    rs = np.random.RandomState(5)
    D = rs.normal(size=(n, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    D = jnp.asarray(D)
    tc = jnp.asarray(rs.uniform(0, 1, (n, 2)).astype(np.float32))
    O = jnp.array([0.0, -40.0, 100.0], jnp.float32)
    got = np.asarray(raytrace_fused(dev, O, D, tc, 0, nb_bounces=2,
                                    refract_ind=1.2))
    assert np.isfinite(got).all() and (got != 0).any()


def _smoke_fused_ana():
    """Whole-path mode with the large-analytic chunk walk (the
    megakernel-SMEM-cap overflow route)."""
    from ..scene import scenes
    from ..scene.device import compile_scene
    from ..models.bounce_kernel import raytrace_fused, TILE

    dev = compile_scene(scenes.scene_stress(n_prims=4200))
    assert dev.ana_groups
    n = TILE
    D = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(-1.0)
    tc = jnp.zeros((n, 2), jnp.float32)
    O = jnp.array([0.0, 0.0, 300.0], jnp.float32)
    rgb = raytrace_fused(dev, O, D, tc, 0, nb_bounces=2, refract_ind=1.0)
    jax.block_until_ready(rgb)


SMOKES = (
    ("group_best_rows", _smoke_group_plain),
    ("group_best_rows[culled]", _smoke_group_culled),
    ("group_best_rows[sparse]", _smoke_group_sparse),
    ("mesh_best_rows", _smoke_mesh),
    ("mesh_best_rows[culled]", _smoke_mesh_culled),
    ("mesh_best_rows[sparse]", _smoke_mesh_sparse),
    ("megakernel", _smoke_megakernel),
    ("megakernel[transparent]", _smoke_megakernel_transparent),
    ("megakernel[culled]", _smoke_megakernel_culled),
    ("fused_bounce[mesh]", _smoke_fused_bounce),
    ("fused_bounce[ana]", _smoke_fused_ana),
)


def run_smoke(verbose: bool = True) -> list:
    """Compile + run every Pallas kernel at tiny shapes on the current
    backend. Raises RuntimeError naming the first failing kernel."""
    results = []
    for name, fn in SMOKES:
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — re-raised with kernel name
            raise RuntimeError(
                f"Pallas kernel {name!r} failed to compile/run on "
                f"{jax.devices()[0].platform}: "
                f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
            ) from e
        dt = time.perf_counter() - t0
        results.append((name, dt))
        if verbose:
            import sys
            print(f"# smoke {name}: ok ({dt:.2f}s)", file=sys.stderr)
    return results


if __name__ == "__main__":
    run_smoke()
