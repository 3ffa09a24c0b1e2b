"""Pallas fused-trace kernel vs the dense XLA path — exact-agreement
tests per shape type (interpret mode on CPU; the same kernel compiles for
TPU via Mosaic)."""
import numpy as np
import jax.numpy as jnp
import pytest

from montecarlo_pathtracing_tpu.ops import intersect as xs
from montecarlo_pathtracing_tpu.ops.pallas_trace import (
    trace_analytic_group_pallas)
from montecarlo_pathtracing_tpu.utils import transforms as tf


def _random_group(code, n_prims, seed):
    rs = np.random.RandomState(seed)
    trf = np.zeros((n_prims, 4, 4), np.float32)
    inv = np.zeros((n_prims, 4, 4), np.float32)
    for i in range(n_prims):
        m = (tf.translate(*rs.uniform(-50, 50, 3))
             @ tf.rotate(rs.uniform(0, 360), rs.uniform(0.1, 1, 3))
             @ tf.scale(*rs.uniform(0.5, 8.0, 3)))
        trf[i] = m
        inv[i] = tf.inverse(m)
    pid = np.arange(n_prims, dtype=np.int32) * 3 + 1   # scene ids, sparse
    return jnp.asarray(trf), jnp.asarray(inv), jnp.asarray(pid)


def _random_rays(n, seed):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-80, 80, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("code", [xs.CODE_SPHERE, xs.CODE_CUBE,
                                  xs.CODE_CYLINDER, xs.CODE_CONE,
                                  xs.CODE_ORIENTED_QUAD])
@pytest.mark.parametrize("n_prims", [3, 60, 150])
def test_pallas_matches_dense(code, n_prims):
    trf, inv, pid = _random_group(code, n_prims, code * 100 + n_prims)
    O, D = _random_rays(700, code + n_prims)

    # dense path needs chunk-multiple padding
    chunk = 64
    pad = ((n_prims + chunk - 1) // chunk) * chunk
    trf_p = jnp.concatenate(
        [trf, jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                               (pad - n_prims, 4, 4))])
    inv_p = jnp.concatenate(
        [inv, jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                               (pad - n_prims, 4, 4))])
    pid_p = jnp.concatenate(
        [pid, jnp.full((pad - n_prims,), -1, jnp.int32)])

    dense = xs.trace_analytic_group(
        xs.miss_hit((700,)), O, D, code, trf_p, inv_p, pid_p, chunk=chunk)
    fused = trace_analytic_group_pallas(
        xs.miss_hit((700,)), O, D, code, trf, inv, pid, interpret=True)

    d_hit = np.asarray(dense.prim)
    f_hit = np.asarray(fused.prim)
    # identical winners except possible exact-distance ties
    dd = np.asarray(dense.dist)
    fd = np.asarray(fused.dist)
    tie_or_same = (d_hit == f_hit) | np.isclose(dd, fd, rtol=1e-6)
    assert tie_or_same.all(), (
        f"winner mismatch at {np.where(~tie_or_same)[0][:5]}")
    hit = (d_hit >= 0) & (d_hit == f_hit)
    # SoA unrolled multiply-adds round differently than the dense einsum
    # path — agreement is to f32 noise, not bit-exact
    np.testing.assert_allclose(fd[hit], dd[hit], rtol=5e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fused.pg)[hit],
                               np.asarray(dense.pg)[hit],
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(fused.dircode)[hit],
                                  np.asarray(dense.dircode)[hit])
    # misses agree
    assert ((d_hit < 0) == (f_hit < 0)).all()


def test_pallas_folds_into_existing_best():
    """The running-best fold must keep a strictly closer prior hit."""
    code = xs.CODE_SPHERE
    trf, inv, pid = _random_group(code, 10, 5)
    O, D = _random_rays(700, 9)
    base = xs.miss_hit((700,))
    prior = base._replace(dist=jnp.full((700,), 1e-3, jnp.float32),
                          shape=jnp.full((700,), 99, jnp.int32))
    out = trace_analytic_group_pallas(prior, O, D, code, trf, inv, pid,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out.shape),
                                  np.full(700, 99, np.int32))


def test_mesh_pallas_matches_dense():
    """Triangle kernel vs dense trace_mesh_instance on mesh_demo."""
    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.ops.trace import trace

    dev = compile_scene(scenes.build("mesh_demo"))
    O, D = _random_rays(600, 77)
    dense = trace(dev, O, D)
    fused = trace(dev, O, D, use_pallas=True, pallas_interpret=True)
    same = np.asarray(dense.prim) == np.asarray(fused.prim)
    tie = np.isclose(np.asarray(dense.dist), np.asarray(fused.dist),
                     rtol=1e-5)
    assert (same | tie).all(), np.where(~(same | tie))[0][:5]
    hitm = same & (np.asarray(dense.shape) == 0)
    assert hitm.any()
    np.testing.assert_array_equal(np.asarray(dense.tri)[hitm],
                                  np.asarray(fused.tri)[hitm])


def test_full_scene_trace_pallas_matches_dense():
    """Whole-scene trace with the pallas analytic path on box_balls
    (spheres + cubes + quads)."""
    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.ops.trace import trace

    dev = compile_scene(scenes.build("box_balls"))
    O, D = _random_rays(600, 42)
    dense = trace(dev, O, D)
    fused = trace(dev, O, D, use_pallas=True, pallas_interpret=True)
    same = np.asarray(dense.prim) == np.asarray(fused.prim)
    tie = np.isclose(np.asarray(dense.dist), np.asarray(fused.dist),
                     rtol=1e-6)
    assert (same | tie).all()


def test_culled_kernel_matches_plain():
    """The chunk-AABB culled kernel must produce identical winners to the
    plain kernel (culling is conservative)."""
    import jax.numpy as jnp
    from montecarlo_pathtracing_tpu.ops.pallas_trace import (
        group_best_rows, _pad_group, RAY_TILE)
    code = xs.CODE_SPHERE
    trf, inv, pid = _random_group(code, 200, 11)
    O, D = _random_rays(RAY_TILE * 2, 12)
    o = jnp.zeros((3, RAY_TILE * 2), jnp.float32).at[:, :].set(O.T)
    d = jnp.zeros((3, RAY_TILE * 2), jnp.float32).at[:, :].set(D.T)
    inv_r, trf_r, pidp = _pad_group(trf, inv, pid)
    # chunk AABBs from the padded group (world boxes of the spheres)
    import numpy as np
    centers = np.asarray(trf)[:, :3, 3]
    rad = np.abs(np.asarray(trf)[:, :3, :3]).sum(2).max(1) * 2.0
    nkc = inv_r.shape[1] // 128
    cbb = np.zeros((6, nkc), np.float32)
    for c in range(nkc):
        lo, hi = c * 128, min((c + 1) * 128, len(centers))
        if lo < len(centers):
            cbb[0:3, c] = (centers[lo:hi] - rad[lo:hi, None]).min(0)
            cbb[3:6, c] = (centers[lo:hi] + rad[lo:hi, None]).max(0)
        else:
            cbb[0:3, c] = 1.0
            cbb[3:6, c] = -1.0
    plain = group_best_rows(o, d, code, inv_r, trf_r, pidp,
                            cbb=None, interpret=True)
    culled = group_best_rows(o, d, code, inv_r, trf_r, pidp,
                             cbb=jnp.asarray(cbb), interpret=True)
    np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(culled[1]))
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(culled[0]))


def test_culled_mesh_kernel_matches_plain():
    """Triangle chunk-AABB culling must keep winners identical on a mesh
    spanning several kernel chunks (sphere(24) ~= 1.1k tris)."""
    import jax.numpy as jnp
    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.ops.pallas_trace import (
        mesh_best_rows, pad_tris, RAY_TILE)

    dev = compile_scene(scenes.build("mesh_demo"))
    mi = 0
    off, cnt = dev.mesh_tri_offset[mi], dev.mesh_tri_padded[mi]
    tri = pad_tris(dev.tri_va[off:off + cnt], dev.tri_vb[off:off + cnt],
                   dev.tri_vc[off:off + cnt])
    assert tri.shape[1] > 128, "fixture must span several chunks"
    O, D = _random_rays(RAY_TILE, 123)
    o = jnp.asarray(O.T)
    d = jnp.asarray(D.T)
    plain = mesh_best_rows(o, d, tri, cbb=None, interpret=True)
    culled = mesh_best_rows(o, d, tri, cbb=dev.mesh_chunk_bb[mi],
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(culled[1]))
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(culled[0]))


def test_trace_soa_cull_auto_matches_brute():
    """Whole-scene SoA trace: default (auto) culling == forced brute fold,
    on a scene with multi-chunk analytic groups AND a mesh."""
    import jax.numpy as jnp
    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.ops.trace import trace_soa
    from montecarlo_pathtracing_tpu.ops.pallas_trace import RAY_TILE

    for name in ("colonnes", "mesh_demo"):
        dev = compile_scene(scenes.build(name))
        O, D = _random_rays(RAY_TILE, hash(name) % 1000)
        o = tuple(jnp.asarray(O[:, c]) for c in range(3))
        d = tuple(jnp.asarray(D[:, c]) for c in range(3))
        brute = trace_soa(dev, o, d, interpret=True, cull_chunks=False)
        auto = trace_soa(dev, o, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(brute.prim),
                                      np.asarray(auto.prim), err_msg=name)
        np.testing.assert_array_equal(np.asarray(brute.tri),
                                      np.asarray(auto.tri), err_msg=name)
        np.testing.assert_array_equal(np.asarray(brute.dist),
                                      np.asarray(auto.dist), err_msg=name)
