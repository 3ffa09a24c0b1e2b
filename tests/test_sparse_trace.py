"""Block-sparse worklist kernels (ops/worklist.py, ops/sparse_trace.py):
winner parity with the brute kernels and the dense oracle path, plus
unit tests of the conservative bundle-vs-AABB vote and the worklist
compaction."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.ops.trace import trace_soa
from montecarlo_pathtracing_tpu.ops.worklist import (
    tile_bundles, bundle_box_votes, build_worklist)


def _rand_rays(m, lo=-30.0, hi=30.0, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    o = tuple(jax.random.uniform(k[i], (m,), jnp.float32, lo, hi)
              for i in range(3))
    dd = tuple(jax.random.normal(k[3 + i], (m,), jnp.float32)
               for i in range(3))
    n = jnp.sqrt(dd[0] ** 2 + dd[1] ** 2 + dd[2] ** 2)
    return o, tuple(c / n for c in dd)


@pytest.mark.parametrize("scene_name", ["colonnes", "mesh_demo"])
def test_sparse_matches_brute_winners(scene_name):
    """The occlusion refinement only ever skips work that provably can't
    beat a strictly-closer winner, so DISTANCES must be bit-identical to
    the brute fold. Winner IDENTITY may differ only on exact float
    distance ties between prims in different blocks (the nearest-first
    visit order picks a different—equally closest—winner; documented on
    mesh_best_rows_sparse / group_best_rows_sparse); colonnes' symmetric
    colonnade produces a handful of such ties."""
    dev = compile_scene(scenes.build(scene_name))
    o, d = _rand_rays(2048)
    h_sparse = trace_soa(dev, o, d, interpret=True)
    h_brute = trace_soa(dev, o, d, interpret=True, cull_chunks=False)
    np.testing.assert_array_equal(
        np.asarray(h_sparse.dist), np.asarray(h_brute.dist),
        err_msg="dist")
    tie = (np.asarray(h_sparse.prim) != np.asarray(h_brute.prim))
    assert tie.mean() < 0.01, f"{tie.sum()} winner diffs is too many for ties"
    for f in ("prim", "shape", "dircode", "tri"):
        a_, b_ = np.asarray(getattr(h_sparse, f)), np.asarray(
            getattr(h_brute, f))
        np.testing.assert_array_equal(a_[~tie], b_[~tie], err_msg=f)
    for f in ("pl", "pg"):
        for c in range(3):
            np.testing.assert_array_equal(
                np.asarray(getattr(h_sparse, f)[c])[~tie],
                np.asarray(getattr(h_brute, f)[c])[~tie],
                err_msg=f"{f}[{c}]")


def test_bundle_votes_conservative():
    """Every per-ray slab hit must be covered by its tile's bundle vote."""
    rng = np.random.default_rng(0)
    m, tile, s = 512, 128, 40
    o = rng.uniform(-10, 10, (3, m)).astype(np.float32)
    d = rng.normal(size=(3, m)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    lo = rng.uniform(-12, 8, (3, s)).astype(np.float32)
    boxes = np.concatenate([lo, lo + rng.uniform(0.5, 4, (3, s))]).astype(
        np.float32)
    votes = np.asarray(bundle_box_votes(
        tile_bundles(jnp.asarray(o), jnp.asarray(d), tile),
        jnp.asarray(boxes)))
    # reference per-ray slab test
    with np.errstate(divide="ignore", invalid="ignore"):
        rd = np.where(np.abs(d) < 1e-30, 1e30, 1.0 / d)
        t0 = (boxes[None, 0:3, :] - o.T[:, :, None]) * rd.T[:, :, None]
        t1 = (boxes[None, 3:6, :] - o.T[:, :, None]) * rd.T[:, :, None]
    tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
    tmax = np.maximum(t0, t1).min(axis=1)
    ray_hit = tmax >= tmin                      # [m, s]
    tile_hit = ray_hit.reshape(m // tile, tile, s).any(axis=1)
    missed = tile_hit & ~votes
    assert not missed.any(), f"votes missed {missed.sum()} tile-chunk hits"


def test_build_worklist_structure():
    votes = jnp.asarray(np.array([
        [0, 1, 0, 1],       # tile 0: chunks 1, 3
        [0, 0, 0, 0],       # tile 1: none (sentinel only)
        [1, 1, 1, 1],       # tile 2: all
    ], bool))
    tid, bid, n, overflow = build_worklist(votes, 5)
    tid, bid = np.asarray(tid), np.asarray(bid)
    assert int(n) == 3 + 2 + 0 + 4
    assert not bool(overflow)
    real = list(zip(tid[:int(n)], bid[:int(n)]))
    assert real == [(0, -1), (0, 1), (0, 3), (1, -1),
                    (2, -1), (2, 0), (2, 1), (2, 2), (2, 3)]
    # tail padding: last tile's sentinel, monotone
    assert all(t == 2 and b == -1 for t, b in zip(tid[int(n):], bid[int(n):]))
    # every tile visited
    assert set(tid[:int(n)]) == {0, 1, 2}


def test_build_worklist_overflow_flag():
    votes = jnp.ones((4, 10), bool)
    _, _, n, overflow = build_worklist(votes, 4)   # wmax 16 < 44
    assert bool(overflow)
    assert int(n) == 16
