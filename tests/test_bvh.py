"""BVH builder: invariants + exact equivalence with a direct recursive
transcription of the reference algorithm (bvh_gpu/bvh.cpp:18-93)."""
import numpy as np
import pytest

from montecarlo_pathtracing_tpu.scene.bvh_builder import (
    build_bvh, check_invariants)


def _reference_build(centers, bbmin, bbmax):
    """Direct reimplementation of BVH_KDtree::compute (bvh.cpp:34-93):
    iterative split levels via median partition (np.argsort stands in for
    nth_element — same element ranks; within-pair order normalized
    ascending, which the builder also guarantees)."""
    n = len(centers)
    ids = list(range(n))
    splt = [0, n]
    depth = int(np.ceil(np.log2(n)))
    d = 0
    for _ in range(1, depth):
        splt2 = [splt[0]]
        for i in range(1, len(splt)):
            j0, j2 = splt[i - 1], splt[i]
            j1 = (j0 + j2) // 2
            seg = sorted(ids[j0:j2], key=lambda a: centers[a][d])
            ids[j0:j2] = seg
            splt2 += [j1, j2]
        splt = splt2
        d = (d + 1) % 3
    sz_leaf = 1 << depth
    sz = 2 * sz_leaf - 1
    ind = np.empty(sz_leaf, np.int32)
    bmin = np.zeros((sz, 3), np.float32)
    bmax = np.zeros((sz, 3), np.float32)
    j, k = sz - 1, sz_leaf - 1
    for i in range(len(splt) - 1, 0, -1):
        a = splt[i - 1]
        if splt[i] - a == 1:
            idx = ids[a]
            ind[k], ind[k - 1] = -1, idx
            bmin[j], bmax[j] = bbmin[idx], bbmax[idx]
            bmin[j - 1], bmax[j - 1] = bbmin[idx], bbmax[idx]
        else:
            # within-pair ascending by the last split axis
            a0, a1 = ids[a], ids[a + 1]
            last_axis = (depth - 2) % 3 if depth >= 2 else 0
            if centers[a1][last_axis] < centers[a0][last_axis]:
                a0, a1 = a1, a0
            ind[k], ind[k - 1] = a1, a0
            bmin[j], bmax[j] = bbmin[a1], bbmax[a1]
            bmin[j - 1], bmax[j - 1] = bbmin[a0], bbmax[a0]
        k -= 2
        j -= 2
    k = sz - 1
    while k >= 2:
        bmin[(k - 2) // 2] = np.minimum(bmin[k], bmin[k - 1])
        bmax[(k - 2) // 2] = np.maximum(bmax[k], bmax[k - 1])
        k -= 2
    return bmin, bmax, ind, depth


def _random_boxes(n, seed):
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-100, 100, (n, 3)).astype(np.float32)
    half = rs.uniform(0.5, 5.0, (n, 3)).astype(np.float32)
    return centers, (centers - half).astype(np.float32), \
        (centers + half).astype(np.float32)


@pytest.mark.parametrize("n", [2, 3, 5, 8, 9, 17, 64, 100, 255, 257])
def test_invariants(n):
    c, mn, mx = _random_boxes(n, n)
    bvh = build_bvh(c, mn, mx, use_native=False)
    check_invariants(bvh, n)
    assert bvh.depth == int(np.ceil(np.log2(n)))
    # root box is the union of all prim boxes
    np.testing.assert_allclose(bvh.bb_min[0], mn.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(bvh.bb_max[0], mx.max(axis=0), rtol=1e-6)


@pytest.mark.parametrize("n", [2, 5, 8, 13, 33, 100])
def test_matches_reference_algorithm(n):
    c, mn, mx = _random_boxes(n, 1000 + n)
    bvh = build_bvh(c, mn, mx, use_native=False)
    rmin, rmax, rind, rdepth = _reference_build(c, mn, mx)
    assert bvh.depth == rdepth
    np.testing.assert_array_equal(bvh.leaf, rind)
    np.testing.assert_allclose(bvh.bb_min, rmin)
    np.testing.assert_allclose(bvh.bb_max, rmax)


def test_single_prim():
    c, mn, mx = _random_boxes(1, 7)
    bvh = build_bvh(c, mn, mx, use_native=False)
    assert bvh.depth == 0
    assert list(bvh.leaf) == [0]
