"""Pallas TPU fused trace kernel: transform + intersect + arg-min fold.

The dense path (ops/intersect.py) materializes [rays, chunk] intermediates
between XLA fusions, so scene traversal is HBM-bandwidth-bound. This
kernel keeps the whole fold in VMEM, flash-attention style:

  grid = (ray_tiles,); per tile the kernel loops over primitive chunks,
  computing local-frame intersections for a [T, C] block and folding a
  running (best_dist, best_prim, best_a, best_dir) per ray in registers —
  HBM traffic collapses to rays-in + winners-out.

Data layout is SoA: rays as [3, N] coordinate rows, primitive transforms
as [12, P] affine rows (r00 r01 r02 tx r10 ... tz), so every op is a
[T, C] = [ray, prim] outer-broadcast on the VPU with clean (8, 128)
tiling. The per-chunk winner is selected with a one-hot sum instead of a
cross-lane gather (argmin + equality mask — Mosaic-friendly).

Semantics are IDENTICAL to ops/intersect.py (same formulas, same EPSILON
comparisons, same strict-closer fold, world-space distances); parity is
asserted in tests/test_pallas_trace.py over every shape type. The winner's
hit point is reconstructed OUTSIDE the kernel from (prim, a) by the
wrapper — the kernel returns only per-ray scalars.

Cites: intersect_prim / per-shape intersectors of the reference
(shaders/raytracer_func.frag:354-705) — see ops/intersect.py for the
quirk-by-quirk mapping.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import (
    Hit, EPSILON, FLT_MAX, CODE_SPHERE, CODE_CUBE, CODE_CYLINDER,
    CODE_CONE, CODE_ORIENTED_QUAD, _better,
)
from ..utils.transforms import normalize, PRECISION

RAY_TILE = 1024     # rays per kernel invocation (sublane-major [T, C])
PRIM_CHUNK = 128    # primitives per inner fold step (lane dim)


# ---------------------------------------------------------------------------
# SoA shape tests over [T, C] blocks. Each returns (a, valid, dircode)
# given local-frame ray components. Mirrors intersect.py exactly.
# ---------------------------------------------------------------------------

def _sphere_soa(ox, oy, oz, dx, dy, dz):
    OO = ox * ox + oy * oy + oz * oz
    OD = ox * dx + oy * dy + oz * dz
    D2 = dx * dx + dy * dy + dz * dz
    delta4 = OD * OD - D2 * (OO - 1.0)
    sq = jnp.sqrt(jnp.maximum(delta4, 0.0))
    a1 = -(OD + sq) / D2
    a2 = -(OD - sq) / D2
    ok = delta4 > 0.0
    v1 = ok & (a1 > EPSILON)
    v2 = ok & (a2 > EPSILON)
    a = jnp.where(v1, a1, jnp.where(v2, a2, FLT_MAX))
    return a, v1 | v2, jnp.zeros_like(a, jnp.int32)


def _quad_soa(ox, oy, oz, dx, dy, dz):
    facing = dz <= -EPSILON
    a = -oz / dz
    px = ox + a * dx
    py = oy + a * dy
    inside = (jnp.abs(px) <= 1.0) & (jnp.abs(py) <= 1.0)
    valid = facing & inside
    return jnp.where(valid, a, FLT_MAX), valid, jnp.zeros_like(a, jnp.int32)


def _cube_soa(ox, oy, oz, dx, dy, dz):
    o = (ox, oy, oz)
    d = (dx, dy, dz)
    al = jnp.full_like(ox, FLT_MAX)
    face = jnp.zeros_like(ox, jnp.int32)
    for c in range(6):
        c0 = c // 2
        c1 = (c0 + 1) % 3
        c2 = (c0 + 2) % 3
        cd = np.float32(-1.0 + 2.0 * (c % 2))
        a = (cd - o[c0]) / d[c0]
        v = (
            (jnp.abs(d[c0]) > EPSILON)
            & (a > EPSILON)
            & (jnp.abs(o[c1] + a * d[c1]) <= 1.0)
            & (jnp.abs(o[c2] + a * d[c2]) <= 1.0)
            & (a < al)
        )
        al = jnp.where(v, a, al)
        face = jnp.where(v, c, face)
    return al, al < FLT_MAX, face


def _cylinder_soa(ox, oy, oz, dx, dy, dz):
    al = jnp.full_like(ox, FLT_MAX)
    cl = jnp.full_like(ox, -1, jnp.int32)
    dz_ok = jnp.abs(dz) > EPSILON
    for code, zplane in ((0, -1.0), (1, 1.0)):
        a = (np.float32(zplane) - oz) / dz
        rx = ox + a * dx
        ry = oy + a * dy
        v = dz_ok & (a > EPSILON) & (rx * rx + ry * ry < 1.0) & (a < al)
        al = jnp.where(v, a, al)
        cl = jnp.where(v, code, cl)
    O2 = ox * ox + oy * oy
    OD = ox * dx + oy * dy
    D2 = dx * dx + dy * dy
    delta4 = OD * OD - D2 * (O2 - 1.0)
    a = -(OD + jnp.sqrt(jnp.maximum(delta4, 0.0))) / D2
    z = oz + a * dz
    v = (delta4 > 0.0) & (a > EPSILON) & (a < al) & (jnp.abs(z) < 1.0)
    al = jnp.where(v, a, al)
    cl = jnp.where(v, 2, cl)
    return al, al < FLT_MAX, cl


def _cone_soa(ox, oy, oz, dx, dy, dz):
    tl = jnp.full_like(ox, FLT_MAX)
    cl = jnp.full_like(ox, -1, jnp.int32)
    t0 = (-1.0 - oz) / dz
    rx = ox + t0 * dx
    ry = oy + t0 * dy
    v = ((jnp.abs(dz) > EPSILON) & (t0 > EPSILON)
         & (rx * rx + ry * ry < 1.0) & (t0 < tl))
    tl = jnp.where(v, t0, tl)
    cl = jnp.where(v, 0, cl)
    coz = oz - 1.0
    dco = dx * ox + dy * oy + dz * coz
    coco = ox * ox + oy * oy + coz * coz
    a_ = dz * dz - np.float32(0.8)
    b_ = 2.0 * (dz * coz - dco * np.float32(0.8))
    c_ = coz * coz - coco * np.float32(0.8)
    det = b_ * b_ - 4.0 * a_ * c_
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t1 = (-b_ - sq) / (2.0 * a_)
    t2 = (-b_ + sq) / (2.0 * a_)
    t1 = jnp.where(jnp.abs(oz + t1 * dz) > 1.0, FLT_MAX, t1)
    t2 = jnp.where(jnp.abs(oz + t2 * dz) > 1.0, FLT_MAX, t2)
    t = jnp.minimum(t1, t2)
    v = (det > 0.0) & (t < tl)
    tl = jnp.where(v, t, tl)
    cl = jnp.where(v, 2, cl)
    return tl, tl < FLT_MAX, cl


_SOA_FNS = {
    CODE_SPHERE: _sphere_soa,
    CODE_CUBE: _cube_soa,
    CODE_CYLINDER: _cylinder_soa,
    CODE_CONE: _cone_soa,
    CODE_ORIENTED_QUAD: _quad_soa,
}


def _group_kernel_plain(shape_code, nchunks,
                  o_ref, d_ref, inv_ref, trf_ref, pid_ref,
                  dist_ref, prim_ref, a_ref, dir_ref):
    """One ray tile vs all primitives of a homogeneous group."""
    fn = _SOA_FNS[shape_code]
    # per-ray columns [T, 1]
    ox, oy, oz = (o_ref[c, :][:, None] for c in range(3))
    dx, dy, dz = (d_ref[c, :][:, None] for c in range(3))
    T = ox.shape[0]

    def chunk_body(c, carry):
        bd, bp, ba, bdir = carry
        s = pl.ds(c * PRIM_CHUNK, PRIM_CHUNK)
        inv = [inv_ref[r, s][None, :] for r in range(12)]   # [1, C] each
        trf = [trf_ref[r, s][None, :] for r in range(12)]
        pid = pid_ref[0, s][None, :]

        # local-frame ray (affine inverse transform), direction normalized
        lox = inv[0] * ox + inv[1] * oy + inv[2] * oz + inv[3]
        loy = inv[4] * ox + inv[5] * oy + inv[6] * oz + inv[7]
        loz = inv[8] * ox + inv[9] * oy + inv[10] * oz + inv[11]
        tdx = inv[0] * dx + inv[1] * dy + inv[2] * dz
        tdy = inv[4] * dx + inv[5] * dy + inv[6] * dz
        tdz = inv[8] * dx + inv[9] * dy + inv[10] * dz
        nrm = jnp.sqrt(tdx * tdx + tdy * tdy + tdz * tdz)
        nrm = jnp.maximum(nrm, np.float32(1e-30))
        ldx, ldy, ldz = tdx / nrm, tdy / nrm, tdz / nrm

        a, valid, dircode = fn(lox, loy, loz, ldx, ldy, ldz)   # [T, C]
        valid = valid & (pid >= 0)

        # world hit point + world distance (the fold metric)
        plx = lox + a * ldx
        ply = loy + a * ldy
        plz = loz + a * ldz
        pgx = trf[0] * plx + trf[1] * ply + trf[2] * plz + trf[3]
        pgy = trf[4] * plx + trf[5] * ply + trf[6] * plz + trf[7]
        pgz = trf[8] * plx + trf[9] * ply + trf[10] * plz + trf[11]
        ex, ey, ez = ox - pgx, oy - pgy, oz - pgz
        dist = jnp.sqrt(ex * ex + ey * ey + ez * ez)
        dist = jnp.where(valid, dist, FLT_MAX)

        # chunk winner via one-hot (first-min, matching jnp.argmin)
        cmin = jnp.min(dist, axis=1, keepdims=True)            # [T, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        is_min = dist == cmin
        first = jnp.min(jnp.where(is_min, iota, PRIM_CHUNK), axis=1,
                        keepdims=True)
        onehot = iota == first
        zf = jnp.zeros_like(dist)
        zi = jnp.zeros_like(dist, jnp.int32)
        w_a = jnp.sum(jnp.where(onehot, a, zf), axis=1, keepdims=True)
        w_row = first + c * PRIM_CHUNK                          # group row
        w_dir = jnp.sum(jnp.where(onehot, dircode + zi, zi), axis=1,
                        keepdims=True)

        take = cmin < bd                                        # [T, 1]
        return (
            jnp.where(take, cmin, bd),
            jnp.where(take, w_row, bp),
            jnp.where(take, w_a, ba),
            jnp.where(take, w_dir, bdir),
        )

    init = (
        jnp.full((T, 1), FLT_MAX, jnp.float32),
        jnp.full((T, 1), -1, jnp.int32),
        jnp.zeros((T, 1), jnp.float32),
        jnp.full((T, 1), -1, jnp.int32),
    )
    bd, brow, ba, bdir = jax.lax.fori_loop(0, nchunks, chunk_body, init)
    dist_ref[0, :] = bd[:, 0]
    prim_ref[0, :] = jnp.where(bd[:, 0] < FLT_MAX, brow[:, 0], -1)
    a_ref[0, :] = ba[:, 0]
    dir_ref[0, :] = bdir[:, 0]


def _safe_rcp(x):
    """1/x with exact-zero components clamped to a huge FINITE value so the
    slab test below never produces inf*0 = NaN (bounce rays can carry exact
    zeros: TIR refract returns vec3(0), padded lanes ride unit-z). NaN in a
    slab bound would silently cull a chunk a degenerate ray 'hits'; huge
    finite bounds stay conservative instead."""
    tiny = np.float32(1e-30)
    ax = jnp.abs(x)
    sgn = jnp.where(x < 0.0, np.float32(-1.0), np.float32(1.0))
    return sgn / jnp.maximum(ax, tiny)


def _group_kernel_culled(shape_code, nchunks,
                  o_ref, d_ref, inv_ref, trf_ref, pid_ref, cbb_ref,
                  dist_ref, prim_ref, a_ref, dir_ref,
                  bd_s, brow_s, ba_s, bdir_s):
    """One ray tile vs all primitives of a homogeneous group.

    Chunk culling: cbb_ref (SMEM [6, nchunks]) holds per-chunk world
    AABBs (Morton-coherent, scene/device.py); a chunk is skipped when no
    ray in the tile enters its box closer than that ray's current best
    (rays must be unit-length world directions so the slab parameter IS
    world distance). Conservative, so winners are unchanged — the TPU
    frontier-culling answer to the reference's per-ray BVH stack walk.
    The running best lives in VMEM scratch and the skip is a @pl.when
    predicated block (a carry-passing lax.cond stalls the Mosaic
    pipeline/compile).
    """
    fn = _SOA_FNS[shape_code]
    # per-ray columns [T, 1]
    ox, oy, oz = (o_ref[c, :][:, None] for c in range(3))
    dx, dy, dz = (d_ref[c, :][:, None] for c in range(3))
    rdx, rdy, rdz = _safe_rcp(dx), _safe_rcp(dy), _safe_rcp(dz)

    bd_s[:] = jnp.full_like(bd_s[:], FLT_MAX)
    brow_s[:] = jnp.full_like(brow_s[:], -1)
    ba_s[:] = jnp.zeros_like(ba_s[:])
    bdir_s[:] = jnp.full_like(bdir_s[:], -1)

    def chunk_body(c, _):
        bd0 = bd_s[:]
        t0x = (cbb_ref[0, c] - ox) * rdx
        t1x = (cbb_ref[3, c] - ox) * rdx
        t0y = (cbb_ref[1, c] - oy) * rdy
        t1y = (cbb_ref[4, c] - oy) * rdy
        t0z = (cbb_ref[2, c] - oz) * rdz
        t1z = (cbb_ref[5, c] - oz) * rdz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z))
        boxhit = (tmax >= tmin) & (tmin <= bd0)

        @pl.when(jnp.any(boxhit))
        def _():
            s = pl.ds(c * PRIM_CHUNK, PRIM_CHUNK)
            inv = [inv_ref[r, s][None, :] for r in range(12)]   # [1, C]
            trf = [trf_ref[r, s][None, :] for r in range(12)]
            pid = pid_ref[0, s][None, :]

            # local-frame ray (affine inverse), direction normalized
            lox = inv[0] * ox + inv[1] * oy + inv[2] * oz + inv[3]
            loy = inv[4] * ox + inv[5] * oy + inv[6] * oz + inv[7]
            loz = inv[8] * ox + inv[9] * oy + inv[10] * oz + inv[11]
            tdx = inv[0] * dx + inv[1] * dy + inv[2] * dz
            tdy = inv[4] * dx + inv[5] * dy + inv[6] * dz
            tdz = inv[8] * dx + inv[9] * dy + inv[10] * dz
            nrm = jnp.sqrt(tdx * tdx + tdy * tdy + tdz * tdz)
            nrm = jnp.maximum(nrm, np.float32(1e-30))
            ldx, ldy, ldz = tdx / nrm, tdy / nrm, tdz / nrm

            a, valid, dircode = fn(lox, loy, loz, ldx, ldy, ldz)  # [T, C]
            valid = valid & (pid >= 0)

            # world hit point + world distance (the fold metric)
            plx = lox + a * ldx
            ply = loy + a * ldy
            plz = loz + a * ldz
            pgx = trf[0] * plx + trf[1] * ply + trf[2] * plz + trf[3]
            pgy = trf[4] * plx + trf[5] * ply + trf[6] * plz + trf[7]
            pgz = trf[8] * plx + trf[9] * ply + trf[10] * plz + trf[11]
            ex, ey, ez = ox - pgx, oy - pgy, oz - pgz
            dist = jnp.sqrt(ex * ex + ey * ey + ez * ez)
            dist = jnp.where(valid, dist, FLT_MAX)

            # chunk winner via one-hot (first-min, matching jnp.argmin)
            cmin = jnp.min(dist, axis=1, keepdims=True)           # [T, 1]
            iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            is_min = dist == cmin
            first = jnp.min(jnp.where(is_min, iota, PRIM_CHUNK), axis=1,
                            keepdims=True)
            onehot = iota == first
            zf = jnp.zeros_like(dist)
            zi = jnp.zeros_like(dist, jnp.int32)
            w_a = jnp.sum(jnp.where(onehot, a, zf), axis=1, keepdims=True)
            w_row = first + c * PRIM_CHUNK                        # group row
            w_dir = jnp.sum(jnp.where(onehot, dircode + zi, zi), axis=1,
                            keepdims=True)

            take = cmin < bd_s[:]                                 # [T, 1]
            bd_s[:] = jnp.where(take, cmin, bd_s[:])
            brow_s[:] = jnp.where(take, w_row, brow_s[:])
            ba_s[:] = jnp.where(take, w_a, ba_s[:])
            bdir_s[:] = jnp.where(take, w_dir, bdir_s[:])

        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)
    bd = bd_s[:, 0]
    dist_ref[0, :] = bd
    prim_ref[0, :] = jnp.where(bd < FLT_MAX, brow_s[:, 0], -1)
    a_ref[0, :] = ba_s[:, 0]
    dir_ref[0, :] = bdir_s[:, 0]


def _affine_rows(m):
    """[P,4,4] -> [12,P] affine rows (r00 r01 r02 tx r10..)."""
    r = m[:, :3, :4].reshape(m.shape[0], 12)
    return jnp.transpose(r, (1, 0))


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _pad_group(transfo, inv, prim_idx):
    """Pad a group's transform tables to PRIM_CHUNK lanes as [12, ppad]
    affine rows + [1, ppad] scene ids."""
    p = transfo.shape[0]
    ppad = _round_up(p, PRIM_CHUNK)
    inv_r = jnp.zeros((12, ppad), jnp.float32).at[:, :p].set(_affine_rows(inv))
    trf_r = jnp.zeros((12, ppad), jnp.float32).at[:, :p].set(
        _affine_rows(transfo))
    pid = jnp.full((1, ppad), -1, jnp.int32).at[0, :p].set(prim_idx)
    return inv_r, trf_r, pid


def group_best_rows(o, d, shape_code, inv_r, trf_r, pid, cbb=None,
                    interpret=False):
    """SoA core: o, d [3, npad] ray rows (npad multiple of RAY_TILE, UNIT
    directions — required by the distance-based chunk culling), padded
    prim tables from _pad_group, cbb [6, nchunks] world chunk AABBs (None
    = no culling). Returns (dist, row, a, dircode) each [npad]; row is
    the GROUP row of the winner (-1 = miss)."""
    npad = o.shape[1]
    ppad = inv_r.shape[1]
    grid = (npad // RAY_TILE,)
    cull = cbb is not None
    if not cull:
        nkc = ppad // PRIM_CHUNK
        cbb = jnp.tile(jnp.array([[-3e38]] * 3 + [[3e38]] * 3,
                                 jnp.float32), (1, nkc))
    kern_fn = _group_kernel_culled if cull else _group_kernel_plain
    kernel = functools.partial(kern_fn, shape_code, ppad // PRIM_CHUNK)
    out_shape = [
        jax.ShapeDtypeStruct((1, npad), jnp.float32),
        jax.ShapeDtypeStruct((1, npad), jnp.int32),
        jax.ShapeDtypeStruct((1, npad), jnp.float32),
        jax.ShapeDtypeStruct((1, npad), jnp.int32),
    ]
    ray_spec = pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    full12 = pl.BlockSpec((12, ppad), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    full1 = pl.BlockSpec((1, ppad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    nchunks = ppad // PRIM_CHUNK
    cbb_spec = pl.BlockSpec((6, nchunks), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    if cull:
        dist, row, a, dircode = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[ray_spec, ray_spec, full12, full12, full1, cbb_spec],
            out_specs=[out_spec] * 4,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((RAY_TILE, 1), jnp.float32),
                pltpu.VMEM((RAY_TILE, 1), jnp.int32),
                pltpu.VMEM((RAY_TILE, 1), jnp.float32),
                pltpu.VMEM((RAY_TILE, 1), jnp.int32),
            ],
            interpret=interpret,
        )(o, d, inv_r, trf_r, pid, cbb)
    else:
        dist, row, a, dircode = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[ray_spec, ray_spec, full12, full12, full1],
            out_specs=[out_spec] * 4,
            out_shape=out_shape,
            interpret=interpret,
        )(o, d, inv_r, trf_r, pid)
    return dist[0], row[0], a[0], dircode[0]


@functools.partial(jax.jit, static_argnames=("shape_code", "interpret"))
def _group_best(O, D, shape_code, transfo, inv, prim_idx, interpret=False):
    """AoS wrapper around group_best_rows. O, D: [N,3]."""
    n = O.shape[0]
    npad = _round_up(n, RAY_TILE)
    o = jnp.zeros((3, npad), jnp.float32).at[:, :n].set(O.T)
    d = jnp.ones((3, npad), jnp.float32).at[:, :n].set(D.T)
    inv_r, trf_r, pid = _pad_group(transfo, inv, prim_idx)
    dist, row, a, dircode = group_best_rows(
        o, d, shape_code, inv_r, trf_r, pid, interpret=interpret)
    return dist[:n], row[:n], a[:n], dircode[:n]


def trace_analytic_group_pallas(best: Hit, O, D, shape_code,
                                transfo, inv, prim_idx, *,
                                interpret=False) -> Hit:
    """Drop-in replacement for intersect.trace_analytic_group: fold one
    group into the running best via the fused kernel. The winner's
    local/world hit points are reconstructed outside the kernel from the
    winning group row (cheap [N] gathers instead of [N, C, 3] blocks)."""
    dist, row, a, dircode = _group_best(
        O, D, shape_code, transfo, inv, prim_idx, interpret=interpret)

    ok = row >= 0
    r = jnp.where(ok, row, 0)
    inv_w = jnp.take(inv, r, axis=0)          # [N,4,4]
    trf_w = jnp.take(transfo, r, axis=0)
    pid_w = jnp.where(ok, jnp.take(prim_idx, r), -1)

    oi = jnp.einsum("nij,nj->ni", inv_w[:, :3, :3], O,
                    precision=PRECISION) + inv_w[:, :3, 3]
    di = jnp.einsum("nij,nj->ni", inv_w[:, :3, :3], D, precision=PRECISION)
    di = normalize(di)
    plh = oi + a[:, None] * di
    pgh = jnp.einsum("nij,nj->ni", trf_w[:, :3, :3], plh,
                     precision=PRECISION) + trf_w[:, :3, 3]

    cand = Hit(
        dist=jnp.where(ok, dist, FLT_MAX),
        pl=plh,
        pg=pgh,
        prim=pid_w,
        shape=jnp.where(ok, shape_code, -1).astype(jnp.int32),
        dircode=dircode,
        tri=jnp.full(dist.shape, -1, jnp.int32),
    )
    return _better(best, cand)


# ---------------------------------------------------------------------------
# Mesh-triangle fused kernel: Moller-Trumbore fold over triangle chunks.
# Within one mesh instance, world distance = a * |M . Di| is monotone in the
# local ray parameter (the world origin lies on the transformed ray), so the
# kernel folds on `a` alone; the wrapper maps the winner back to world space
# and the cross-instance world-distance compare happens outside.
# (Triangle_intersect analog, raytracer_func.frag:354-396.)
# ---------------------------------------------------------------------------

def _tri_kernel(nchunks, o_ref, d_ref, tri_ref, a_ref, row_ref):
    ox, oy, oz = (o_ref[c, :][:, None] for c in range(3))
    dx, dy, dz = (d_ref[c, :][:, None] for c in range(3))
    T = ox.shape[0]

    def chunk_body(c, carry):
        ba, brow = carry
        s = pl.ds(c * PRIM_CHUNK, PRIM_CHUNK)
        v = [tri_ref[r, s][None, :] for r in range(9)]  # ax ay az bx .. cz
        e1x, e1y, e1z = v[3] - v[0], v[4] - v[1], v[5] - v[2]
        e2x, e2y, e2z = v[6] - v[0], v[7] - v[1], v[8] - v[2]
        # h = cross(D, e2)
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        invd = 1.0 / det
        sx, sy, sz = ox - v[0], oy - v[1], oz - v[2]
        u = (sx * hx + sy * hy + sz * hz) * invd
        # q = cross(s, e1)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        vv = (dx * qx + dy * qy + dz * qz) * invd
        a = (e2x * qx + e2y * qy + e2z * qz) * invd
        valid = ((jnp.abs(det) >= EPSILON)
                 & (u >= 0.0) & (u <= 1.0)
                 & (vv >= 0.0) & (u + vv <= 1.0)
                 & (a > EPSILON))
        a = jnp.where(valid, a, FLT_MAX)

        cmin = jnp.min(a, axis=1, keepdims=True)
        iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        first = jnp.min(jnp.where(a == cmin, iota, PRIM_CHUNK), axis=1,
                        keepdims=True)
        w_row = first + c * PRIM_CHUNK
        take = cmin < ba
        return jnp.where(take, cmin, ba), jnp.where(take, w_row, brow)

    init = (jnp.full((T, 1), FLT_MAX, jnp.float32),
            jnp.full((T, 1), -1, jnp.int32))
    ba, brow = jax.lax.fori_loop(0, nchunks, chunk_body, init)
    a_ref[0, :] = ba[:, 0]
    row_ref[0, :] = jnp.where(ba[:, 0] < FLT_MAX, brow[:, 0], -1)


def _tri_kernel_culled(nsuper, super_k, nchunks_real,
                       o_ref, d_ref, tri_ref, cbb_ref,
                       sbb_ref, a_ref, row_ref, ba_s, brow_s):
    """Triangle fold with TWO-LEVEL AABB frontier culling — the device
    half of the per-mesh acceleration structure (Mesh_intersect /
    intersect_bvm analog, raytracer_func.frag:642-678, 273-311).

    sbb_ref: SMEM [6, nsuper] super-chunk boxes (super_k=TRI_SUPER leaf
    chunks each); cbb_ref: SMEM [6, nsuper*super_k] leaf boxes over
    Morton-coherent 128-triangle chunks, padded with empty boxes
    (scene/device.py). Rays are mesh-local with UNIT directions, so the
    slab parameter is directly comparable to the running best `a`. A ray
    tile that misses a super skips its super_k leaf tests AND bodies; a
    leaf chunk is skipped when no ray can beat its best inside the box —
    conservative both levels, identical winners."""
    ox, oy, oz = (o_ref[c, :][:, None] for c in range(3))
    dx, dy, dz = (d_ref[c, :][:, None] for c in range(3))
    rdx, rdy, rdz = _safe_rcp(dx), _safe_rcp(dy), _safe_rcp(dz)

    ba_s[:] = jnp.full_like(ba_s[:], FLT_MAX)
    brow_s[:] = jnp.full_like(brow_s[:], -1)

    def _slab(ref, c, bound):
        t0x = (ref[0, c] - ox) * rdx
        t1x = (ref[3, c] - ox) * rdx
        t0y = (ref[1, c] - oy) * rdy
        t1y = (ref[4, c] - oy) * rdy
        t0z = (ref[2, c] - oz) * rdz
        t1z = (ref[5, c] - oz) * rdz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z))
        return (tmax >= tmin) & (tmin <= bound)

    def chunk_body(c, _):
        boxhit = _slab(cbb_ref, c, ba_s[:])
        # Chunk indices run to the super-aligned padded count; pads carry
        # empty boxes so the body SHOULD be skipped — but clamp the data
        # index anyway so a mispredicated pad chunk re-tests the last
        # REAL chunk instead of slicing out of bounds (equal candidates
        # never replace the strictly-closer winner, so a spurious body
        # execution is harmless; an OOB slice is garbage). Round-2
        # lesson: Mosaic executed pad-chunk bodies that interpret mode
        # (correctly) skipped, turning OOB reads into phantom hits.
        cc = jnp.minimum(c, nchunks_real - 1)

        @pl.when(jnp.any(boxhit))
        def _():
            s = pl.ds(cc * PRIM_CHUNK, PRIM_CHUNK)
            v = [tri_ref[r, s][None, :] for r in range(9)]
            e1x, e1y, e1z = v[3] - v[0], v[4] - v[1], v[5] - v[2]
            e2x, e2y, e2z = v[6] - v[0], v[7] - v[1], v[8] - v[2]
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            invd = 1.0 / det
            sx, sy, sz = ox - v[0], oy - v[1], oz - v[2]
            u = (sx * hx + sy * hy + sz * hz) * invd
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * invd
            a = (e2x * qx + e2y * qy + e2z * qz) * invd
            valid = ((jnp.abs(det) >= EPSILON)
                     & (u >= 0.0) & (u <= 1.0)
                     & (vv >= 0.0) & (u + vv <= 1.0)
                     & (a > EPSILON))
            a = jnp.where(valid, a, FLT_MAX)

            cmin = jnp.min(a, axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            first = jnp.min(jnp.where(a == cmin, iota, PRIM_CHUNK), axis=1,
                            keepdims=True)
            w_row = first + cc * PRIM_CHUNK
            take = cmin < ba_s[:]
            ba_s[:] = jnp.where(take, cmin, ba_s[:])
            brow_s[:] = jnp.where(take, w_row, brow_s[:])

        return 0

    def super_body(sc, _):
        shit = _slab(sbb_ref, sc, ba_s[:])

        @pl.when(jnp.any(shit))
        def _():
            # static trip count + offset index: a traced-bound fori
            # lowers to a while loop and multiplies Mosaic compile time
            jax.lax.fori_loop(
                0, super_k,
                lambda j, _: chunk_body(sc * super_k + j, _), 0)

        return 0

    jax.lax.fori_loop(0, nsuper, super_body, 0)
    ba = ba_s[:, 0]
    a_ref[0, :] = ba
    row_ref[0, :] = jnp.where(ba < FLT_MAX, brow_s[:, 0], -1)


def mesh_best_rows(o, d, tri, cbb=None, sbb=None, interpret=False):
    """SoA core: o, d [3, npad] MESH-LOCAL ray rows (d normalized — UNIT,
    required by the chunk culling), tri [9, ppad] corner rows, cbb
    [6, nchunks] mesh-local leaf chunk AABBs (None = brute fold), sbb
    [6, nsuper] super-chunk AABBs (None = synthesize always-pass supers;
    cbb width must then be padded here to a super multiple). Returns
    (a, row) each [npad]."""
    npad = o.shape[1]
    ppad = tri.shape[1]
    grid = (npad // RAY_TILE,)
    ray_spec = pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((9, ppad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, npad), jnp.float32),
                 jax.ShapeDtypeStruct((1, npad), jnp.int32)]
    if cbb is not None:
        if sbb is None:
            ncb = cbb.shape[1]
            pad_to = _round_up(ncb, 16)
            if pad_to != ncb:
                empty = jnp.tile(
                    jnp.array([[1.0]] * 3 + [[-1.0]] * 3, jnp.float32),
                    (1, pad_to - ncb))
                cbb = jnp.concatenate([cbb, empty], axis=1)
            sbb = jnp.tile(jnp.array([[-3e38]] * 3 + [[3e38]] * 3,
                                     jnp.float32), (1, pad_to // 16))
        nsuper = sbb.shape[1]
        super_k = cbb.shape[1] // nsuper
        cbb_spec = pl.BlockSpec((6, cbb.shape[1]), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        sbb_spec = pl.BlockSpec((6, nsuper), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        a, row = pl.pallas_call(
            functools.partial(_tri_kernel_culled, nsuper, super_k,
                              ppad // PRIM_CHUNK),
            grid=grid,
            in_specs=[ray_spec, ray_spec, tri_spec, cbb_spec, sbb_spec],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((RAY_TILE, 1), jnp.float32),
                pltpu.VMEM((RAY_TILE, 1), jnp.int32),
            ],
            interpret=interpret,
        )(o, d, tri, cbb, sbb)
        return a[0], row[0]
    a, row = pl.pallas_call(
        functools.partial(_tri_kernel, ppad // PRIM_CHUNK),
        grid=grid,
        in_specs=[ray_spec, ray_spec, tri_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(o, d, tri)
    return a[0], row[0]


def pad_tris(va, vb, vc):
    """[P,3] corners -> [9, ppad] rows (ax ay az bx .. cz), zero padding
    (degenerate triangles never hit)."""
    p = va.shape[0]
    ppad = _round_up(p, PRIM_CHUNK)
    tri = jnp.zeros((9, ppad), jnp.float32)
    return (tri.at[0:3, :p].set(va.T).at[3:6, :p].set(vb.T)
            .at[6:9, :p].set(vc.T))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mesh_best(Oi, Di, va, vb, vc, interpret=False):
    """Winner (a, row) per ray over one instance's triangles.
    Oi, Di: [N,3] MESH-LOCAL rays (Di normalized); va/vb/vc: [P,3]."""
    n = Oi.shape[0]
    npad = _round_up(n, RAY_TILE)
    o = jnp.zeros((3, npad), jnp.float32).at[:, :n].set(Oi.T)
    d = jnp.ones((3, npad), jnp.float32).at[:, :n].set(Di.T)
    tri = pad_tris(va, vb, vc)
    a, row = mesh_best_rows(o, d, tri, interpret=interpret)
    return a[:n], row[:n]


def trace_mesh_instance_pallas(best: Hit, O, D, inv, mesh_transfo,
                               prim_index: int, va, vb, vc,
                               tri_offset: int, *, interpret=False) -> Hit:
    """Drop-in replacement for intersect.trace_mesh_instance."""
    Oi = O @ inv[:3, :3].T + inv[:3, 3]
    Di = normalize(D @ inv[:3, :3].T)
    a, row = _mesh_best(Oi, Di, va, vb, vc, interpret=interpret)
    ok = row >= 0
    plh = Oi + a[:, None] * Di
    pgh = plh @ mesh_transfo[:3, :3].T + mesh_transfo[:3, 3]
    dist = jnp.linalg.norm(O - pgh, axis=-1)
    cand = Hit(
        dist=jnp.where(ok, dist, FLT_MAX),
        pl=plh,
        pg=pgh,
        prim=jnp.where(ok, prim_index, -1).astype(jnp.int32),
        shape=jnp.where(ok, 0, -1).astype(jnp.int32),   # CODE_MESH
        dircode=jnp.zeros(a.shape, jnp.int32),
        tri=jnp.where(ok, tri_offset + row, -1).astype(jnp.int32),
    )
    return _better(best, cand)
