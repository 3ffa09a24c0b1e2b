"""Whole-path Pallas megakernel: the full bounce loop in VMEM.

The SoA integrator (models/montecarlo.py) already keeps trace fast via the
fused kernels, but between traces every bounce streams ~dozens of [N]
arrays through HBM (sampling, ONB, Schlick, the 4-case material logic,
masked RNG counters) — measured ~12 ms/bounce at 800x600 on one chip while
the trace itself costs 1.5 ms. This kernel fuses the ENTIRE pass:

    rgb = megakernel(d, uv)      # one pallas_call, one HBM round trip

Per (TILE_ROWS, 128)-ray block everything lives in vector registers /
VMEM: xxhash32 counters, hemisphere sampling, the per-bounce closest-hit
fold, normal reconstruction, the material cases, and the progressive-seed
schedule. HBM traffic collapses to rays-in (5 f32/ray) + rgb-out
(3 f32/ray).

Scene representation: one SMEM table [38, P] of per-prim scalars
(12 inverse-transform rows, 12 forward rows, shin/rough/emis, rgba, an
ok flag masking group-padding columns, and the prim's world AABB) with a
static (shape_code, start, count) descriptor per homogeneous group. The
closest-hit fold is scalar-over-prims x vector-over-rays (a lax.fori_loop
of ~120 VPU ops per prim, every op a full (R,128) vreg), and on scenes
with >= MEGA_CULL_MIN_PRIMS each prim is guarded by an AABB slab test
against the whole ray block (@pl.when skip) — per-PRIM frontier culling,
the finest-grained TPU answer to the reference's BVH stack walk
(intersect_bvh, raytracer_func.frag:734-769). Meshes and very large
scenes route to the chunked kernels in ops/pallas_trace.py instead (see
mega_eligible).

The fold carries the winner's ATTRIBUTES (normal, hit point, material,
color) instead of its index, so shading needs no gathers at all — the
TPU answer to the GLSL's global `closest_intersection` struct + texture
reads (shaders/raytracer_func.frag:257-271,171-233).

Semantics are tp/montecarlo.frag:100-188 exactly, with the identical
masked-counter draw schedule as models/montecarlo.py — see that module
and models/montecarlo_aos.py for quirk commentary. Parity is asserted in
tests/test_megakernel.py against the SoA integrator.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.intersect import (
    FLT_MAX, CODE_SPHERE, CODE_CUBE, CODE_CYLINDER, CODE_CONE,
    CODE_ORIENTED_QUAD,
)
from ..ops.pallas_trace import _SOA_FNS
from ..ops import rng as _rng

TILE_ROWS = 32             # rays per tile = TILE_ROWS * 128
LANES = 128
MEGA_MAX_PRIMS = 4096      # SMEM table cap: 38 * 4096 * 4B = 608 KB of
                           # the chip's 1 MB SMEM (an 8192 table fails
                           # to allocate — measured round 5)
MEGA_CULL_MIN_PRIMS = 64   # per-prim AABB culling pays for itself above this
MEGA_SUPER = 16            # prims per super-box (the outer culling level)

U32 = jnp.uint32
_ADV0 = np.uint32(_rng.ADVANCE[0])
_ADV1 = np.uint32(_rng.ADVANCE[1])
_ADV2 = np.uint32(_rng.ADVANCE[2])
_MANT = np.uint32(0x007FFFFF)
_ONEF = np.uint32(0x3F800000)

PI = np.float32(2.0 * np.arccos(0.0))
BIAS = np.float32(1e-2)            # raytracer_func.frag:14
SKY_LOW = (0.5, 0.5, 0.9)          # tp/montecarlo.frag:119
SKY_HIGH = (1.0, 1.0, 0.8)


# --------------------------------------------------------------------------
# block-SoA helpers (vec3 = tuple of (R,128) blocks)
# --------------------------------------------------------------------------

def _vwhere(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _vnorm(v, eps=0.0):
    n = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    if eps:
        n = jnp.maximum(n, np.float32(eps))
    return (v[0] / n, v[1] / n, v[2] / n)


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _reflect(i, n):
    d2 = 2.0 * _vdot(n, i)
    return (i[0] - d2 * n[0], i[1] - d2 * n[1], i[2] - d2 * n[2])


def _refract_glsl(i, n, eta):
    ndi = _vdot(n, i)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    c = eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0))
    out = (eta * i[0] - c * n[0], eta * i[1] - c * n[1],
           eta * i[2] - c * n[2])
    z = jnp.zeros_like(out[0])
    return _vwhere(k < 0.0, (z, z, z), out)


# --------------------------------------------------------------------------
# in-register xxhash32 RNG (bit-identical to ops/rng.py)
# --------------------------------------------------------------------------

def _hash_blocks(s0, s1, s2):
    P2, P3, P4, P5 = (np.uint32(2246822519), np.uint32(3266489917),
                      np.uint32(668265263), np.uint32(374761393))
    h = s2 + P5 + s0 * P3
    h = P4 * ((h << U32(17)) | (h >> U32(15)))
    h = h + s1 * P3
    h = P4 * ((h << U32(17)) | (h >> U32(15)))
    h = P2 * (h ^ (h >> U32(15)))
    h = P3 * (h ^ (h >> U32(13)))
    return h ^ (h >> U32(16))


def _draw(state, mask):
    """One masked draw: value for every lane, counter advance where mask."""
    s0, s1, s2 = state
    m = _hash_blocks(s0, s1, s2)
    m = (m & _MANT) | _ONEF
    f = pltpu.bitcast(m, jnp.float32) - np.float32(1.0)
    new = (s0 + _ADV0, s1 + _ADV1, s2 + _ADV2)
    state = tuple(jnp.where(mask, n, s) for n, s in zip(new, state))
    return f, state


def _random_ray(state, d, roughness, mask):
    """random_ray (tp/montecarlo.frag:49-89): ONB about d + Beckmann-ish
    hemisphere sample; exactly 2 masked draws."""
    w = _vnorm((d[0], d[1] + 5.0, d[2] + 3.0))
    u = _vnorm(_vcross(d, w))
    v = _vnorm(_vcross(d, u))
    alpha = roughness * roughness
    u1, state = _draw(state, mask)
    beta = 2.0 * PI * u1
    u2, state = _draw(state, mask)
    tan_theta2 = -(alpha * alpha) * jnp.log(1.0 - u2)
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta2)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    lx = jnp.cos(beta) * sin_theta
    ly = jnp.sin(beta) * sin_theta
    lz = cos_theta
    ln = jnp.sqrt(lx * lx + ly * ly + lz * lz)
    lx, ly, lz = lx / ln, ly / ln, lz / ln
    out = (u[0] * lx + v[0] * ly + d[0] * lz,
           u[1] * lx + v[1] * ly + d[1] * lz,
           u[2] * lx + v[2] * ly + d[2] * lz)
    return _vnorm(out), state


# --------------------------------------------------------------------------
# in-kernel closest-hit fold (scalar prims x vector rays)
# --------------------------------------------------------------------------

def _safe_rcp(x):
    """1/x with exact zeros clamped to a huge finite value (no inf*0=NaN
    in the AABB slab test; TIR refract rays carry exact-zero components)."""
    tiny = np.float32(1e-30)
    sgn = jnp.where(x < 0.0, np.float32(-1.0), np.float32(1.0))
    return sgn / jnp.maximum(jnp.abs(x), tiny)


def _trace_fold(groups, tab, sbb, ordr, o, d, n_prev, p_prev, scr, cull,
                ord_base=0):
    """Fold every analytic prim into per-ray winner ATTRIBUTES.

    groups: static ((shape_code, start, count), ...); tab: SMEM [38, P]
    (rows 0-11 inv affine, 12-23 trf affine, 24 shin, 25 rough, 26 emis,
    27-30 rgba, 31 ok flag — 0 marks group-padding columns, which must
    never hit — 32-37 world AABB min/max). Same winners as
    ops.trace._small_group_soa (strictly-closer) up to exact distance
    ties, where the nearest-first super order below may pick a
    different—equally closest—winner. Returns (is_hit, N, P, shin,
    rough, emis, col3, alpha); on miss N, P keep (n_prev, p_prev) — the
    GLSL stale-output semantics that the refraction inner re-trace
    relies on (tp/montecarlo.frag:150-152).

    scr: 14 VMEM scratch refs holding the running winner (shared by the
    outer and inner folds of a bounce; reset here). cull (static): skip a
    prim entirely when no ray in the block can beat its current best
    inside the prim's world AABB (tab rows 32-37) — the per-prim
    frontier cull, the megakernel's answer to the reference's BVH walk
    (intersect_bv, raytracer_func.frag:314-352). Conservative: identical
    winners, directions must be unit (slab t == world distance).

    ordr: SMEM (1, n_supers) per-TILE super visit order (group-relative
    indices within each group's slice) — supers sorted nearest-first by
    the tile's primary-ray bundle entry distance (host side,
    _mega_super_order). Visiting near supers first makes the running
    best tighten immediately, so the `tmin <= best` prune rejects the
    occluded far supers — the front-to-back effect of the reference's
    BVH walk without per-ray divergence. The order is a pure heuristic
    (stale for later bounces, where origins have moved): every super is
    still slab-tested per bounce, so winners don't depend on it.
    """
    (bd_s, nx_s, ny_s, nz_s, px_s, py_s, pz_s,
     sh_s, ro_s, em_s, cr_s, cg_s, cb_s, ca_s) = scr
    z = jnp.zeros_like(o[0])
    bd_s[...] = z + FLT_MAX
    nx_s[...] = n_prev[0]
    ny_s[...] = n_prev[1]
    nz_s[...] = n_prev[2]
    px_s[...] = p_prev[0]
    py_s[...] = p_prev[1]
    pz_s[...] = p_prev[2]
    sh_s[...] = z
    ro_s[...] = z
    em_s[...] = z
    cr_s[...] = z
    cg_s[...] = z
    cb_s[...] = z
    ca_s[...] = z + 1.0
    if cull:
        rdx, rdy, rdz = _safe_rcp(d[0]), _safe_rcp(d[1]), _safe_rcp(d[2])

    def make_body(code, start, fn):
        is_sphere = code == CODE_SPHERE
        is_cube = code == CODE_CUBE
        is_cyl = code == CODE_CYLINDER
        is_cone = code == CODE_CONE

        def prim_work(c):
            bd = bd_s[...]
            nx, ny, nz = nx_s[...], ny_s[...], nz_s[...]
            px, py, pz = px_s[...], py_s[...], pz_s[...]
            shin, rough, emis = sh_s[...], ro_s[...], em_s[...]
            cr, cg, cb, ca = cr_s[...], cg_s[...], cb_s[...], ca_s[...]
            iv = [tab[r, c] for r in range(12)]
            tf = [tab[r + 12, c] for r in range(12)]
            # local-frame ray (scalar affine coefficients, full-lane blocks)
            oi = (iv[0] * o[0] + iv[1] * o[1] + iv[2] * o[2] + iv[3],
                  iv[4] * o[0] + iv[5] * o[1] + iv[6] * o[2] + iv[7],
                  iv[8] * o[0] + iv[9] * o[1] + iv[10] * o[2] + iv[11])
            di = _vnorm((iv[0] * d[0] + iv[1] * d[1] + iv[2] * d[2],
                         iv[4] * d[0] + iv[5] * d[1] + iv[6] * d[2],
                         iv[8] * d[0] + iv[9] * d[1] + iv[10] * d[2]),
                        eps=1e-30)
            a, valid, dircode = fn(oi[0], oi[1], oi[2], di[0], di[1], di[2])
            plv = (oi[0] + a * di[0], oi[1] + a * di[1], oi[2] + a * di[2])
            pg = (tf[0] * plv[0] + tf[1] * plv[1] + tf[2] * plv[2] + tf[3],
                  tf[4] * plv[0] + tf[5] * plv[1] + tf[6] * plv[2] + tf[7],
                  tf[8] * plv[0] + tf[9] * plv[1] + tf[10] * plv[2] + tf[11])
            ex, ey, ez = o[0] - pg[0], o[1] - pg[1], o[2] - pg[2]
            dist = jnp.where(valid,
                             jnp.sqrt(ex * ex + ey * ey + ez * ez), FLT_MAX)

            # shading normal (intersection_info, raytracer_func.frag:783-897)
            if is_sphere:
                point = (2.0 * plv[0], 2.0 * plv[1], 2.0 * plv[2])
            elif is_cube:
                ax = dircode // 2
                sg = jnp.where(dircode % 2 != 0, 1.0, -1.0)
                point = (plv[0] + jnp.where(ax == 0, sg, 0.0),
                         plv[1] + jnp.where(ax == 1, sg, 0.0),
                         plv[2] + jnp.where(ax == 2, sg, 0.0))
            elif is_cyl:
                cap = dircode < 2
                zsg = jnp.where(dircode % 2 != 0, 1.0, -1.0)
                point = (plv[0] + jnp.where(cap, 0.0, plv[0]),
                         plv[1] + jnp.where(cap, 0.0, plv[1]),
                         plv[2] + jnp.where(cap, zsg, 0.0))
            elif is_cone:
                rxy = jnp.sqrt(plv[0] * plv[0] + plv[1] * plv[1])
                bot = dircode == 0
                point = (plv[0] + jnp.where(bot, 0.0, plv[0]),
                         plv[1] + jnp.where(bot, 0.0, plv[1]),
                         plv[2] + jnp.where(bot, -1.0, rxy / 2.0))
            else:  # oriented quad
                point = (plv[0], plv[1], plv[2] + 1.0)
            tp = (tf[0] * point[0] + tf[1] * point[1] + tf[2] * point[2]
                  + tf[3] - pg[0],
                  tf[4] * point[0] + tf[5] * point[1] + tf[6] * point[2]
                  + tf[7] - pg[1],
                  tf[8] * point[0] + tf[9] * point[1] + tf[10] * point[2]
                  + tf[11] - pg[2])
            nv = _vnorm(tp, eps=1e-30)
            if is_cone:
                # cone top-"cap" quirk: N = 0 (raytracer_func.frag:850-853)
                topc = dircode == 1
                nv = _vwhere(topc, (jnp.zeros_like(nv[0]),) * 3, nv)

            # pad-column flag folded into the winner update as
            # defense-in-depth: the @pl.when predicate also carries it,
            # but Mosaic has executed mispredicated pl.when bodies
            # before (round-2 lesson) — a pad column must never win
            # even then (mirrors the mesh kernel, where pads are
            # harmless degenerate triangles)
            take = (tab[31, c] > 0.0) & (dist < bd)
            bd_s[...] = jnp.where(take, dist, bd)
            nx_s[...] = jnp.where(take, nv[0], nx)
            ny_s[...] = jnp.where(take, nv[1], ny)
            nz_s[...] = jnp.where(take, nv[2], nz)
            px_s[...] = jnp.where(take, pg[0], px)
            py_s[...] = jnp.where(take, pg[1], py)
            pz_s[...] = jnp.where(take, pg[2], pz)
            sh_s[...] = jnp.where(take, tab[24, c], shin)
            ro_s[...] = jnp.where(take, tab[25, c], rough)
            em_s[...] = jnp.where(take, tab[26, c], emis)
            cr_s[...] = jnp.where(take, tab[27, c], cr)
            cg_s[...] = jnp.where(take, tab[28, c], cg)
            cb_s[...] = jnp.where(take, tab[29, c], cb)
            ca_s[...] = jnp.where(take, tab[30, c], ca)

        def body(p, _):
            # p may be a clamped re-test of the group's last real prim
            # (super-loop edge); equal candidates never replace the
            # strictly-closer winner, so that is harmless by design
            c = start + p
            ok = tab[31, c] > 0.0          # group-padding columns never hit
            if cull:
                t0x = (tab[32, c] - o[0]) * rdx
                t1x = (tab[35, c] - o[0]) * rdx
                t0y = (tab[33, c] - o[1]) * rdy
                t1y = (tab[36, c] - o[1]) * rdy
                t0z = (tab[34, c] - o[2]) * rdz
                t1z = (tab[37, c] - o[2]) * rdz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                boxhit = (tmax >= tmin) & (tmin <= bd_s[...])
                pred = ok & jnp.any(boxhit)
            else:
                pred = ok

            @pl.when(pred)
            def _():
                prim_work(c)

            return 0

        return body

    for code, start, count, sstart in groups:
        body = make_body(code, start, _SOA_FNS[code])
        if not cull:
            jax.lax.fori_loop(0, count, body, 0)
            continue

        # two-level frontier: a MEGA_SUPER-prim super-box (sbb SMEM,
        # _mega_super_boxes) gates its prims' box tests and bodies —
        # rays that miss a whole Morton region pay ONE slab test for 16
        # prims (intersect_bvh's internal-node skip, the TPU way)
        nsup = -(-count // MEGA_SUPER)

        def super_body(spi, _, start=start, count=count, sstart=sstart,
                      body=body):
            # nearest-first visit order; ord_base offsets into a shared
            # schedule row when the fold is embedded in the fused kernel
            # (models/bounce_kernel.py), whose rows also carry mesh/ana
            # segments before the SMEM-table segments
            sp = ordr[0, 0, ord_base + sstart + spi]
            sc = sstart + sp
            t0x = (sbb[0, sc] - o[0]) * rdx
            t1x = (sbb[3, sc] - o[0]) * rdx
            t0y = (sbb[1, sc] - o[1]) * rdy
            t1y = (sbb[4, sc] - o[1]) * rdy
            t0z = (sbb[2, sc] - o[2]) * rdz
            t1z = (sbb[5, sc] - o[2]) * rdz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x),
                            jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x),
                            jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            shit = (tmax >= tmin) & (tmin <= bd_s[...])

            @pl.when(jnp.any(shit))
            def _():
                jax.lax.fori_loop(
                    0, MEGA_SUPER,
                    lambda j, __: body(
                        jnp.minimum(sp * MEGA_SUPER + j, count - 1), __),
                    0)

            return 0

        jax.lax.fori_loop(0, nsup, super_body, 0)
    bd = bd_s[...]
    is_hit = bd < FLT_MAX
    return (is_hit, (nx_s[...], ny_s[...], nz_s[...]),
            (px_s[...], py_s[...], pz_s[...]),
            sh_s[...], ro_s[...], em_s[...],
            (cr_s[...], cg_s[...], cb_s[...]), ca_s[...])


# --------------------------------------------------------------------------
# the shared per-bounce shading/material/RNG step
# --------------------------------------------------------------------------

def _bounce_step(trace_fn, has_transparent, ior,
                 o, d, attenu, total, result, done_i, state):
    """One bounce of tp/montecarlo.frag:109-176 on block-SoA state,
    shared by the whole-path megakernel and the fused per-bounce kernel
    (models/bounce_kernel.py). trace_fn(o, d, n_prev, p_prev) returns
    (is_hit, N, P, shin, rough, emis, col3, alpha) with GLSL
    stale-(N, P)-on-miss semantics; it is called a second time for the
    refraction march-through on transparent scenes. RNG draw schedule
    (2 + 1 + 2 masked draws) is bit-identical to models/montecarlo.py."""
    z = jnp.zeros_like(d[0])
    one = jnp.ones_like(d[0])
    unit_z = (z, z, one)
    done = done_i != 0
    is_hit, N, P, shin, rough, emis, col3, alpha = trace_fn(
        o, d, unit_z, (o[0] + d[0], o[1] + d[1], o[2] + d[2]))

    active = ~done
    miss_now = active & ~is_hit
    live = active & is_hit

    # sky fallback (:117-119)
    k = jnp.maximum(0.0, d[2])
    sky = tuple((1.0 - k) * lo + k * hi
                for lo, hi in zip(SKY_LOW, SKY_HIGH))
    result = _vwhere(
        miss_now,
        (total[0] + attenu[0] * sky[0], total[1] + attenu[1] * sky[1],
         total[2] + attenu[2] * sky[2]),
        result)
    done = done | miss_now

    # draws 1-2: the diffuse sample, every hit lane (:127)
    ray, state = _random_ray(state, N, 1.0 - rough, live)

    # Schlick from the IOR slider (:129)
    r0 = (ior - 1.0) / (ior + 1.0)
    r0 = r0 * r0
    xs = 1.0 - _vdot(N, d)
    x5 = xs * xs * xs * xs * xs
    rs = jnp.clip(r0 + (1.0 - r0) * x5, 0.0, 1.0)

    R = _reflect((-ray[0], -ray[1], -ray[2]), N)        # (:131)
    E = _vnorm((o[0] - P[0], o[1] - P[1], o[2] - P[2]), eps=1e-30)
    se = (1.0 - rough) * 100.0 + rough * 2.0            # (:133)
    spec = jnp.power(jnp.maximum(0.0, _vdot(E, R)), se)

    # ambient leak + emissive gather (:136)
    emit = emis * (1.0 - shin) * alpha
    total = _vwhere(
        live,
        (total[0] + col3[0] * 0.1 + attenu[0] * emit,
         total[1] + col3[1] * 0.1 + attenu[1] * emit,
         total[2] + col3[2] * 0.1 + attenu[2] * emit),
        total)

    # emissive termination (:139,174-175)
    emissive = emis > 0.5
    result = _vwhere(live & emissive, total, result)
    done = done | (live & emissive)
    cont = live & ~emissive

    refl_case = (shin > 0.0) & (alpha == 1.0)
    refr_case = (alpha < 1.0) & (shin == 0.0)
    mixed_case = (alpha < 1.0) & (shin > 0.0)

    # draw 3: the mixed-case coin (:155)
    coin, state = _draw(state, cont & mixed_case)
    choose_refl = refl_case | (mixed_case & (coin > 0.5))
    refr_lane = cont & (refr_case | (mixed_case & ~(coin > 0.5)))

    # draws 4-5: the reflect-branch sample (:143,158)
    rray, state = _random_ray(state, _reflect(d, N),
                              1.0 - shin * rough, cont & choose_refl)

    if has_transparent:
        # refraction march-through (:146-153); mixed keeps un-refracted D
        d_in = _vwhere(cont & refr_case, _refract_glsl(d, N, ior), d)
        d_in = _vwhere(refr_lane, d_in, unit_z)
        # park non-refracting lanes far above every prim AABB: their
        # inner-fold results are discarded below, and with culling on
        # a tile whose lanes all parked fails every super/prim box
        # test — the second fold costs ~nothing unless rays actually
        # refract (mirrors ops/sort_rays.PARK_Z in the wavefront)
        o_in = _vwhere(refr_lane,
                       (P[0] - BIAS * N[0], P[1] - BIAS * N[1],
                        P[2] - BIAS * N[2]),
                       (o[0], o[1], z + np.float32(2.0e8)))
        _, N2r, P2r, *_unused = trace_fn(o_in, d_in, N, P)
        N2 = _vwhere(refr_lane, N2r, unit_z)
        P2 = _vwhere(refr_lane, P2r, P)
        d_exit = _refract_glsl(d_in, (-N2[0], -N2[1], -N2[2]), 1.0 / ior)
    else:
        N2, P2 = N, P
        d_exit = unit_z

    # attenuation updates (:142,147,161,170)
    base = (col3[0] * attenu[0], col3[1] * attenu[1],
            col3[2] * attenu[2])
    sm = tuple((1.0 - shin) * a_ + shin * c_
               for a_, c_ in zip(attenu, col3))
    arefl = tuple(b_ + (a_ * (alpha * rs * spec)) * m_
                  for b_, a_, m_ in zip(base, attenu, sm))
    arefr = tuple(b_ + (a_ * ((1.0 - alpha) * (1.0 - rs) * spec)) * m_
                  for b_, a_, m_ in zip(base, attenu, sm))
    adiff = tuple(b_ + (a_ * spec) * m_
                  for b_, a_, m_ in zip(base, attenu, sm))

    new_attenu = _vwhere(refr_lane, arefr,
                         _vwhere(choose_refl, arefl, adiff))
    new_o = _vwhere(
        refr_lane,
        (P2[0] + BIAS * N2[0], P2[1] + BIAS * N2[1],
         P2[2] + BIAS * N2[2]),
        (P[0] + BIAS * N[0], P[1] + BIAS * N[1], P[2] + BIAS * N[2]))
    new_d = _vwhere(refr_lane, d_exit, _vwhere(choose_refl, rray, ray))

    o = _vwhere(cont, new_o, o)
    d = _vwhere(cont, new_d, d)
    attenu = _vwhere(cont, new_attenu, attenu)
    return o, d, attenu, total, result, done.astype(jnp.int32), state


# --------------------------------------------------------------------------
# the megakernel
# --------------------------------------------------------------------------

def _mega_kernel(groups, nb_bounces, has_transparent, cull,
                 dx_ref, dy_ref, dz_ref, u_ref, v_ref,
                 fpar_ref, upar_ref, tab_ref, sbb_ref, ord_ref,
                 r_ref, g_ref, b_ref, *scr):
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    z = jnp.zeros_like(d[0])
    o = (z + fpar_ref[0, 0], z + fpar_ref[0, 1], z + fpar_ref[0, 2])
    ior = fpar_ref[0, 3]

    # srand (integer-exact seed; ops/rng.srand_soa)
    state = (pltpu.bitcast(u_ref[...], U32),
             jnp.zeros_like(d[0], U32) + upar_ref[0, 0],
             pltpu.bitcast(v_ref[...], U32))

    attenu = (z + 0.8, z + 0.8, z + 0.8)   # vec3(0.8) (:106-107)
    total = (z, z, z)
    result = (z, z, z)
    # Mosaic cannot legalize i1 vector loop carries through scf.for
    # (round-1 bench failure: "failed to legalize operation 'scf.for'"),
    # so `done` rides the carry as int32 and is compared at use sites.
    done_i = jnp.zeros_like(d[0], jnp.int32)

    def trace_fn(o, d, n_prev, p_prev):
        return _trace_fold(groups, tab_ref, sbb_ref, ord_ref, o, d,
                           n_prev, p_prev, scr, cull)

    def bounce(o, d, attenu, total, result, done_i, state):
        return _bounce_step(trace_fn, has_transparent, ior,
                            o, d, attenu, total, result, done_i, state)

    # lax.fori_loop (not a static unroll): the body is bounce-invariant,
    # and program size drives the Mosaic compile time of this kernel
    carry = (o, d, attenu, total, result, done_i, state)
    carry = jax.lax.fori_loop(0, nb_bounces,
                              lambda _, c: bounce(*c), carry)
    o, d, attenu, total, result, done_i, state = carry

    # bounce-cap exhaustion returns black (:178)
    done = done_i != 0
    r_ref[...] = jnp.where(done, result[0], 0.0)
    g_ref[...] = jnp.where(done, result[1], 0.0)
    b_ref[...] = jnp.where(done, result[2], 0.0)


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------

def mega_eligible(scene) -> bool:
    """Static routing predicate: analytic-only scenes small enough for the
    SMEM prim table. Mesh scenes and very large scenes use the chunked
    kernels (ops/pallas_trace.py) via the SoA integrator instead."""
    if scene.mesh_prim_index:
        return False
    total = sum(int(g.shape[0]) for g in scene.group_prim)
    return 0 < total <= MEGA_MAX_PRIMS


def _mega_meta(scene):
    """Static ((code, start, count, super_start), ...) over the scene's
    typed groups; super_start indexes the per-group 16-prim super-box
    table (built by _mega_super_boxes, aligned with this layout)."""
    groups = []
    start = 0
    sstart = 0
    for gi, code in enumerate(scene.group_codes):
        count = int(scene.group_prim[gi].shape[0])
        groups.append((int(code), start, count, sstart))
        start += count
        sstart += -(-count // MEGA_SUPER)
    return tuple(groups), start


def _mega_super_boxes(scene):
    """[6, n_supers] world AABBs over MEGA_SUPER-prim windows of each
    (Morton-ordered) group — the outer level of the megakernel's
    frontier culling. Padding prims contribute empty boxes."""
    cols = []
    for gi in range(len(scene.group_codes)):
        pid = scene.group_prim[gi]
        ok = (pid >= 0)[:, None]
        bmn = jnp.where(ok, jnp.take(scene.prim_bb_min, pid, axis=0),
                        np.float32(3e38))
        bmx = jnp.where(ok, jnp.take(scene.prim_bb_max, pid, axis=0),
                        np.float32(-3e38))
        n = bmn.shape[0]
        pad = -(-n // MEGA_SUPER) * MEGA_SUPER
        bmn = jnp.concatenate(
            [bmn, jnp.full((pad - n, 3), 3e38, jnp.float32)])
        bmx = jnp.concatenate(
            [bmx, jnp.full((pad - n, 3), -3e38, jnp.float32)])
        smn = bmn.reshape(-1, MEGA_SUPER, 3).min(axis=1)   # [S,3]
        smx = bmx.reshape(-1, MEGA_SUPER, 3).max(axis=1)
        cols.append(jnp.concatenate([smn, smx], axis=1))   # [S,6]
    return jnp.concatenate(cols, axis=0).T                 # [6, S_total]


def _mega_super_order(d_rows, o3, sbb, groups):
    """[ntiles, n_supers] i32: per ray-tile visit order of each group's
    supers, nearest-first by the tile's conservative bundle entry
    distance into the super box (ops/worklist.bundle_box_entry with a
    degenerate origin interval — primary rays share the pinhole origin).
    Order is group-relative within each group's slice of the table so
    the kernel's per-group fori_loop stays statically bound to its
    shape code. Unreachable supers sort last (their in-kernel slab
    tests fail anyway). Heuristic only — see _trace_fold."""
    from ..ops.worklist import bundle_box_entry

    m = d_rows.shape[1] * d_rows.shape[2]
    nt = m // (TILE_ROWS * LANES)
    dt = d_rows.reshape(3, nt, TILE_ROWS * LANES)
    olo = jnp.broadcast_to(o3[:, None], (3, nt))
    bundles = (olo, olo, dt.min(axis=2), dt.max(axis=2))
    entry = bundle_box_entry(bundles, sbb)          # [nt, n_supers]
    cols = []
    for _, _, count, sstart in groups:
        nsup = -(-count // MEGA_SUPER)
        cols.append(jnp.argsort(entry[:, sstart:sstart + nsup], axis=1))
    return jnp.concatenate(cols, axis=1).astype(jnp.int32)[:, None, :]


def _mega_table(scene):
    """[38, P] f32 prim-scalar table (device-side; cheap, built under jit).
    Rows 0-11 inverse affine, 12-23 forward affine, 24 shin, 25 rough,
    26 emis, 27-30 rgba, 31 ok (0 = group-padding column, never hit),
    32-34 world AABB min, 35-37 max (empty box for padding) — materials
    resolved per GLOBAL prim id."""
    cols = []
    for gi in range(len(scene.group_codes)):
        pid = scene.group_prim[gi]
        inv = scene.group_inv[gi][:, :3, :4].reshape(-1, 12)
        trf = scene.group_transfo[gi][:, :3, :4].reshape(-1, 12)
        m = jnp.take(scene.mat, pid, axis=0)       # [P,4]
        c = jnp.take(scene.color, pid, axis=0)     # [P,4]
        okr = (pid >= 0).astype(jnp.float32)[:, None]
        bmn = jnp.take(scene.prim_bb_min, pid, axis=0)
        bmx = jnp.take(scene.prim_bb_max, pid, axis=0)
        bmn = jnp.where(okr > 0, bmn, np.float32(1.0))
        bmx = jnp.where(okr > 0, bmx, np.float32(-1.0))
        cols.append(jnp.concatenate(
            [inv, trf, m[:, 0:1], m[:, 1:2], m[:, 2:3], c, okr, bmn, bmx],
            axis=1))
    return jnp.concatenate(cols, axis=0).T         # [38, P]


@functools.partial(
    jax.jit, static_argnames=("groups", "nb_bounces", "has_transparent",
                              "cull", "interpret"))
def _mega_call(d_rows, u, v, fpar, upar, tab, sbb, ordr, groups,
               nb_bounces, has_transparent, cull=False, interpret=False):
    m = d_rows.shape[1]
    grid = (m // TILE_ROWS,)
    blk = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    # per-TILE super visit order: one (1, 1, n_supers) SMEM row per grid
    # step (the leading tile axis is the blocked one; the trailing two
    # match the array dims, which the Mosaic block-shape rule requires)
    ord_spec = pl.BlockSpec((1, 1, ordr.shape[2]), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    kernel = functools.partial(_mega_kernel, groups, nb_bounces,
                               has_transparent, cull)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk, blk, blk, blk,
                  smem((1, 4)), smem((1, 1)), smem(tab.shape),
                  smem(sbb.shape), ord_spec],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
        # 14 winner-attribute scratch buffers shared by the per-bounce
        # closest-hit folds (bd, N, P, shin/rough/emis, rgba)
        scratch_shapes=[pltpu.VMEM((TILE_ROWS, LANES), jnp.float32)] * 14,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(d_rows[0], d_rows[1], d_rows[2], u, v, fpar, upar, tab, sbb, ordr)
    return r, g, b


def raytrace_mega(scene, O, D, screen_tc, pass_index, *, nb_bounces: int,
                  refract_ind, date=0.0, interpret: bool = False):
    """Whole-pass megakernel twin of models.montecarlo.raytrace.

    O: [3] camera origin (the reference's pinhole model), D: [N,3] ray
    dirs (normalized inside), screen_tc: [N,2]. Returns rgb [N,3].
    Bit-identical RNG schedule to the SoA integrator; float results match
    to a few ulp (Mosaic fuses multiply-adds differently from XLA).
    """
    n = D.shape[0]
    tile = TILE_ROWS * LANES
    rows = ((n + tile - 1) // tile) * tile // LANES

    d = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    dx = jnp.zeros((rows * LANES,), jnp.float32).at[:n].set(d[:, 0])
    dy = jnp.zeros((rows * LANES,), jnp.float32).at[:n].set(d[:, 1])
    dz = jnp.ones((rows * LANES,), jnp.float32).at[:n].set(d[:, 2])
    u = jnp.zeros((rows * LANES,), jnp.float32).at[:n].set(screen_tc[:, 0])
    v = jnp.zeros((rows * LANES,), jnp.float32).at[:n].set(screen_tc[:, 1])
    d_rows = jnp.stack([dx, dy, dz]).reshape(3, rows, LANES)
    u = u.reshape(rows, LANES)
    v = v.reshape(rows, LANES)

    o3 = jnp.broadcast_to(jnp.asarray(O, jnp.float32), (3,))
    fpar = jnp.concatenate(
        [o3, jnp.asarray(refract_ind, jnp.float32)[None]]).reshape(1, 4)
    # seed y = pass * GOLDEN + bits(date)  (ops/rng.srand_soa)
    y = (jnp.asarray(pass_index).astype(U32) * U32(_rng.GOLDEN)
         + jax.lax.bitcast_convert_type(jnp.float32(date), U32))
    upar = y.reshape(1, 1)

    groups, total = _mega_meta(scene)
    tab = _mega_table(scene)
    sbb = _mega_super_boxes(scene)
    ordr = _mega_super_order(d_rows, o3, sbb, groups)
    r, g, b = _mega_call(d_rows, u, v, fpar, upar, tab, sbb, ordr, groups,
                         int(nb_bounces), scene.has_transparent,
                         cull=total >= MEGA_CULL_MIN_PRIMS,
                         interpret=interpret)
    rgb = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return rgb[:n]
