"""Fused per-bounce wavefront kernel: trace + shade + sample in ONE
Pallas call per bounce — the mesh-scene production engine.

The round-4 profile (benchmarks/PROFILING.md) showed mesh scenes losing
~25% of a pass to XLA glue between the trace kernels and the shading
math (sort gathers, bundle stacks, material gathers) and ~75% to [T, C]
Moller-Trumbore folds charged at tile granularity (~1800 ray-triangle
tests per ray-bounce where the reference's per-ray BVH walk does ~30-60,
shaders/raytracer_func.frag:734-769). This module is the structural fix
designed there: one pallas_call per bounce whose grid is 128-ray tiles,
with EVERYTHING in-kernel —

  - the analytic closest-hit fold (megakernel._trace_fold, SMEM prim
    table, winner attributes carried in VMEM scratch),
  - a per-tile front-to-back walk of each mesh instance's chunk-level
    acceleration structure: an XLA-precomputed nearest-first super-chunk
    schedule (2048 Morton-adjacent triangles per super) consumed by an
    in-kernel while_loop that EARLY-EXITS as soon as the next super's
    conservative entry bound cannot beat any ray's running best — the
    TPU equivalent of the reference's current-closest BVH prune
    (intersect_bv, raytracer_func.frag:344-350),
  - per 128-triangle chunk: an AABB gate against the live per-ray bests,
    an async DMA of the chunk's [18, 128] corner/normal block from HBM
    (all passing chunks of a super DMA'd eagerly so latency overlaps the
    folds), the [128-ray, 128-tri] Moller-Trumbore fold, and a one-hot
    winner-attribute gather on the MXU (dot_general at HIGHEST precision
    — exact to ~1 ulp because one operand is 0/1),
  - the full shading / material / RNG / sampling step shared with the
    whole-path megakernel (megakernel._bounce_step — bit-identical draw
    schedule to models/montecarlo.py),

so the only HBM traffic per bounce is the ~19-row wavefront state plus
the visited chunks. From bounce 1 on, the host re-sorts the wavefront
by (direction octant, origin Morton) — ops/sort_rays — so each tile
stays a tight spatial bundle (primaries arrive tile-coherent from the
renderer's 32x32 pixel blocks; the 480K-ray argsort costs ~15 ms, so
bounce 0 skips it); terminated lanes are parked outside every box.

Beyond meshes, the same machinery serves LARGE ANALYTIC scenes: groups
past the megakernel's 4096-prim SMEM cap become 128-prim Morton chunks
([32, 128] blocks: affine rows + material + ok flag) walked with the
identical schedule/DMA/subrow-fold/extraction pipeline in WORLD
distance (_ana_group), which is what removed the round-4 SMEM-cap
handoff cliff (benchmarks/stress_curve.json: monotone 256 -> 102,400
prims). Opaque analytic scenes take the whole-path mode — the full
bounce loop inside the kernel, megakernel-style, no sorts or
inter-bounce state traffic. Mid-size SMEM tables additionally reuse
the megakernel's two-level per-prim culled fold, fed nearest-first by
this bounce's schedule segment instead of the megakernel's
primary-ray-stale order.

Because the chunk pools stay in HBM and are DMA'd on demand, scene
scale is bounded by HBM, not VMEM or SMEM: the same kernel serves the
5k-tri mesh_demo, 122k-tri mesh_hires and 102k-prim stress pools
(reference bound ~2^27 prims via 29-deep stacks,
raytracer_func.frag:644,736).

Semantics are tp/montecarlo.frag:100-188 exactly (see megakernel.py /
models/montecarlo.py for the quirk commentary). Winner parity matches
the SoA route up to (a) the documented nearest-first tie-order caveat
on exact distance ties (ops/sparse_trace.py) and (b) ~1-ulp attribute
extraction noise from the MXU one-hot gather.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.intersect import EPSILON, FLT_MAX
from ..ops import rng as _rng
from ..ops.worklist import tile_bundles, bundle_box_entry, INF
from .megakernel import (
    _trace_fold, _bounce_step, _mega_table, _mega_meta, _safe_rcp,
    MEGA_MAX_PRIMS, U32,
)

LANES = 128
SUB = 8                 # sublane rows per ray tile: tile = SUB*128 rays.
                        # (SUB, 128) blocks fill the 8x128 VPU; the
                        # per-tile walk/DMA scalar overhead amortizes
                        # over 8x more rays than single-row tiles
                        # (measured 128-ray tiles scalar-bound, round 5)
TILE = SUB * LANES
TRI_SUPER = 16          # chunks per super (scene/device.TRI_SUPER)
NSLOT = TRI_SUPER       # DMA slots: a whole super's chunks in flight
_ABLATE = set()         # debug: {'fold','extract','mesh','analytic','shade'}
SF = 15                 # f32 state rows: o3 d3 attenu3 total3 result3
SU = 4                  # u32 state rows: done, rng s0 s1 s2


def _small_group_ids(scene):
    """Indices of the analytic groups that stay in the SMEM prim table
    (everything compile_scene did NOT move into the chunked HBM pool)."""
    large = {g[0] for g in scene.ana_groups}
    return [gi for gi, c in enumerate(scene.group_codes) if c not in large]


def fused_eligible(scene) -> bool:
    """Static routing predicate: scenes with MESHES and/or LARGE
    analytic groups (compile_scene's chunked HBM pools), whose small
    analytic remainder fits the SMEM prim table. Small analytic-only
    scenes use the whole-path megakernel instead."""
    if not scene.mesh_prim_index and not scene.ana_groups:
        return False
    small = sum(int(scene.group_prim[gi].shape[0])
                for gi in _small_group_ids(scene))
    return small <= MEGA_MAX_PRIMS


def _small_meta(scene):
    """((code, start, count, super_start), ...) over the SMEM-table
    groups — the megakernel _mega_meta layout restricted to the small
    groups (start indexes columns of _small_table's output; super_start
    indexes _small_super_boxes, in MEGA_SUPER-prim windows)."""
    from .megakernel import MEGA_SUPER

    groups = []
    start = 0
    sstart = 0
    for gi in _small_group_ids(scene):
        count = int(scene.group_prim[gi].shape[0])
        groups.append((int(scene.group_codes[gi]), start, count, sstart))
        start += count
        sstart += -(-count // MEGA_SUPER)
    return tuple(groups), start


def cull_small(scene) -> bool:
    """Static: the SMEM-table fold uses the megakernel's two-level
    per-prim culling (supers + per-prim boxes) when the table is big
    enough to pay for it (MEGA_CULL_MIN_PRIMS)."""
    from .megakernel import MEGA_CULL_MIN_PRIMS

    small = sum(int(scene.group_prim[gi].shape[0])
                for gi in _small_group_ids(scene))
    return small >= MEGA_CULL_MIN_PRIMS


def _small_super_boxes(scene):
    """[6, S_small] world AABBs over MEGA_SUPER-prim windows of the
    SMEM-table groups (megakernel._mega_super_boxes restricted to the
    small groups) — the outer level of the culled SMEM fold."""
    from .megakernel import MEGA_SUPER

    cols = []
    for gi in _small_group_ids(scene):
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
        smn = bmn.reshape(-1, MEGA_SUPER, 3).min(axis=1)
        smx = bmx.reshape(-1, MEGA_SUPER, 3).max(axis=1)
        cols.append(jnp.concatenate([smn, smx], axis=1))
    if not cols:
        return jnp.zeros((6, 1), jnp.float32)
    return jnp.concatenate(cols, axis=0).T


def _small_table(scene):
    """[38, P_small] SMEM prim table over the small groups only
    (megakernel._mega_table row layout)."""
    cols = []
    for gi in _small_group_ids(scene):
        pid = scene.group_prim[gi]
        inv = scene.group_inv[gi][:, :3, :4].reshape(-1, 12)
        trf = scene.group_transfo[gi][:, :3, :4].reshape(-1, 12)
        m = jnp.take(scene.mat, pid, axis=0)
        c = jnp.take(scene.color, pid, axis=0)
        okr = (pid >= 0).astype(jnp.float32)[:, None]
        bmn = jnp.take(scene.prim_bb_min, pid, axis=0)
        bmx = jnp.take(scene.prim_bb_max, pid, axis=0)
        bmn = jnp.where(okr > 0, bmn, np.float32(1.0))
        bmx = jnp.where(okr > 0, bmx, np.float32(-1.0))
        cols.append(jnp.concatenate(
            [inv, trf, m[:, 0:1], m[:, 1:2], m[:, 2:3], c, okr, bmn, bmx],
            axis=1))
    if not cols:
        return jnp.zeros((38, 1), jnp.float32)
    return jnp.concatenate(cols, axis=0).T


# --------------------------------------------------------------------------
# in-kernel mesh instance walk
# --------------------------------------------------------------------------

def _slab_rows(lo, hi, o, rd, cap):
    """Per-ray slab test of one box (6 scalars) against (1,128) rays.
    Returns (hit mask, tmin) with the front-to-back cap applied."""
    t0x = (lo[0] - o[0]) * rd[0]
    t1x = (hi[0] - o[0]) * rd[0]
    t0y = (lo[1] - o[1]) * rd[1]
    t1y = (hi[1] - o[1]) * rd[1]
    t0z = (lo[2] - o[2]) * rd[2]
    t1z = (hi[2] - o[2]) * rd[2]
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z))
    return (tmax >= tmin) & (tmin <= cap), tmin


def _mt_rows(A, B, C, o, d):
    """Moller-Trumbore of ONE triangle per lane against the lane's ray —
    all operands (1,128). Used to re-derive the extracted winner's local
    parameter in the lanes orientation (exact same formula as the [R, C]
    fold; any difference is fused-multiply ulps)."""
    e1 = (B[0] - A[0], B[1] - A[1], B[2] - A[2])
    e2 = (C[0] - A[0], C[1] - A[1], C[2] - A[2])
    hx = d[1] * e2[2] - d[2] * e2[1]
    hy = d[2] * e2[0] - d[0] * e2[2]
    hz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * hx + e1[1] * hy + e1[2] * hz
    invd = 1.0 / det
    sx, sy, sz = o[0] - A[0], o[1] - A[1], o[2] - A[2]
    u = (sx * hx + sy * hy + sz * hz) * invd
    qx = sy * e1[2] - sz * e1[1]
    qy = sz * e1[0] - sx * e1[2]
    qz = sx * e1[1] - sy * e1[0]
    vv = (d[0] * qx + d[1] * qy + d[2] * qz) * invd
    a = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * invd
    valid = ((jnp.abs(det) >= EPSILON)
             & (u >= 0.0) & (u <= 1.0)
             & (vv >= 0.0) & (u + vv <= 1.0)
             & (a > EPSILON))
    return a, valid


def _mesh_instance(flat_face, mi, o, d, refs):
    """Walk ONE mesh instance for the current tile and merge its winner
    into the analytic winner scratch (megakernel attribute layout).

    mi: dynamic instance index. refs: dict of kernel refs + the static
    `scheduled` flag (outer trace uses the XLA nearest-first super
    schedule with early exit; the inner refraction re-trace, whose rays
    exist only in-kernel, walks supers in Morton order behind an
    in-kernel super slab test)."""
    msc = refs["msc"]
    msi = refs["msi"]
    cbb = refs["cbb"]
    sbb = refs["sbb"]
    pool = refs["pool"]
    slots = refs["slots"]
    sems = refs["sems"]
    mjar = refs["mjar"]
    mrow = refs["mrow"]
    erow = refs["erow"]
    abest = refs["abest"]
    wfound = refs["wfound"]
    wattr = refs["wattr"]
    (bd_s, nx_s, ny_s, nz_s, px_s, py_s, pz_s,
     sh_s, ro_s, em_s, cr_s, cg_s, cb_s, ca_s) = refs["scr"]

    iv = [msc[r, mi] for r in range(12)]
    tf = [msc[12 + r, mi] for r in range(12)]

    # mesh-local frame; nrm converts local parameter <-> world distance
    # (a_local = dist_world * nrm for unit world d — see trace_soa)
    oi = (iv[0] * o[0] + iv[1] * o[1] + iv[2] * o[2] + iv[3],
          iv[4] * o[0] + iv[5] * o[1] + iv[6] * o[2] + iv[7],
          iv[8] * o[0] + iv[9] * o[1] + iv[10] * o[2] + iv[11])
    dnx = iv[0] * d[0] + iv[1] * d[1] + iv[2] * d[2]
    dny = iv[4] * d[0] + iv[5] * d[1] + iv[6] * d[2]
    dnz = iv[8] * d[0] + iv[9] * d[1] + iv[10] * d[2]
    nrm = jnp.maximum(jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz),
                      np.float32(1e-30))
    di = (dnx / nrm, dny / nrm, dnz / nrm)
    rdi = (_safe_rcp(di[0]), _safe_rcp(di[1]), _safe_rcp(di[2]))

    # per-ray root-box exit cap (local units): nothing can hit beyond the
    # exit from the instance's root AABB, so rays missing the whole mesh
    # stop blocking the front-to-back prune (sparse_trace construction)
    rlo = (msc[31, mi], msc[32, mi], msc[33, mi])
    rhi = (msc[34, mi], msc[35, mi], msc[36, mi])
    rhit, tent = _slab_rows(rlo, rhi, oi, rdi,
                            jnp.full((SUB, LANES), INF))
    t1 = tuple((rhi[k] - oi[k]) * rdi[k] for k in range(3))
    t0 = tuple((rlo[k] - oi[k]) * rdi[k] for k in range(3))
    texi = jnp.minimum(jnp.minimum(jnp.maximum(t0[0], t1[0]),
                                   jnp.maximum(t0[1], t1[1])),
                       jnp.maximum(t0[2], t1[2]))
    bound = jnp.where(rhit, texi * np.float32(1.0001) + np.float32(1e-4),
                      np.float32(0.0))

    # seed the walk's running best from the CURRENT world winner so
    # analytic prims (and earlier instances) occlude this mesh's chunks
    abest[...] = bd_s[...] * nrm
    wfound[...] = jnp.zeros((SUB, LANES), jnp.float32)

    # fold-orientation (rays-on-sublanes) columns, one per 128-ray
    # subrow, hoisted out of the walk ((1,128)->(128,1) relayouts)
    oirc = [[oi[k][r][:, None] for r in range(SUB)] for k in range(3)]
    dirc = [[di[k][r][:, None] for r in range(SUB)] for k in range(3)]

    cstart = msi[0, mi]
    nsup = msi[1, mi]
    sstart = msi[2, mi]

    def prune_now():
        return jnp.max(jnp.minimum(abest[...], bound))

    def fold_row(blk, e1, e2, r):
        """[128-ray, 128-tri] Moller-Trumbore fold of subrow r against
        the chunk in `blk`, with the MXU one-hot winner gather. Folding
        per SUBROW (not per 1024-ray tile) keeps the front-to-back
        prune at 128-ray granularity: one stray sky ray in a big tile
        would otherwise hold `prune` at its root-exit and admit every
        chunk (measured 8+ folds/tile on primaries, round 5)."""
        oic = (oirc[0][r], oirc[1][r], oirc[2][r])
        dic = (dirc[0][r], dirc[1][r], dirc[2][r])
        Ar = [blk[k:k + 1, :] for k in range(3)]
        hx = dic[1] * e2[2] - dic[2] * e2[1]        # [128, C]
        hy = dic[2] * e2[0] - dic[0] * e2[2]
        hz = dic[0] * e2[1] - dic[1] * e2[0]
        det = e1[0] * hx + e1[1] * hy + e1[2] * hz
        invd = 1.0 / det
        sx = oic[0] - Ar[0]
        sy = oic[1] - Ar[1]
        sz = oic[2] - Ar[2]
        u = (sx * hx + sy * hy + sz * hz) * invd
        qx = sy * e1[2] - sz * e1[1]
        qy = sz * e1[0] - sx * e1[2]
        qz = sx * e1[1] - sy * e1[0]
        vv = (dic[0] * qx + dic[1] * qy + dic[2] * qz) * invd
        a = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * invd
        valid = ((jnp.abs(det) >= EPSILON)
                 & (u >= 0.0) & (u <= 1.0)
                 & (vv >= 0.0) & (u + vv <= 1.0)
                 & (a > EPSILON))
        a = jnp.where(valid, a, FLT_MAX)
        cmin = jnp.min(a, axis=1, keepdims=True)    # [128, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        firsti = jnp.min(jnp.where(a == cmin, iota, LANES), axis=1,
                         keepdims=True)
        onehot = (iota == firsti).astype(jnp.float32)
        # MXU winner gather: [18, C] x [128, C] contracting C -> [18,
        # 128]. HIGHEST precision makes the f32 passes exact to ~1 ulp
        # (the onehot operand is exactly representable); default bf16
        # passes quantize vertex coordinates (prototyped round 5).
        attrs = jax.lax.dot_general(
            blk, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [18, 128]
        wa = (attrs[0:1, :], attrs[1:2, :], attrs[2:3, :])
        wb = (attrs[3:4, :], attrs[4:5, :], attrs[5:6, :])
        wc = (attrs[6:7, :], attrs[7:8, :], attrs[8:9, :])
        oi_r = (oi[0][r:r + 1, :], oi[1][r:r + 1, :], oi[2][r:r + 1, :])
        di_r = (di[0][r:r + 1, :], di[1][r:r + 1, :], di[2][r:r + 1, :])
        a_w, valid_w = _mt_rows(wa, wb, wc, oi_r, di_r)
        take = valid_w & (a_w < abest[r:r + 1, :])
        abest[r:r + 1, :] = jnp.where(take, a_w, abest[r:r + 1, :])
        wfound[r:r + 1, :] = jnp.where(take, 1.0, wfound[r:r + 1, :])
        wattr[0:18, r:r + 1, :] = jnp.where(
            take[None], attrs[:, None, :], wattr[0:18, r:r + 1, :])

    def fold_chunk(j, c):
        """Fold DMA slot j into the winner, one predicated subrow at a
        time — subrows whose 128 rays all miss the chunk box (or whose
        bests already beat its entry) skip their fold entirely."""
        if "fold" in _ABLATE:
            return
        blk = slots[j]                              # [18, C]
        Ar = [blk[k:k + 1, :] for k in range(9)]    # corner rows (1, C)
        e1 = (Ar[3] - Ar[0], Ar[4] - Ar[1], Ar[5] - Ar[2])
        e2 = (Ar[6] - Ar[0], Ar[7] - Ar[1], Ar[8] - Ar[2])
        for r in range(SUB):
            prune_r = jnp.max(jnp.minimum(abest[r:r + 1, :],
                                          bound[r:r + 1, :]))

            @pl.when((mrow[j, r] != 0) & (erow[j, r] < prune_r))
            def _(r=r):
                fold_row(blk, e1, e2, r)

    def visit_super(chunk0):
        """Test, DMA and fold one super's TRI_SUPER chunks. chunk0:
        global pool index of the super's first chunk. Two passes: A
        tests every chunk box and STARTS all passing DMAs (so they
        overlap the folds), B waits + folds, re-gating per subrow on
        the bests tightened by earlier folds."""
        def test_a(j, _):
            c = chunk0 + j
            lo = (cbb[0, c], cbb[1, c], cbb[2, c])
            hi = (cbb[3, c], cbb[4, c], cbb[5, c])
            cap = jnp.minimum(abest[...], bound)
            hit, tmin = _slab_rows(lo, hi, oi, rdi, cap)
            m = jnp.any(hit)
            mjar[j] = m.astype(jnp.int32)

            # per-subrow masks + the DMA only for chunks that hit at
            # all: the scalar reductions/SMEM writes are ~200 cycles a
            # chunk, pure waste on the common all-miss case
            @pl.when(m)
            def _():
                te = jnp.where(hit, tmin, INF)
                for r in range(SUB):
                    hr = hit[r:r + 1, :]
                    mrow[j, r] = jnp.any(hr).astype(jnp.int32)
                    erow[j, r] = jnp.min(te[r:r + 1, :])
                pltpu.make_async_copy(pool.at[c], slots.at[j],
                                      sems.at[j]).start()
            return 0

        def fold_b(j, _):
            @pl.when(mjar[j] != 0)
            def _():
                pltpu.make_async_copy(pool.at[chunk0 + j], slots.at[j],
                                      sems.at[j]).wait()
                fold_chunk(j, chunk0 + j)
            return 0

        jax.lax.fori_loop(0, TRI_SUPER, test_a, 0)
        jax.lax.fori_loop(0, TRI_SUPER, fold_b, 0)

    if refs["scheduled"]:
        ordr = refs["ord"]
        entr = refs["ent"]

        def cond(k):
            return (k < nsup) & (entr[0, 0, sstart + k] < prune_now())

        def body(k):
            s = ordr[0, 0, sstart + k]
            visit_super(cstart + s * TRI_SUPER)
            return k + 1

        jax.lax.while_loop(cond, body, 0)
    else:
        # schedule-free walk (inner refraction rays exist only in-kernel):
        # Morton order with an in-kernel super slab gate + running-best
        # prune; refraction lanes are a minority, non-refracting tiles
        # fail the root test and every super gate
        def body2(s, _):
            sc = sstart + s
            lo = (sbb[0, sc], sbb[1, sc], sbb[2, sc])
            hi = (sbb[3, sc], sbb[4, sc], sbb[5, sc])
            cap = jnp.minimum(abest[...], bound)
            shit, _tmin = _slab_rows(lo, hi, oi, rdi, cap)

            @pl.when(jnp.any(shit))
            def _():
                visit_super(cstart + s * TRI_SUPER)
            return 0

        jax.lax.fori_loop(0, nsup, body2, 0)

    # ---- merge the instance winner into the world-winner scratch ----
    att = wattr[...]                     # [18, SUB, LANES]
    wa = (att[0], att[1], att[2])
    wb = (att[3], att[4], att[5])
    wc = (att[6], att[7], att[8])
    aw = abest[...]
    plh = (oi[0] + aw * di[0], oi[1] + aw * di[1], oi[2] + aw * di[2])
    pg = (tf[0] * plh[0] + tf[1] * plh[1] + tf[2] * plh[2] + tf[3],
          tf[4] * plh[0] + tf[5] * plh[1] + tf[6] * plh[2] + tf[7],
          tf[8] * plh[0] + tf[9] * plh[1] + tf[10] * plh[2] + tf[11])
    ex, ey, ez = o[0] - pg[0], o[1] - pg[1], o[2] - pg[2]
    wd = jnp.sqrt(ex * ex + ey * ey + ez * ez)
    take2 = (wfound[...] > 0.0) & (wd < bd_s[...])

    def cross(p, q):
        return (p[1] * q[2] - p[2] * q[1],
                p[2] * q[0] - p[0] * q[2],
                p[0] * q[1] - p[1] * q[0])

    if flat_face:
        no = cross((wb[0] - wa[0], wb[1] - wa[1], wb[2] - wa[2]),
                   (wc[0] - wa[0], wc[1] - wa[1], wc[2] - wa[2]))
    else:
        na = (att[9], att[10], att[11])
        nb = (att[12], att[13], att[14])
        nc = (att[15], att[16], att[17])
        PA = (wa[0] - plh[0], wa[1] - plh[1], wa[2] - plh[2])
        PB = (wb[0] - plh[0], wb[1] - plh[1], wb[2] - plh[2])
        PC = (wc[0] - plh[0], wc[1] - plh[1], wc[2] - plh[2])

        def clen(p, q):
            cx, cy, cz = cross(p, q)
            return jnp.sqrt(cx * cx + cy * cy + cz * cz)

        tA = clen(PB, PC)
        tB = clen(PA, PC)
        tC = clen(PA, PB)
        no = (na[0] * tA + nb[0] * tB + nc[0] * tC,
              na[1] * tA + nb[1] * tB + nc[1] * tC,
              na[2] * tA + nb[2] * tB + nc[2] * tC)
    pn = (plh[0] + no[0], plh[1] + no[1], plh[2] + no[2])
    nmx = tf[0] * pn[0] + tf[1] * pn[1] + tf[2] * pn[2] + tf[3] - pg[0]
    nmy = tf[4] * pn[0] + tf[5] * pn[1] + tf[6] * pn[2] + tf[7] - pg[1]
    nmz = tf[8] * pn[0] + tf[9] * pn[1] + tf[10] * pn[2] + tf[11] - pg[2]
    nl = jnp.maximum(jnp.sqrt(nmx * nmx + nmy * nmy + nmz * nmz),
                     np.float32(1e-30))

    bd_s[...] = jnp.where(take2, wd, bd_s[...])
    nx_s[...] = jnp.where(take2, nmx / nl, nx_s[...])
    ny_s[...] = jnp.where(take2, nmy / nl, ny_s[...])
    nz_s[...] = jnp.where(take2, nmz / nl, nz_s[...])
    px_s[...] = jnp.where(take2, pg[0], px_s[...])
    py_s[...] = jnp.where(take2, pg[1], py_s[...])
    pz_s[...] = jnp.where(take2, pg[2], pz_s[...])
    sh_s[...] = jnp.where(take2, msc[24, mi], sh_s[...])
    ro_s[...] = jnp.where(take2, msc[25, mi], ro_s[...])
    em_s[...] = jnp.where(take2, msc[26, mi], em_s[...])
    cr_s[...] = jnp.where(take2, msc[27, mi], cr_s[...])
    cg_s[...] = jnp.where(take2, msc[28, mi], cg_s[...])
    cb_s[...] = jnp.where(take2, msc[29, mi], cb_s[...])
    ca_s[...] = jnp.where(take2, msc[30, mi], ca_s[...])


def _shape_point(code, plv, dircode):
    """Local offset point for shading-normal reconstruction
    (intersection_info, raytracer_func.frag:783-897): the normal is
    normalize(transfo @ point - Pg). Mirrors megakernel prim_work."""
    from ..ops.intersect import (
        CODE_SPHERE, CODE_CUBE, CODE_CYLINDER, CODE_CONE)

    if code == CODE_SPHERE:
        return (2.0 * plv[0], 2.0 * plv[1], 2.0 * plv[2])
    if code == CODE_CUBE:
        ax = dircode // 2
        sg = jnp.where(dircode % 2 != 0, 1.0, -1.0)
        return (plv[0] + jnp.where(ax == 0, sg, 0.0),
                plv[1] + jnp.where(ax == 1, sg, 0.0),
                plv[2] + jnp.where(ax == 2, sg, 0.0))
    if code == CODE_CYLINDER:
        cap = dircode < 2
        zsg = jnp.where(dircode % 2 != 0, 1.0, -1.0)
        return (plv[0] + jnp.where(cap, 0.0, plv[0]),
                plv[1] + jnp.where(cap, 0.0, plv[1]),
                plv[2] + jnp.where(cap, zsg, 0.0))
    if code == CODE_CONE:
        rxy = jnp.sqrt(plv[0] * plv[0] + plv[1] * plv[1])
        bot = dircode == 0
        return (plv[0] + jnp.where(bot, 0.0, plv[0]),
                plv[1] + jnp.where(bot, 0.0, plv[1]),
                plv[2] + jnp.where(bot, -1.0, rxy / 2.0))
    return (plv[0], plv[1], plv[2] + 1.0)       # oriented quad


def _ana_candidates(fn, iv, tfr, ok, oc, dc):
    """Per-(ray, prim) world-distance candidates for one analytic chunk.
    iv/tfr/ok: (1, C) pool rows; oc/dc: (R, 1) world ray columns.
    Returns (dist [R, C], with FLT_MAX on invalid/pad)."""
    oi = (iv[0] * oc[0] + iv[1] * oc[1] + iv[2] * oc[2] + iv[3],
          iv[4] * oc[0] + iv[5] * oc[1] + iv[6] * oc[2] + iv[7],
          iv[8] * oc[0] + iv[9] * oc[1] + iv[10] * oc[2] + iv[11])
    dnx = iv[0] * dc[0] + iv[1] * dc[1] + iv[2] * dc[2]
    dny = iv[4] * dc[0] + iv[5] * dc[1] + iv[6] * dc[2]
    dnz = iv[8] * dc[0] + iv[9] * dc[1] + iv[10] * dc[2]
    rn = 1.0 / jnp.maximum(
        jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz), np.float32(1e-30))
    di = (dnx * rn, dny * rn, dnz * rn)
    a, valid, dircode = fn(oi[0], oi[1], oi[2], di[0], di[1], di[2])
    plv = (oi[0] + a * di[0], oi[1] + a * di[1], oi[2] + a * di[2])
    pg = (tfr[0] * plv[0] + tfr[1] * plv[1] + tfr[2] * plv[2] + tfr[3],
          tfr[4] * plv[0] + tfr[5] * plv[1] + tfr[6] * plv[2] + tfr[7],
          tfr[8] * plv[0] + tfr[9] * plv[1] + tfr[10] * plv[2] + tfr[11])
    ex = oc[0] - pg[0]
    ey = oc[1] - pg[1]
    ez = oc[2] - pg[2]
    dist = jnp.where(valid & (ok > 0.0),
                     jnp.sqrt(ex * ex + ey * ey + ez * ez), FLT_MAX)
    return dist


def _ana_group(code, cstart, nchunks, sstart, ssched, o, d, rdi,
               ocols, dcols, refs):
    """Walk ONE large analytic group (128-prim HBM chunks) for the
    current tile and merge its winner into the world-winner scratch.
    All in WORLD space/distance (heterogeneous per-prim transforms, the
    GLSL world-distance compare — intersect_prim,
    raytracer_func.frag:681-705). cstart/nchunks/sstart: static pool
    offsets; ssched: static offset of this group's segment in the
    schedule rows. Same front-to-back machinery as the mesh walk."""
    from ..ops.pallas_trace import _SOA_FNS

    fn = _SOA_FNS[code]
    acbb = refs["acbb"]
    asbb = refs["asbb"]
    apool = refs["apool"]
    aslots = refs["aslots"]
    sems = refs["sems"]
    mjar = refs["mjar"]
    mrow = refs["mrow"]
    erow = refs["erow"]
    abest = refs["abest"]
    wfound = refs["wfound"]
    wattr = refs["wattr"]
    (bd_s, nx_s, ny_s, nz_s, px_s, py_s, pz_s,
     sh_s, ro_s, em_s, cr_s, cg_s, cb_s, ca_s) = refs["scr"]

    # world-distance walk: seed from the current winner, cap at the
    # group root's exit (agr: [6, n_ana_groups] SMEM root boxes)
    agr = refs["agr"]
    gx = refs["agidx"]
    rlo = (agr[0, gx], agr[1, gx], agr[2, gx])
    rhi = (agr[3, gx], agr[4, gx], agr[5, gx])
    rhit, _t = _slab_rows(rlo, rhi, o, rdi, jnp.full((SUB, LANES), INF))
    t0 = tuple((rlo[k] - o[k]) * rdi[k] for k in range(3))
    t1 = tuple((rhi[k] - o[k]) * rdi[k] for k in range(3))
    texi = jnp.minimum(jnp.minimum(jnp.maximum(t0[0], t1[0]),
                                   jnp.maximum(t0[1], t1[1])),
                       jnp.maximum(t0[2], t1[2]))
    bound = jnp.where(rhit, texi * np.float32(1.0001) + np.float32(1e-4),
                      np.float32(0.0))
    abest[...] = bd_s[...]
    wfound[...] = jnp.zeros((SUB, LANES), jnp.float32)

    def fold_row(blk, iv, tfr, ok, r):
        oc = (ocols[0][r], ocols[1][r], ocols[2][r])
        dc = (dcols[0][r], dcols[1][r], dcols[2][r])
        dist = _ana_candidates(fn, iv, tfr, ok, oc, dc)
        cmin = jnp.min(dist, axis=1, keepdims=True)
        iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        firsti = jnp.min(jnp.where(dist == cmin, iota, LANES), axis=1,
                         keepdims=True)
        onehot = (iota == firsti).astype(jnp.float32)
        attrs = jax.lax.dot_general(
            blk, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [32, 128]
        o_r = (o[0][r:r + 1, :], o[1][r:r + 1, :], o[2][r:r + 1, :])
        d_r = (d[0][r:r + 1, :], d[1][r:r + 1, :], d[2][r:r + 1, :])
        ivw = [attrs[k:k + 1, :] for k in range(12)]
        tfw = [attrs[12 + k:13 + k, :] for k in range(12)]
        dist_w = _ana_candidates(fn, ivw, tfw, attrs[31:32, :], o_r, d_r)
        take = dist_w < abest[r:r + 1, :]
        abest[r:r + 1, :] = jnp.where(take, dist_w, abest[r:r + 1, :])
        wfound[r:r + 1, :] = jnp.where(take, 1.0, wfound[r:r + 1, :])
        wattr[:, r:r + 1, :] = jnp.where(
            take[None], attrs[:, None, :], wattr[:, r:r + 1, :])

    def fold_chunk(j):
        blk = aslots[j]                             # [32, C]
        iv = [blk[k:k + 1, :] for k in range(12)]
        tfr = [blk[12 + k:13 + k, :] for k in range(12)]
        ok = blk[31:32, :]
        for r in range(SUB):
            prune_r = jnp.max(jnp.minimum(abest[r:r + 1, :],
                                          bound[r:r + 1, :]))

            @pl.when((mrow[j, r] != 0) & (erow[j, r] < prune_r))
            def _(r=r):
                fold_row(blk, iv, tfr, ok, r)

    def visit_super(chunk0):
        def test_a(j, _):
            c = chunk0 + j
            lo = (acbb[0, c], acbb[1, c], acbb[2, c])
            hi = (acbb[3, c], acbb[4, c], acbb[5, c])
            cap = jnp.minimum(abest[...], bound)
            hit, tmin = _slab_rows(lo, hi, o, rdi, cap)
            m = jnp.any(hit)
            mjar[j] = m.astype(jnp.int32)

            @pl.when(m)
            def _():
                te = jnp.where(hit, tmin, INF)
                for r in range(SUB):
                    mrow[j, r] = jnp.any(
                        hit[r:r + 1, :]).astype(jnp.int32)
                    erow[j, r] = jnp.min(te[r:r + 1, :])
                pltpu.make_async_copy(apool.at[c], aslots.at[j],
                                      sems.at[j]).start()
            return 0

        def fold_b(j, _):
            @pl.when(mjar[j] != 0)
            def _():
                pltpu.make_async_copy(apool.at[chunk0 + j], aslots.at[j],
                                      sems.at[j]).wait()
                fold_chunk(j)
            return 0

        jax.lax.fori_loop(0, TRI_SUPER, test_a, 0)
        jax.lax.fori_loop(0, TRI_SUPER, fold_b, 0)

    nsup = nchunks // TRI_SUPER
    if refs["scheduled"]:
        ordr = refs["ord"]
        entr = refs["ent"]

        def cond(k):
            prune = jnp.max(jnp.minimum(abest[...], bound))
            return (k < nsup) & (entr[0, 0, ssched + k] < prune)

        def body(k):
            s = ordr[0, 0, ssched + k]
            visit_super(cstart + s * TRI_SUPER)
            return k + 1

        jax.lax.while_loop(cond, body, 0)
    else:
        def body2(s, _):
            sc = sstart + s
            lo = (asbb[0, sc], asbb[1, sc], asbb[2, sc])
            hi = (asbb[3, sc], asbb[4, sc], asbb[5, sc])
            cap = jnp.minimum(abest[...], bound)
            shit, _tm = _slab_rows(lo, hi, o, rdi, cap)

            @pl.when(jnp.any(shit))
            def _():
                visit_super(cstart + s * TRI_SUPER)
            return 0

        jax.lax.fori_loop(0, nsup, body2, 0)

    # ---- merge: recompute the winner's hit from its extracted rows ----
    att = wattr[...]                    # [32, SUB, LANES]
    iv = [att[k] for k in range(12)]
    tfr = [att[12 + k] for k in range(12)]
    oi = (iv[0] * o[0] + iv[1] * o[1] + iv[2] * o[2] + iv[3],
          iv[4] * o[0] + iv[5] * o[1] + iv[6] * o[2] + iv[7],
          iv[8] * o[0] + iv[9] * o[1] + iv[10] * o[2] + iv[11])
    dnx = iv[0] * d[0] + iv[1] * d[1] + iv[2] * d[2]
    dny = iv[4] * d[0] + iv[5] * d[1] + iv[6] * d[2]
    dnz = iv[8] * d[0] + iv[9] * d[1] + iv[10] * d[2]
    rn = 1.0 / jnp.maximum(
        jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz), np.float32(1e-30))
    di = (dnx * rn, dny * rn, dnz * rn)
    a, _valid, dircode = fn(oi[0], oi[1], oi[2], di[0], di[1], di[2])
    plv = (oi[0] + a * di[0], oi[1] + a * di[1], oi[2] + a * di[2])
    pg = (tfr[0] * plv[0] + tfr[1] * plv[1] + tfr[2] * plv[2] + tfr[3],
          tfr[4] * plv[0] + tfr[5] * plv[1] + tfr[6] * plv[2] + tfr[7],
          tfr[8] * plv[0] + tfr[9] * plv[1] + tfr[10] * plv[2] + tfr[11])
    point = _shape_point(code, plv, dircode)
    tp = (tfr[0] * point[0] + tfr[1] * point[1] + tfr[2] * point[2]
          + tfr[3] - pg[0],
          tfr[4] * point[0] + tfr[5] * point[1] + tfr[6] * point[2]
          + tfr[7] - pg[1],
          tfr[8] * point[0] + tfr[9] * point[1] + tfr[10] * point[2]
          + tfr[11] - pg[2])
    nl = jnp.maximum(jnp.sqrt(tp[0] ** 2 + tp[1] ** 2 + tp[2] ** 2),
                     np.float32(1e-30))
    nv = (tp[0] / nl, tp[1] / nl, tp[2] / nl)
    from ..ops.intersect import CODE_CONE
    if code == CODE_CONE:
        # cone top-"cap" quirk: N = 0 (raytracer_func.frag:850-853)
        topc = dircode == 1
        nv = tuple(jnp.where(topc, 0.0, c_) for c_ in nv)
    wd = abest[...]
    take2 = (wfound[...] > 0.0) & (wd < bd_s[...])
    bd_s[...] = jnp.where(take2, wd, bd_s[...])
    nx_s[...] = jnp.where(take2, nv[0], nx_s[...])
    ny_s[...] = jnp.where(take2, nv[1], ny_s[...])
    nz_s[...] = jnp.where(take2, nv[2], nz_s[...])
    px_s[...] = jnp.where(take2, pg[0], px_s[...])
    py_s[...] = jnp.where(take2, pg[1], py_s[...])
    pz_s[...] = jnp.where(take2, pg[2], pz_s[...])
    sh_s[...] = jnp.where(take2, att[24], sh_s[...])
    ro_s[...] = jnp.where(take2, att[25], ro_s[...])
    em_s[...] = jnp.where(take2, att[26], em_s[...])
    cr_s[...] = jnp.where(take2, att[27], cr_s[...])
    cg_s[...] = jnp.where(take2, att[28], cg_s[...])
    cb_s[...] = jnp.where(take2, att[29], cb_s[...])
    ca_s[...] = jnp.where(take2, att[30], ca_s[...])


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _fused_kernel(groups, n_mesh, ana_groups, mesh_stot, has_transparent,
                  flat_face, whole_path, cull_small, sched_base,
                  stf_ref, sti_ref, fpar_ref, tab_ref, msc_ref, msi_ref,
                  cbb_ref, sbb_ref, acbb_ref, asbb_ref, agr_ref, gsbb_ref,
                  ord_ref, ent_ref, pool_ref, apool_ref,
                  outf_ref, outu_ref,
                  slots, aslots, sems, mjar, mrow, erow,
                  abest, wfound, wattr, *scr):
    o = (stf_ref[0], stf_ref[1], stf_ref[2])
    d = (stf_ref[3], stf_ref[4], stf_ref[5])
    attenu = (stf_ref[6], stf_ref[7], stf_ref[8])
    total = (stf_ref[9], stf_ref[10], stf_ref[11])
    result = (stf_ref[12], stf_ref[13], stf_ref[14])
    done_i = sti_ref[0].astype(jnp.int32)
    state = (sti_ref[1], sti_ref[2], sti_ref[3])
    ior = fpar_ref[0, 0]

    refs = dict(msc=msc_ref, msi=msi_ref, cbb=cbb_ref, sbb=sbb_ref,
                acbb=acbb_ref, asbb=asbb_ref, agr=agr_ref,
                ord=ord_ref, ent=ent_ref, pool=pool_ref, apool=apool_ref,
                slots=slots, aslots=aslots,
                sems=sems, mjar=mjar, mrow=mrow,
                erow=erow, abest=abest, wfound=wfound, wattr=wattr,
                scr=scr, scheduled=True)
    calls = []

    def trace_fn(o, d, n_prev, p_prev):
        refs2 = dict(refs, scheduled=not calls)
        calls.append(1)
        (bd_s, nx_s, ny_s, nz_s, px_s, py_s, pz_s,
         sh_s, ro_s, em_s, cr_s, cg_s, cb_s, ca_s) = scr
        if groups:
            # cull_small: the megakernel's two-level per-prim culled
            # fold (nearest-first supers from this bounce's schedule
            # segment) — on for SMEM tables big enough to pay for it
            _trace_fold(groups, tab_ref, gsbb_ref, ord_ref, o, d,
                        n_prev, p_prev, scr, cull=cull_small,
                        ord_base=sched_base)
        else:
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

        def inst(mi, _):
            _mesh_instance(flat_face, mi, o, d, refs2)
            return 0

        if "mesh" not in _ABLATE and n_mesh:
            jax.lax.fori_loop(0, n_mesh, inst, 0)
        if ana_groups:
            rdi = (_safe_rcp(d[0]), _safe_rcp(d[1]), _safe_rcp(d[2]))
            ocols = [[o[k][r][:, None] for r in range(SUB)]
                     for k in range(3)]
            dcols = [[d[k][r][:, None] for r in range(SUB)]
                     for k in range(3)]
            ssched = mesh_stot
            for gidx, (code, cstart, nchunks, sstart) in enumerate(
                    ana_groups):
                refs3 = dict(refs2, agidx=gidx)
                _ana_group(code, cstart, nchunks, sstart, ssched,
                           o, d, rdi, ocols, dcols, refs3)
                ssched += nchunks // TRI_SUPER
        bd = bd_s[...]
        return (bd < FLT_MAX,
                (nx_s[...], ny_s[...], nz_s[...]),
                (px_s[...], py_s[...], pz_s[...]),
                sh_s[...], ro_s[...], em_s[...],
                (cr_s[...], cg_s[...], cb_s[...]), ca_s[...])

    if whole_path == 0:
        # wavefront mode: ONE bounce per call; the host loop sorts the
        # wavefront between calls (mesh scenes want the coherence)
        o, d, attenu, total, result, done_i, state = _bounce_step(
            trace_fn, has_transparent, ior,
            o, d, attenu, total, result, done_i, state)
    else:
        # whole-path mode (opaque large-analytic scenes): the FULL
        # bounce loop in-kernel, megakernel-style — state never leaves
        # VMEM, no inter-bounce sorting or dispatch. Bounce 0 uses the
        # scheduled walk (the primary-ray schedule exists); later
        # bounces take the schedule-free slab-gated walk (`calls` makes
        # only the very first trace scheduled). Terminated lanes are
        # parked in-kernel so their box tests all fail.
        z = jnp.zeros_like(d[0])

        def bounce(carry):
            o, d, attenu, total, result, done_i, state = carry
            done = done_i != 0
            o = tuple(jnp.where(done, p, c)
                      for p, c in zip((z, z, z + np.float32(2.0e8)), o))
            d = tuple(jnp.where(done, p, c)
                      for p, c in zip((z, z, z + 1.0), d))
            return _bounce_step(trace_fn, has_transparent, ior,
                                o, d, attenu, total, result, done_i,
                                state)

        carry = (o, d, attenu, total, result, done_i, state)
        carry = bounce(carry)                       # scheduled primaries
        if whole_path > 1:
            carry = jax.lax.fori_loop(1, whole_path,
                                      lambda _, c: bounce(c), carry)
        o, d, attenu, total, result, done_i, state = carry

    for k, v in enumerate((*o, *d, *attenu, *total, *result)):
        outf_ref[k] = v
    outu_ref[0] = done_i.astype(U32)
    outu_ref[1] = state[0]
    outu_ref[2] = state[1]
    outu_ref[3] = state[2]


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------

def _mesh_tables(scene):
    """SMEM tables for the mesh walk (device-side, cheap under jit).

    msc [37, n_mesh] f32: rows 0-11 inverse affine, 12-23 mesh_transfo
    affine, 24 shin, 25 rough, 26 emis, 27-29 rgb, 30 alpha, 31-36 root
    AABB (mesh-local, union of real chunk boxes).
    msi [4, n_mesh] i32 (static): chunk_start, n_supers, super_start, 0.
    cbb/sbb: concatenated per-instance chunk/super AABBs [6, *]."""
    if not scene.mesh_prim_index:
        z6 = jnp.zeros((6, 1), jnp.float32)
        return (jnp.zeros((37, 1), jnp.float32),
                jnp.zeros((4, 1), jnp.int32), z6, z6)
    cols = []
    for prim_index, cbb_i in zip(scene.mesh_prim_index,
                                 scene.mesh_chunk_bb):
        inv = scene.inv_transfo[prim_index][:3, :4].reshape(12)
        mtr = scene.mesh_transfo[prim_index][:3, :4].reshape(12)
        m = scene.mat[prim_index]
        c = scene.color[prim_index]
        real = cbb_i[0] <= cbb_i[3]
        rlo = jnp.min(jnp.where(real[None, :], cbb_i[0:3], INF), axis=1)
        rhi = jnp.max(jnp.where(real[None, :], cbb_i[3:6], -INF), axis=1)
        cols.append(jnp.concatenate(
            [inv, mtr, m[0:3], c[0:3], c[3:4], rlo, rhi]))
    msc = jnp.stack(cols, axis=1)                      # [37, n_mesh]

    msi_np = np.zeros((4, len(scene.mesh_prim_index)), np.int32)
    cstart = sstart = 0
    for i, cbb_i in enumerate(scene.mesh_chunk_bb):
        nkc = int(cbb_i.shape[1])
        msi_np[0, i] = cstart
        msi_np[1, i] = nkc // TRI_SUPER
        msi_np[2, i] = sstart
        cstart += nkc
        sstart += nkc // TRI_SUPER
    cbb = jnp.concatenate(scene.mesh_chunk_bb, axis=1)
    sbb = jnp.concatenate(scene.mesh_super_bb, axis=1)
    return msc, jnp.asarray(msi_np), cbb, sbb


def _ana_tables(scene):
    """[6, n_ana_groups] per-group world root AABBs (union of real
    chunk boxes) for the large-group walk's per-ray exit cap."""
    if not scene.ana_groups:
        return jnp.zeros((6, 1), jnp.float32)
    cols = []
    for code, cstart, nchunks, sstart in scene.ana_groups:
        cb = scene.ana_chunk_bb[:, cstart:cstart + nchunks]
        real = cb[0] <= cb[3]
        rlo = jnp.min(jnp.where(real[None, :], cb[0:3], INF), axis=1)
        rhi = jnp.max(jnp.where(real[None, :], cb[3:6], -INF), axis=1)
        cols.append(jnp.concatenate([rlo, rhi]))
    return jnp.stack(cols, axis=1)


def _schedules(scene, o_rows, d_rows):
    """Per-(tile, instance) nearest-first super schedules for the outer
    trace, computed XLA-side each bounce from the (sorted) wavefront.

    The tile bundles are computed ONCE in world space; each instance's
    local-frame bundle is then derived by interval arithmetic over the
    inverse affine map (center +- radius form) — transforming 4 interval
    rows per tile instead of every ray (the per-ray version measured
    ~8 ms/bounce at 480K rays, pure XLA overhead). Entry distances come
    out in UNNORMALIZED local-direction units (point = oi + t*din), so
    the unit-parameter entry of a ray is t * |din_ray|; multiplying the
    bundle's t lower bound by the tile's MIN |d_local| over the
    direction interval lower-bounds it for every contained ray
    (conservative — 0 when a tile's direction interval spans a sign
    change on every axis, which the octant sort makes rare). Margins
    mirror ops/sparse_trace. Returns (ord [nt,1,Stot] i32,
    ent [nt,1,Stot] f32)."""
    olo, ohi, dlo, dhi = tile_bundles(o_rows, d_rows, TILE)  # [3, nt]
    ords, ents = [], []
    nt = olo.shape[1]
    for prim_index, sbb_i in zip(scene.mesh_prim_index,
                                 scene.mesh_super_bb):
        inv = scene.inv_transfo[prim_index]
        lin = inv[:3, :3]
        absl = jnp.abs(lin)
        oc = (olo + ohi) * 0.5
        orad = (ohi - olo) * 0.5
        oc_l = lin @ oc + inv[:3, 3:4]
        orad_l = absl @ orad
        dc = (dlo + dhi) * 0.5
        drad = (dhi - dlo) * 0.5
        dc_l = lin @ dc
        drad_l = absl @ drad
        bundles = (oc_l - orad_l, oc_l + orad_l,
                   dc_l - drad_l, dc_l + drad_l)
        # conservative min |d_local| over the tile's direction interval:
        # per component, min |[lo, hi]| is 0 when the interval spans 0
        dl = dc_l - drad_l
        dh = dc_l + drad_l
        cmin = jnp.where((dl <= 0.0) & (dh >= 0.0), 0.0,
                         jnp.minimum(jnp.abs(dl), jnp.abs(dh)))
        dmin = jnp.sqrt(jnp.sum(cmin * cmin, axis=0))            # [nt]
        raw = bundle_box_entry(bundles, sbb_i)                   # [nt, S_i]
        # scale BEFORE the INF test: INF * 0 would be NaN
        ent = jnp.where(
            raw >= INF, INF,
            raw * dmin[:, None] * np.float32(1.0 - 1e-4)
            - np.float32(1e-4))
        s = ent.shape[1]
        ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :],
                               (nt, s))
        ent_s, order = jax.lax.sort((ent, ids), dimension=1, num_keys=1)
        ords.append(order)
        ents.append(ent_s)
    def world_segment(sbb_g):
        """Sorted nearest-first segment over world-space boxes."""
        raw = bundle_box_entry((olo, ohi, dlo, dhi), sbb_g)
        ent = jnp.where(raw >= INF, INF,
                        raw * np.float32(1.0 - 1e-4) - np.float32(1e-4))
        sg = ent.shape[1]
        ids = jnp.broadcast_to(jnp.arange(sg, dtype=jnp.int32)[None, :],
                               (nt, sg))
        ent_s, order = jax.lax.sort((ent, ids), dimension=1, num_keys=1)
        ords.append(order)
        ents.append(ent_s)

    for code, cstart, nchunks, sstart in scene.ana_groups:
        # large analytic groups: world-space bundles directly (unit d)
        world_segment(
            scene.ana_super_bb[:, sstart:sstart + nchunks // 16])
    if cull_small(scene):
        # per-group MEGA_SUPER-window segments for the culled SMEM fold
        from .megakernel import MEGA_SUPER
        gsbb = _small_super_boxes(scene)
        groups, _t = _small_meta(scene)
        for code, start, count, sstart in groups:
            nsup = -(-count // MEGA_SUPER)
            world_segment(gsbb[:, sstart:sstart + nsup])
    if not ords:
        return (jnp.zeros((nt, 1, 1), jnp.int32),
                jnp.full((nt, 1, 1), INF, jnp.float32))
    ordr = jnp.concatenate(ords, axis=1)[:, None, :]
    entr = jnp.concatenate(ents, axis=1)[:, None, :]
    return ordr, entr


def _fused_call(stf, sti, fpar, tab, msc, msi, cbb, sbb, acbb, asbb,
                agr, gsbb, ordr, entr, pool, apool,
                groups, n_mesh, ana_groups, mesh_stot, has_transparent,
                flat_face, whole_path, cull_small, sched_base, interpret):
    m = stf.shape[1]
    nt = m // TILE
    stf = stf.reshape(SF, m // LANES, LANES)
    sti = sti.reshape(SU, m // LANES, LANES)
    stf_spec = pl.BlockSpec((SF, SUB, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    sti_spec = pl.BlockSpec((SU, SUB, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    sched_spec = lambda arr: pl.BlockSpec(
        (1, 1, arr.shape[2]), lambda i: (i, 0, 0),
        memory_space=pltpu.SMEM)
    kernel = functools.partial(_fused_kernel, groups, n_mesh, ana_groups,
                               mesh_stot, has_transparent, flat_face,
                               whole_path, cull_small, sched_base)
    call = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[stf_spec, sti_spec, smem((1, 1)), smem(tab.shape),
                  smem(msc.shape), smem(msi.shape), smem(cbb.shape),
                  smem(sbb.shape), smem(acbb.shape), smem(asbb.shape),
                  smem(agr.shape), smem(gsbb.shape),
                  sched_spec(ordr), sched_spec(entr),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[stf_spec, sti_spec],
        out_shape=[
            jax.ShapeDtypeStruct((SF, m // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((SU, m // LANES, LANES), jnp.uint32)],
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 18, LANES), jnp.float32),   # tri chunk slots
            pltpu.VMEM((NSLOT, 32, LANES), jnp.float32),   # ana chunk slots
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SMEM((NSLOT,), jnp.int32),               # chunk masks
            pltpu.SMEM((NSLOT, SUB), jnp.int32),           # subrow masks
            pltpu.SMEM((NSLOT, SUB), jnp.float32),         # subrow entries
            pltpu.VMEM((SUB, LANES), jnp.float32),         # abest
            pltpu.VMEM((SUB, LANES), jnp.float32),         # wfound
            pltpu.VMEM((32, SUB, LANES), jnp.float32),     # wattr
        ] + [pltpu.VMEM((SUB, LANES), jnp.float32)] * 14,  # winner scr
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )
    outf, outu = call(stf, sti, fpar, tab, msc, msi, cbb, sbb, acbb,
                      asbb, agr, gsbb, ordr, entr, pool, apool)
    return outf.reshape(SF, m), outu.reshape(SU, m)


def raytrace_fused(scene, O, D, screen_tc, pass_index, *, nb_bounces: int,
                   refract_ind, date=0.0, interpret: bool = False,
                   sort_rays: bool = True, whole_path: bool | None = None):
    """Per-bounce fused-kernel twin of models.montecarlo.raytrace for
    mesh scenes. O: [3] camera origin, D: [N,3] ray dirs (normalized
    inside), screen_tc: [N,2]. Returns rgb [N,3]. Bit-identical RNG
    schedule to the SoA integrator; float results match to a few ulp
    plus the winner-extraction caveats in the module docstring."""
    from ..ops.sort_rays import ray_sort_key, PARK_Z

    n = D.shape[0]
    m = ((n + TILE - 1) // TILE) * TILE

    dn = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    dx = jnp.zeros((m,), jnp.float32).at[:n].set(dn[:, 0])
    dy = jnp.zeros((m,), jnp.float32).at[:n].set(dn[:, 1])
    dz = jnp.ones((m,), jnp.float32).at[:n].set(dn[:, 2])
    u = jnp.zeros((m,), jnp.float32).at[:n].set(screen_tc[:, 0])
    v = jnp.zeros((m,), jnp.float32).at[:n].set(screen_tc[:, 1])
    o3 = jnp.broadcast_to(jnp.asarray(O, jnp.float32), (3,))
    s0, s1, s2 = _rng.srand_soa(u, v, pass_index, date)

    z = jnp.zeros((m,), jnp.float32)
    stf = jnp.stack([
        z + o3[0], z + o3[1], z + o3[2],          # o
        dx, dy, dz,                               # d
        z + 0.8, z + 0.8, z + 0.8,                # attenu (:106-107)
        z, z, z,                                  # total
        z, z, z,                                  # result
    ])
    sti = jnp.stack([jnp.zeros((m,), U32), s0, s1, s2])
    lane = jnp.arange(m, dtype=jnp.int32)

    groups, _total = _small_meta(scene)
    tab = _small_table(scene)
    msc, msi, cbb, sbb = _mesh_tables(scene)
    agr = _ana_tables(scene)
    csm = cull_small(scene)
    gsbb = (_small_super_boxes(scene) if csm
            else jnp.zeros((6, 1), jnp.float32))
    mesh_stot = sum(int(c.shape[1]) // TRI_SUPER
                    for c in scene.mesh_chunk_bb)
    ana_stot = sum(nc // TRI_SUPER for _c, _s, nc, _ss in scene.ana_groups)
    sched_base = mesh_stot + ana_stot
    acbb = (scene.ana_chunk_bb if scene.ana_groups
            else jnp.zeros((6, 1), jnp.float32))
    asbb = (scene.ana_super_bb if scene.ana_groups
            else jnp.zeros((6, 1), jnp.float32))
    apool = (scene.ana_chunks if scene.ana_groups
             else jnp.zeros((1, 32, 128), jnp.float32))
    tpool = (scene.tri_chunks if scene.mesh_prim_index
             else jnp.zeros((1, 18, 128), jnp.float32))
    fpar = jnp.asarray(refract_ind, jnp.float32).reshape(1, 1)
    n_mesh = len(scene.mesh_prim_index)
    sort_lo = jnp.min(scene.prim_bb_min, axis=0)
    sort_hi = jnp.max(scene.prim_bb_max, axis=0)
    if whole_path is None:
        # mesh scenes want the inter-bounce wavefront re-sort (their
        # secondary-ray fold counts dominate); large-analytic scenes
        # behave like the megakernel and keep the whole path in VMEM
        whole_path = not scene.mesh_prim_index

    # sort every bounce EXCEPT the first: primaries arrive
    # pixel-coherent from the renderer's tile layout, so bounce 0's
    # octant regrouping is pure cost (~15 ms argsort + gathers at 480K
    # rays); from bounce 1 on, the diffuse scatter destroys coherence
    # and the re-sort pays for itself several times over in skipped
    # mesh folds (measured both ways, round 5). Parking terminated
    # lanes still happens every bounce (per-ray caps zero their chunk
    # tests), so the skipped first sort never costs correctness.
    sort_at = jnp.asarray(
        [sort_rays and i >= 1 for i in range(nb_bounces)], bool)

    def do_sort(carry):
        stf, sti, lane = carry
        done = sti[0] != 0
        key = ray_sort_key((stf[0], stf[1], stf[2]),
                           (stf[3], stf[4], stf[5]), done,
                           sort_lo, sort_hi)
        perm = jnp.argsort(key)
        return (jnp.take(stf, perm, axis=1), jnp.take(sti, perm, axis=1),
                jnp.take(lane, perm))

    def bounce_body(i, carry):
        stf, sti, lane = carry
        done = sti[0] != 0
        # park terminated lanes outside every box pointing away so their
        # tiles fail the root tests (ops/sort_rays.PARK_Z)
        park = jnp.stack([z, z, z + PARK_Z, z, z, z + 1.0])
        stf = jnp.concatenate(
            [jnp.where(done[None, :], park, stf[0:6]), stf[6:]], axis=0)
        if sort_rays:
            stf, sti, lane = jax.lax.cond(
                sort_at[i], do_sort, lambda c: c, (stf, sti, lane))
        ordr, entr = _schedules(scene, stf[0:3], stf[3:6])
        stf, sti = _fused_call(
            stf, sti, fpar, tab, msc, msi, cbb, sbb, acbb, asbb, agr,
            gsbb, ordr, entr, tpool, apool, groups, n_mesh,
            scene.ana_groups, mesh_stot, scene.has_transparent,
            scene.flat_face, 0, csm, sched_base, interpret)
        return stf, sti, lane

    if whole_path:
        # single kernel call, full bounce loop in VMEM (no sorts)
        ordr, entr = _schedules(scene, stf[0:3], stf[3:6])
        stf, sti = _fused_call(
            stf, sti, fpar, tab, msc, msi, cbb, sbb, acbb, asbb, agr,
            gsbb, ordr, entr, tpool, apool, groups, n_mesh,
            scene.ana_groups, mesh_stot, scene.has_transparent,
            scene.flat_face, int(nb_bounces), csm, sched_base, interpret)
    else:
        stf, sti, lane = jax.lax.fori_loop(0, nb_bounces, bounce_body,
                                           (stf, sti, lane))
    # bounce-cap exhaustion returns black (:178)
    done = sti[0] != 0
    rgb_rows = jnp.where(done[None, :], stf[12:15], 0.0)
    out = jnp.zeros((3, m), jnp.float32).at[:, lane].set(rgb_rows)
    return out.T[:n]
