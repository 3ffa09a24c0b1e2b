"""Block-sparse Pallas trace kernels driven by precomputed worklists.

The companions to ops/worklist.py: instead of looping every primitive
chunk inside the kernel and voting with `@pl.when(jnp.any(boxhit))`
(round 2 — coarse, and Mosaic-compile-hostile), the grid IS the
worklist: one grid step per (ray tile, primitive block) pair that the
XLA-side frustum test admitted. Scalar-prefetched (tile_id, block_id)
arrays drive the BlockSpec index maps — the same pattern as block-sparse
attention. Outputs are indexed by tile_id, revisited consecutively
(worklists are tile-sorted), and initialized on tile change.

Two kernels, both occlusion-refined the same way (the TPU equivalent of
the reference's front-to-back BVH walk with the current-closest prune,
intersect_bv, raytracer_func.frag:344-350): per ray tile, process the K
nearest reachable blocks by conservative bundle ENTRY distance, carry
the per-ray best into the kernel, skip a block once its entry bound
can't beat any ray's min(best, root-exit), and iterate (lax.while_loop)
until no unprocessed block could improve anything:

- analytic groups: scalar-prim fold (megakernel style — one prim's
  affine coefficients from a per-block SMEM DMA broadcast over a
  1024-ray tile) over SUP=8-prim blocks. Finer culling granularity than
  the 128-lane chunk kernels (a work block is 8 prims, not 128) — the
  per-prim answer to intersect_bv pruning (raytracer_func.frag:314-352).
- mesh triangles: the Moller-Trumbore [T, C] fold of ops/pallas_trace.py
  over 128-triangle chunks, but with 256-ray tiles (4x finer votes) and
  zero in-kernel traversal logic (Mesh_intersect / intersect_bvm analog,
  raytracer_func.frag:642-678).

Winner parity: the refinement loop only ever skips a block whose entry
bound provably can't beat a strictly-closer winner, so winners match the
brute folds (asserted in tests/test_sparse_trace.py) up to the
nearest-first tie-order caveat documented on each wrapper. There is no
overflow fallback — the while_loop covers any vote count by iterating.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import EPSILON, FLT_MAX
from .pallas_trace import _SOA_FNS, PRIM_CHUNK, _round_up
from .worklist import tile_bundles, bundle_box_entry

SUP = 8             # prims per analytic work block
AN_TILE = 1024      # rays per analytic tile (8 sublanes x 128 lanes)
AN_ROWS = AN_TILE // 128
MESH_TILE = 128     # rays per mesh tile (sublane-major [T, C] layout).
                    # 128 is the Mosaic lane floor for the (3, MESH_TILE)
                    # ray blocks; vs 256 it halves the per-tile direction
                    # union that decides how many chunks a tile is
                    # charged for (mesh_hires +44%, mesh_demo +12%
                    # measured once worklists were pad-free)


# ---------------------------------------------------------------------------
# analytic groups: scalar-prim fold over SUP-prim worklist blocks,
# occlusion-refined exactly like the mesh route below: per tile, process
# the K nearest reachable blocks by bundle ENTRY distance, carry the
# per-ray best in/out, skip a block in-kernel once its entry bound can't
# beat any ray's min(best, root-exit), iterate until no unprocessed block
# could improve anything. The reference gets the same effect from its
# per-ray current-closest BVH prune (intersect_bv,
# shaders/raytracer_func.frag:344-350).
# ---------------------------------------------------------------------------

AN_K = 32           # average worklist budget per tile (see _budget_worklist)


def _ranked_schedule(tlo_all):
    """Pre-sort each tile's blocks nearest-first ONCE (outside the
    refinement loop). tlo_all: [nt, S] conservative entry distances
    (INF = unreachable). Returns (order_in_tile [nt, S] i32 block ids by
    ascending entry, tlo_sorted [nt, S]).

    One multi-operand lax.sort, NOT argsort + take_along_axis: the
    take_along gather cost 2.5 ms per [512, 796] call on chip (31% of a
    mesh_hires pass); the hardware sort carries the id payload for
    free."""
    nt, s = tlo_all.shape
    ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :],
                           (nt, s))
    tlo_sorted, order = jax.lax.sort((tlo_all, ids), dimension=1,
                                     num_keys=1)
    return order, tlo_sorted


def _budget_worklist(valid_sorted, order_in_tile, tlo_sorted, w, interpret):
    """Compact the candidate (tile, block) pairs — tile-major, nearest-
    first within each tile — into one worklist under a GLOBAL budget of
    `w` items shared across tiles.

    Why this shape: a fixed [ntiles, k] worklist charges every PAD item
    its block DMAs (~0.7 us each — measured 95% padding on primary
    bounces), and per-tile-k refinement needs one loop iteration per k
    blocks of the WORST tile (measured 12 iterations on mesh_hires
    secondaries, each paying top_k + prefetch-DMA + dispatch overhead,
    while most tiles finished in one). A single compacted list lets the
    handful of silhouette tiles take hundreds of items in ONE call;
    the budget only bounds the scalar-prefetch SMEM footprint, and any
    overflow is picked up by the caller's next refinement iteration
    (executed pairs are reported back). Compaction is argsort of flagged
    indices, not nonzero (the XLA cumsum path costs milliseconds; the
    hardware sort ~0.03 ms).

    Returns (tid, bid, tlo, grid_n, executed[nt, S] in rank layout).
    Interpret mode (static grid) runs the full budget with the tail
    pinned to the last head tile + bid == -1, which either no-ops (tile
    already seeded) or copies the carry — never clobbers results."""
    from .worklist import INF

    nt, s = valid_sorted.shape
    l = nt * s
    iota = jnp.arange(l, dtype=jnp.int32)
    vflat = valid_sorted.reshape(-1)
    perm = jnp.argsort(jnp.where(vflat, iota, iota + l))
    n = jnp.minimum(jnp.sum(vflat.astype(jnp.int32)), w)
    sel = perm[:w]                       # static-size slice (w <= l)
    in_head = jnp.arange(w, dtype=jnp.int32) < n
    tid_c0 = sel // s
    bid_c0 = jnp.take(order_in_tile.reshape(-1), sel)
    tlo_c0 = jnp.take(tlo_sorted.reshape(-1), sel)
    # tail (interpret-mode only) pins to the last HEAD tile so the
    # tid-change first-visit test never reseeds a tile that has results
    head_last = jnp.max(jnp.where(in_head, tid_c0, 0))
    tid_c = jnp.where(in_head, tid_c0, head_last)
    bid_c = jnp.where(in_head, bid_c0, -1)
    tlo_c = jnp.where(in_head, tlo_c0, INF)
    executed = jnp.zeros((l,), bool).at[sel].max(in_head).reshape(nt, s)
    grid_n = w if interpret else n
    return tid_c, bid_c, tlo_c, grid_n, executed


def _an_kernel(shape_code, tid_ref, bid_ref, tlo_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tab_ref,
               din_ref, rin_ref, ain_ref, iin_ref, bnd_ref,
               dist_ref, row_ref, a_ref, dir_ref):
    """One (1024-ray tile, 8-prim block) work item.

    tab_ref: SMEM (1, 25, SUP) block DMA'd per work item — rows 0-11
    inverse affine, 12-23 forward affine, 24 ok flag (0 = group padding,
    never hits). The worklist is COMPACTED and tile-sorted
    (_budget_worklist), so a tile's first step is where tid changes; it
    seeds the fold from the carried-in best (din/rin/ain/iin); tiles
    with no work are never visited (the caller merges their carry back
    XLA-side). The prim fold is a fori_loop (a python unroll of the SUP
    bodies multiplied Mosaic compile time ~8x — 122 s measured round 3);
    in-block SMEM loads use the dynamic loop index, which is a plain
    scalar load. Outputs match group_best_rows: (dist, group row, local
    a, dircode) per ray."""
    fn = _SOA_FNS[shape_code]
    w = pl.program_id(0)
    bid = bid_ref[w]
    first = jnp.logical_or(
        w == 0, tid_ref[jnp.maximum(w - 1, 0)] != tid_ref[w])

    @pl.when(first)
    def _():
        dist_ref[...] = din_ref[...]
        row_ref[...] = rin_ref[...]
        a_ref[...] = ain_ref[...]
        dir_ref[...] = iin_ref[...]

    # occlusion prune: a block can only matter if its conservative entry
    # bound beats some ray's min(current best, root-box exit) — blocks
    # arrive nearest-first, so once this fails the rest of the tile's
    # blocks fail too and cost only this scalar compare each
    prune = jnp.max(jnp.minimum(dist_ref[...], bnd_ref[...]))

    @pl.when((bid >= 0) & (tlo_ref[w] < prune))
    def _():
        o = (ox_ref[...], oy_ref[...], oz_ref[...])     # [AN_ROWS, 128]
        d = (dx_ref[...], dy_ref[...], dz_ref[...])

        def prim_body(j, _):
            iv = [tab_ref[0, r, j] for r in range(12)]
            tf = [tab_ref[0, r + 12, j] for r in range(12)]
            ok = tab_ref[0, 24, j] > 0.0
            oi = (iv[0] * o[0] + iv[1] * o[1] + iv[2] * o[2] + iv[3],
                  iv[4] * o[0] + iv[5] * o[1] + iv[6] * o[2] + iv[7],
                  iv[8] * o[0] + iv[9] * o[1] + iv[10] * o[2] + iv[11])
            tdx = iv[0] * d[0] + iv[1] * d[1] + iv[2] * d[2]
            tdy = iv[4] * d[0] + iv[5] * d[1] + iv[6] * d[2]
            tdz = iv[8] * d[0] + iv[9] * d[1] + iv[10] * d[2]
            nrm = jnp.maximum(
                jnp.sqrt(tdx * tdx + tdy * tdy + tdz * tdz),
                np.float32(1e-30))
            di = (tdx / nrm, tdy / nrm, tdz / nrm)
            a, valid, dircode = fn(oi[0], oi[1], oi[2],
                                   di[0], di[1], di[2])
            plx = oi[0] + a * di[0]
            ply = oi[1] + a * di[1]
            plz = oi[2] + a * di[2]
            pgx = tf[0] * plx + tf[1] * ply + tf[2] * plz + tf[3]
            pgy = tf[4] * plx + tf[5] * ply + tf[6] * plz + tf[7]
            pgz = tf[8] * plx + tf[9] * ply + tf[10] * plz + tf[11]
            ex, ey, ez = o[0] - pgx, o[1] - pgy, o[2] - pgz
            dist = jnp.where(valid,
                             jnp.sqrt(ex * ex + ey * ey + ez * ez),
                             FLT_MAX)
            # masked strictly-closer fold (ok folded into take — no
            # predicated region per prim; NaNs from padding columns
            # compare false and never land)
            take = ok & (dist < dist_ref[...])
            dist_ref[...] = jnp.where(take, dist, dist_ref[...])
            row_ref[...] = jnp.where(take, bid * SUP + j, row_ref[...])
            a_ref[...] = jnp.where(take, a, a_ref[...])
            dir_ref[...] = jnp.where(take, dircode, dir_ref[...])
            return 0

        jax.lax.fori_loop(0, SUP, prim_body, 0)


def _an_fold_call(o_blk, d_blk, tab, tid, bid, tlo,
                  dist, row, a, dircode, bound, shape_code, grid_n,
                  interpret):
    """One Pallas fold over a compacted tile-sorted worklist, carrying
    the prior per-ray best in/out. grid_n: dynamic trip count (the real
    item count; tiles with no items are not visited — the caller merges
    their carry back). bound: [m//128, 128] root-exit cap."""
    m = o_blk.shape[1] * 128
    ray_spec = pl.BlockSpec((AN_ROWS, 128),
                            lambda w, t, b, q: (t[w], 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((1, 25, SUP),
                            lambda w, t, b, q: (jnp.maximum(b[w], 0), 0, 0),
                            memory_space=pltpu.SMEM)
    io_spec = pl.BlockSpec((AN_ROWS, 128), lambda w, t, b, q: (t[w], 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_n,),
        in_specs=[ray_spec] * 6 + [tab_spec] + [io_spec] * 5,
        out_specs=[io_spec] * 4,
    )
    out_shape = [
        jax.ShapeDtypeStruct((m // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((m // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((m // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((m // 128, 128), jnp.int32),
    ]
    return pl.pallas_call(
        functools.partial(_an_kernel, shape_code),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tid, bid, tlo,
      o_blk[0], o_blk[1], o_blk[2], d_blk[0], d_blk[1], d_blk[2], tab,
      dist, row, a, dircode, bound)


@functools.partial(jax.jit, static_argnames=("shape_code", "interpret"))
def group_best_rows_sparse(o, d, shape_code, inv_r, trf_r, pid, sup_bb,
                           interpret=False):
    """Occlusion-refined worklist twin of pallas_trace.group_best_rows.

    o, d: [3, M] ray rows (M a multiple of AN_TILE, UNIT directions —
    the slab parameter IS world distance, which the entry-bound prune
    compares against the fold's world `dist`), padded group tables from
    _pad_group, sup_bb [6, ppad/SUP] world AABBs over SUP-prim Morton
    windows. Returns (dist, group row, a, dircode), each [M]. No brute
    fallback is needed: the while_loop refines until no unprocessed
    block's entry bound could improve any ray, whatever the vote count.

    Same nearest-first tie-order caveat as mesh_best_rows_sparse: an
    EXACT float distance tie between prims in different blocks may pick
    a different winner row than the ascending-order brute fold."""
    m = o.shape[1]
    nt = m // AN_TILE
    nsup = sup_bb.shape[1]
    bundles = tile_bundles(o, d, AN_TILE)
    from .worklist import INF
    from .pallas_trace import _safe_rcp
    tlo_all = bundle_box_entry(bundles, sup_bb)     # [nt, S]; INF = miss
    tlo_all = jnp.where(tlo_all >= INF, INF,
                        tlo_all * np.float32(1.0 - 1e-4) - np.float32(1e-4))

    # per-ray root-box exit cap over the union of real block boxes (same
    # construction as the mesh route below): rays that miss the whole
    # group stop blocking the prune
    real = jnp.all(sup_bb[0:3] <= sup_bb[3:6], axis=0)
    root_lo = jnp.min(jnp.where(real[None, :], sup_bb[0:3], INF), axis=1)
    root_hi = jnp.max(jnp.where(real[None, :], sup_bb[3:6], -INF), axis=1)
    rd = _safe_rcp(d)
    t0b = (root_lo[:, None] - o) * rd
    t1b = (root_hi[:, None] - o) * rd
    tent = jnp.maximum(jnp.max(jnp.minimum(t0b, t1b), axis=0), 0.0)
    texi = jnp.min(jnp.maximum(t0b, t1b), axis=0)
    bound = jnp.where(texi >= tent,
                      texi * np.float32(1.0001) + np.float32(1e-4),
                      np.float32(0.0))                   # [M]
    bound_blk = bound.reshape(m // 128, 128)

    o_blk = o.reshape(3, m // 128, 128)
    d_blk = d.reshape(3, m // 128, 128)
    tab = jnp.concatenate(
        [inv_r, trf_r, (pid >= 0).astype(jnp.float32)], axis=0)
    # [25, ppad] -> [nblocks, 25, SUP] so each work item DMAs one block
    tab = jnp.transpose(
        tab.reshape(25, tab.shape[1] // SUP, SUP), (1, 0, 2))

    w = min(AN_K * nt, nt * nsup)
    order_in_tile, tlo_sorted = _ranked_schedule(tlo_all)
    shp = (m // 128, 128)

    def amax_tiles(dist):
        return jnp.minimum(dist.reshape(-1), bound).reshape(
            nt, AN_TILE).max(axis=1)

    def candidates(dist, processed):
        return (~processed) & (tlo_sorted < amax_tiles(dist)[:, None])

    def cond(carry):
        dist, row, a, dircode, processed = carry
        return jnp.any(candidates(dist, processed))

    def body(carry):
        dist, row, a, dircode, processed = carry
        tid_c, bid_c, tlo_c, grid_n, executed = _budget_worklist(
            candidates(dist, processed), order_in_tile, tlo_sorted, w,
            interpret)
        d2, r2, a2, i2 = _an_fold_call(
            o_blk, d_blk, tab, tid_c, bid_c, tlo_c,
            dist, row, a, dircode, bound_blk, shape_code, grid_n,
            interpret)
        # unvisited tiles' output blocks are untouched garbage — merge
        # the carry back for them (the kernel only visits real items)
        vis = jnp.broadcast_to(
            executed.any(axis=1)[:, None], (nt, AN_TILE)).reshape(shp)
        dist = jnp.where(vis, d2, dist)
        row = jnp.where(vis, r2, row)
        a = jnp.where(vis, a2, a)
        dircode = jnp.where(vis, i2, dircode)
        return dist, row, a, dircode, processed | executed

    init = (jnp.full(shp, FLT_MAX, jnp.float32),
            jnp.full(shp, -1, jnp.int32),
            jnp.zeros(shp, jnp.float32),
            jnp.full(shp, -1, jnp.int32),
            tlo_sorted >= INF)
    dist, row, a, dircode, _ = jax.lax.while_loop(cond, body, init)
    return (dist.reshape(m), row.reshape(m), a.reshape(m),
            dircode.reshape(m))


# ---------------------------------------------------------------------------
# mesh triangles: [T, C] Moller-Trumbore, occlusion-refined worklist.
#
# Big meshes defeat pure frustum culling: a diffuse bounce bundle's cone
# reaches ~25% of a 100K-triangle mesh's chunk boxes (measured on
# mesh_hires), but each ray HITS one of the nearest one or two — the
# reference gets this from front-to-back BVH traversal with the
# current-closest prune (intersect_bv, raytracer_func.frag:344-350).
# The TPU equivalent here: per tile, process the K nearest reachable
# chunks by bundle ENTRY distance (worklist.bundle_box_entry), carry the
# per-ray best into the kernel, skip a chunk once every ray's best beats
# its entry bound, and iterate (lax.while_loop) until no unprocessed
# chunk could improve any ray. Typically 1-2 iterations; a tile whose
# rays all miss processes exactly its reachable chunks and no more.
# ---------------------------------------------------------------------------

K_OCCL = 64         # average worklist budget per tile (the global budget
                    # is K_OCCL * ntiles items — _budget_worklist); bounds
                    # only the scalar-prefetch SMEM footprint per call


def _mesh_kernel(tid_ref, bid_ref, tlo_ref,
                 o_ref, d_ref, tri_ref, ain_ref, rin_ref, bnd_ref,
                 a_ref, row_ref):
    """One (MESH_TILE-ray tile, 128-triangle chunk) work item. Rays are
    mesh-local with unit directions; fold on the local parameter `a`
    (monotone in world distance within one instance — see
    pallas_trace.mesh_best_rows). The worklist is COMPACTED and
    tile-sorted (_budget_worklist), so a tile's first step is where tid
    changes; it seeds the fold from the carried-in best (ain/rin); tiles
    with no work are never visited (the caller merges their carry back).
    A chunk body is skipped when its entry bound can no longer beat any
    ray's best — front-to-back occlusion termination (chunks arrive
    nearest-first)."""
    w = pl.program_id(0)
    bid = bid_ref[w]
    first = jnp.logical_or(
        w == 0, tid_ref[jnp.maximum(w - 1, 0)] != tid_ref[w])

    @pl.when(first)
    def _():
        a_ref[0, :] = ain_ref[0, :]
        row_ref[0, :] = rin_ref[0, :]

    # a chunk can matter only if its entry bound beats some ray's
    # min(current best, root-box exit) — bnd_ref caps rays that MISS the
    # whole mesh (their best stays FLT_MAX, but nothing can hit beyond
    # their exit from the root box)
    prune = jnp.max(jnp.minimum(a_ref[0, :], bnd_ref[0, :]))

    @pl.when((bid >= 0) & (tlo_ref[w] < prune))
    def _():
        ox, oy, oz = (o_ref[c, :][:, None] for c in range(3))
        dx, dy, dz = (d_ref[c, :][:, None] for c in range(3))
        v = [tri_ref[r, :][None, :] for r in range(9)]   # ax ay az bx..cz
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

        cmin = jnp.min(a, axis=1, keepdims=True)            # [T, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        firsti = jnp.min(jnp.where(a == cmin, iota, PRIM_CHUNK), axis=1,
                         keepdims=True)
        w_row = firsti + bid * PRIM_CHUNK
        best = a_ref[0, :][:, None]                         # [T, 1]
        take = cmin < best
        a_ref[0, :] = jnp.where(take, cmin, best)[:, 0]
        row_ref[0, :] = jnp.where(take, w_row,
                                  row_ref[0, :][:, None])[:, 0]


def _mesh_fold_call(o_rows, d_rows, tri, tid, bid, tlo, a, row, bound,
                    grid_n, interpret):
    """One Pallas fold over a compacted tile-sorted worklist, carrying
    the prior per-ray best in/out. grid_n: dynamic trip count (the real
    item count). bound: [M] per-ray root-box exit cap."""
    m = o_rows.shape[1]
    ray_spec = pl.BlockSpec((3, MESH_TILE), lambda w, t, b, q: (0, t[w]),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((9, PRIM_CHUNK),
                            lambda w, t, b, q: (0, jnp.maximum(b[w], 0)),
                            memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((1, MESH_TILE), lambda w, t, b, q: (0, t[w]),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_n,),
        in_specs=[ray_spec, ray_spec, tri_spec, io_spec, io_spec, io_spec],
        out_specs=[io_spec, io_spec],
    )
    out_shape = [jax.ShapeDtypeStruct((1, m), jnp.float32),
                 jax.ShapeDtypeStruct((1, m), jnp.int32)]
    a2, row2 = pl.pallas_call(
        _mesh_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tid, bid, tlo, o_rows, d_rows, tri,
      a.reshape(1, m), row.reshape(1, m), bound.reshape(1, m))
    return a2[0], row2[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mesh_best_rows_sparse(o, d, tri, cbb, interpret=False):
    """Occlusion-refined worklist twin of pallas_trace.mesh_best_rows.

    o, d: [3, M] MESH-LOCAL unit ray rows (M a multiple of MESH_TILE),
    tri [9, ppad] corner rows, cbb [6, >=nchunks] mesh-local chunk
    AABBs. Returns (a, row) each [M]. Winners match the brute fold:
    a chunk is only ever skipped when its conservative entry distance
    cannot beat any ray's current best (strictly-closer fold semantics),
    and the while_loop runs until no skipped chunk could.

    Caveat (documented, not defended): chunks are processed
    nearest-entry-first rather than in ascending chunk order, so an
    EXACT float tie in `a` between triangles in different chunks (shared
    edges, duplicated geometry) may pick a different winner row than the
    brute fold; the parity tests use scenes without cross-chunk ties."""
    m = o.shape[1]
    nt = m // MESH_TILE
    nchunks = tri.shape[1] // PRIM_CHUNK
    bundles = tile_bundles(o, d, MESH_TILE)
    from .worklist import INF
    tlo = bundle_box_entry(bundles, cbb[:, :nchunks])   # [nt, S]; INF=miss
    # conservative downward margin mirroring `bound`'s upward one: the
    # entry bound is computed with round-to-nearest divisions, so a hit
    # within a few ulps of the chunk entry could otherwise be pruned
    tlo = jnp.where(tlo >= INF, INF,
                    tlo * np.float32(1.0 - 1e-4) - np.float32(1e-4))
    from .pallas_trace import _safe_rcp

    # per-ray root-box exit cap: any hit's local parameter lies inside
    # the ray's slab interval against the UNION of real chunk boxes, so
    # min(best, exit) bounds what a chunk must beat — rays that miss the
    # whole mesh (best stays FLT_MAX) then stop blocking the prune
    real = cbb[0, :nchunks] <= cbb[3, :nchunks]
    root_lo = jnp.min(jnp.where(real[None, :], cbb[0:3, :nchunks], INF),
                      axis=1)
    root_hi = jnp.max(jnp.where(real[None, :], cbb[3:6, :nchunks], -INF),
                      axis=1)
    rd = _safe_rcp(d)
    t0b = (root_lo[:, None] - o) * rd
    t1b = (root_hi[:, None] - o) * rd
    tent = jnp.maximum(jnp.max(jnp.minimum(t0b, t1b), axis=0), 0.0)
    texi = jnp.min(jnp.maximum(t0b, t1b), axis=0)
    bound = jnp.where(texi >= tent,
                      texi * np.float32(1.0001) + np.float32(1e-4),
                      np.float32(0.0))                  # [M]

    w = min(K_OCCL * nt, nt * nchunks)
    order_in_tile, tlo_sorted = _ranked_schedule(tlo)

    def amax_tiles(a):
        return jnp.minimum(a, bound).reshape(nt, MESH_TILE).max(axis=1)

    def candidates(a, processed):
        return (~processed) & (tlo_sorted < amax_tiles(a)[:, None])

    def cond(carry):
        a, row, processed = carry
        return jnp.any(candidates(a, processed))

    def body(carry):
        a, row, processed = carry
        tid_c, bid_c, tlo_c, grid_n, executed = _budget_worklist(
            candidates(a, processed), order_in_tile, tlo_sorted, w,
            interpret)
        a2, row2 = _mesh_fold_call(o, d, tri, tid_c, bid_c, tlo_c,
                                   a, row, bound, grid_n, interpret)
        # unvisited tiles' output blocks are untouched garbage — merge
        # the carry back for them
        vis = jnp.broadcast_to(
            executed.any(axis=1)[:, None], (nt, MESH_TILE)).reshape(-1)
        a = jnp.where(vis, a2, a)
        row = jnp.where(vis, row2, row)
        return a, row, processed | executed

    init = (jnp.full((m,), FLT_MAX, jnp.float32),
            jnp.full((m,), -1, jnp.int32),
            tlo_sorted >= INF)
    a, row, _ = jax.lax.while_loop(cond, body, init)
    return a, row
