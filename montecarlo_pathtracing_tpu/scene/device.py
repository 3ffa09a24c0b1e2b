"""Scene compile: host ScenePrimitives -> device pytree of arrays.

The TPU replacement for BVH_GPU_Scene::finalize (bvh_gpu/gpu_bvh_scene.cpp:
121-187). Instead of serializing PrimData records into RGBA32F textures, the
scene becomes a pytree of dense arrays:

  - per-prim tables indexed by global primitive id (after the reference's
    emissives-first sort, scene.cpp:70-88): color [N,4], mat [N,4]
    (shininess, roughness, emissivity, area), transfo / inv_transfo /
    mesh_transfo [N,4,4]
  - per-shape-type homogeneous groups (transfo/inv/prim-id, padded to a
    chunk multiple) so each intersector kernel is branch-free — the TPU
    answer to SIMT divergence over the type switch (intersect_prim,
    raytracer_func.frag:690-704)
  - per-mesh-instance pre-gathered triangle corner/normal arrays (padded
    with degenerate triangles), replacing tex_tri_/tex_p_/tex_n_
  - Morton-ordered chunk/super AABB tables per group and per mesh — the
    acceleration structure the trace paths actually consume (frontier
    culling + occlusion-ordered worklists, ops/worklist.py /
    ops/sparse_trace.py). The reference's heap BVH (exact bvh.cpp:34-93
    format) still exists for parity/debugging but is built on demand by
    models/debug_views.scene_bvh, not carried here

Static metadata (group codes, offsets, counts) lives in meta fields so the
whole thing jits cleanly; `color` and `mat` are the differentiable leaves
for the inverse-rendering path.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .scene import (
    ScenePrimitives, CODE_MESH, CODE_SPHERE, CODE_CUBE, CODE_CYLINDER,
    CODE_CONE, CODE_ORIENTED_QUAD,
)

F32 = np.float32

ANALYTIC_CODES = (CODE_SPHERE, CODE_CUBE, CODE_CYLINDER, CODE_CONE,
                  CODE_ORIENTED_QUAD)

TRI_SUPER = 16    # leaf chunks per super-chunk (16 x 128 = 2048 tris)
GROUP_SUP = 8     # prims per analytic worklist block (sparse_trace.SUP)
# Scenes whose analytic total exceeds ANA_SCENE_MIN (the megakernel's
# SMEM prim-table cap) move every group above ANA_GROUP_MIN prims into
# the chunked HBM pool consumed by the fused kernel's large-group walk
# (models/bounce_kernel.py); the small remainder keeps the SMEM table.
ANA_SCENE_MIN = 4096
ANA_GROUP_MIN = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _morton3(center, lo, hi) -> int:
    """30-bit Morton code of a point within the scene bounds."""
    span = np.maximum(hi - lo, 1e-12)
    q = np.clip((center - lo) / span, 0.0, 1.0)
    q = (q * 1023.0).astype(np.int64)

    def spread(x):
        x &= 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return int(spread(q[0]) | (spread(q[1]) << 1) | (spread(q[2]) << 2))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceScene:
    # --- per-prim tables (global prim id) ---
    color: jnp.ndarray          # [N,4] f32 (differentiable)
    mat: jnp.ndarray            # [N,4] f32 (differentiable)
    transfo: jnp.ndarray        # [N,4,4]
    inv_transfo: jnp.ndarray    # [N,4,4]
    mesh_transfo: jnp.ndarray   # [N,4,4]
    # --- typed analytic groups (tuple aligned with group_codes) ---
    group_transfo: Tuple[jnp.ndarray, ...]   # each [P,4,4]
    group_inv: Tuple[jnp.ndarray, ...]       # each [P,4,4]
    group_prim: Tuple[jnp.ndarray, ...]      # each [P] i32, -1 pad
    group_chunk_bb: Tuple[jnp.ndarray, ...]  # each [6, n_kernel_chunks]
    # world AABBs over GROUP_SUP-prim Morton windows — the vote
    # granularity of the block-sparse worklist kernels (ops/worklist.py,
    # ops/sparse_trace.py); padding windows get empty boxes
    group_super_bb: Tuple[jnp.ndarray, ...]  # each [6, P/GROUP_SUP]
    # --- mesh triangle pools (concatenated across instances) ---
    tri_va: jnp.ndarray         # [T,3] mesh-local corner A
    tri_vb: jnp.ndarray
    tri_vc: jnp.ndarray
    tri_na: jnp.ndarray         # [T,3] vertex normals
    tri_nb: jnp.ndarray
    tri_nc: jnp.ndarray
    # row-major twins of the corner/normal pools: [9, T] (ax ay az bx ..
    # cz). TPU gathers are ~400x faster in row form — take([K,M], idx,
    # axis=1) moves K*4 contiguous bytes per index, while K separate 1-D
    # takes pay a random 4-byte access each (ops/shading.py mesh branch)
    tri_pos_rows: jnp.ndarray   # [9, T]
    tri_norm_rows: jnp.ndarray  # [9, T]
    # per-mesh-instance chunk AABBs (mesh-LOCAL space, one [6, n_chunks]
    # per instance at the kernel's 128-triangle granularity, padded to a
    # TRI_SUPER multiple with empty boxes) — the leaf level of the
    # per-mesh acceleration structure (Mesh_intersect analog)
    mesh_chunk_bb: Tuple[jnp.ndarray, ...]
    # super-chunk AABBs (one box per TRI_SUPER=16 chunks = 2048 Morton-
    # adjacent triangles) — the inner level: a ray tile that misses a
    # super skips all 16 leaf box tests and bodies
    mesh_super_bb: Tuple[jnp.ndarray, ...]
    # chunk-major triangle pool for the fused per-bounce kernel
    # (models/bounce_kernel.py): one [18, 128] block per 128-triangle
    # kernel chunk (rows 0-8 corner components ax ay az bx .. cz, rows
    # 9-17 vertex-normal components), concatenated across instances at
    # each instance's nkc_pad chunk count (= mesh_chunk_bb[i].shape[1]).
    # Lives in HBM; the kernel DMAs one block per visited chunk.
    tri_chunks: jnp.ndarray     # [C_total, 18, 128]
    # chunk-major ANALYTIC pool for the fused kernel's large-group walk:
    # one [32, 128] block per 128-prim Morton chunk of every group with
    # more than ANA_CHUNK_MIN prims (rows 0-11 inverse affine, 12-23
    # forward affine, 24 shin, 25 rough, 26 emis, 27-30 rgba, 31 ok
    # flag), concatenated across groups; chunk/super world AABBs at the
    # same granularity. This is what removes the megakernel's SMEM-cap
    # cliff: scenes beyond it stream prim chunks from HBM on
    # demand, bounded by HBM size like the reference's ~2^27-prim BVH
    # (shaders/raytracer_func.frag:644,736).
    ana_chunks: jnp.ndarray     # [Ca_total, 32, 128]
    ana_chunk_bb: jnp.ndarray   # [6, Ca_total] world AABBs (empty=pad)
    ana_super_bb: jnp.ndarray   # [6, Ca_total/16]
    # per-prim world AABBs (prim_bb x1.005 padding, scene.cpp:18-42) —
    # the megakernel's per-prim frontier culling reads these
    prim_bb_min: jnp.ndarray    # [N,3]
    prim_bb_max: jnp.ndarray    # [N,3]
    # --- static metadata ---
    # ((code, chunk_start, n_chunks, super_start), ...) aligned with the
    # group_codes entries whose groups exceed ANA_CHUNK_MIN — the static
    # walk plan for ana_chunks; () when no group is that large
    ana_groups: Tuple[Tuple[int, int, int, int], ...] = dataclasses.field(
        metadata=dict(static=True))
    group_codes: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    group_chunk: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    mesh_prim_index: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    mesh_tri_offset: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    mesh_tri_padded: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    tri_chunk: int = dataclasses.field(metadata=dict(static=True))
    nb_prims: int = dataclasses.field(metadata=dict(static=True))
    nb_emissives: int = dataclasses.field(metadata=dict(static=True))
    flat_face: bool = dataclasses.field(metadata=dict(static=True))
    has_transparent: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def nb_meshes(self) -> int:
        return len(self.mesh_prim_index)


def compile_scene(scene: ScenePrimitives, *, analytic_chunk: int = 64,
                  tri_chunk: int = 256,
                  flat_face: bool = False) -> DeviceScene:
    """finalize() analog: emissive sort -> BVH build -> dense device arrays."""
    nb_emissives = scene.sort_emissive_first()
    n = scene.nb
    if n == 0:
        raise ValueError("empty scene")

    color = np.stack([p.color for p in scene.prims]).astype(F32)
    mat = np.stack([p.mat for p in scene.prims]).astype(F32)
    transfo = np.stack([p.transfo for p in scene.prims]).astype(F32)
    inv_transfo = np.stack([p.inv_transfo for p in scene.prims]).astype(F32)
    mesh_transfo = np.stack([p.mesh_transfo for p in scene.prims]).astype(F32)

    # world AABBs (prim_bb padding x1.005, scene.cpp:18-42); the heap
    # BVH itself is built on demand by the debug views only
    # (models/debug_views.scene_bvh) — no trace path consumes it, the
    # frontier culls use the Morton chunk/super boxes below instead
    centers, bbmin, bbmax = scene.all_prim_bbs()

    # typed analytic groups. Prims inside a group are MORTON-ORDERED by
    # world-AABB center so that contiguous kernel chunks are spatially
    # coherent — the per-chunk AABBs below then cull effectively (the TPU
    # answer to BVH traversal: chunk-level frontier culling instead of a
    # divergent per-ray stack walk).
    group_codes, g_trf, g_inv, g_prim, g_chunk, g_cbb = [], [], [], [], [], []
    g_sbb = []
    ana_meta, ana_pool, ana_cbb_l, ana_sbb_l = [], [], [], []
    ana_coff = ana_soff = 0
    # mega-eligibility (models/megakernel.mega_eligible) sums PADDED
    # group sizes against the SMEM cap; use the same padded total here
    # so no scene falls between the SMEM table and the chunk pools
    # (a 4096-prim scene pads past 4096 and must get pools)
    _counts = {}
    for p in scene.prims:
        if p.type != CODE_MESH:
            _counts[p.type] = _counts.get(p.type, 0) + 1
    total_analytic = sum(
        _round_up(c, min(analytic_chunk, _round_up(c, 8)))
        for c in _counts.values())
    for code in ANALYTIC_CODES:
        idx = [i for i, p in enumerate(scene.prims) if p.type == code]
        if not idx:
            continue
        idx = sorted(idx, key=lambda i: _morton3(centers[i], bbmin.min(0),
                                                 bbmax.max(0)))
        chunk = min(analytic_chunk, _round_up(len(idx), 8))
        pad = _round_up(len(idx), chunk)
        trf = np.zeros((pad, 4, 4), F32)
        inv = np.zeros((pad, 4, 4), F32)
        trf[:] = np.eye(4, dtype=F32)
        inv[:] = np.eye(4, dtype=F32)
        pid = np.full(pad, -1, np.int32)
        for k, i in enumerate(idx):
            trf[k] = scene.prims[i].transfo
            inv[k] = scene.prims[i].inv_transfo
            pid[k] = i
        # per-PRIM_CHUNK world AABBs (kernel culling granularity, 128)
        kchunk = 128
        kpad = _round_up(pad, kchunk)
        nkc = kpad // kchunk
        cbb = np.zeros((6, nkc), F32)
        for c in range(nkc):
            ids = [i for i in idx[c * kchunk:(c + 1) * kchunk]]
            if ids:
                cbb[0:3, c] = bbmin[ids].min(axis=0)
                cbb[3:6, c] = bbmax[ids].max(axis=0)
            else:   # padding-only chunk: empty box that nothing hits
                cbb[0:3, c] = 1.0
                cbb[3:6, c] = -1.0
        # world AABBs over GROUP_SUP-prim Morton windows at the kernel
        # padding (pad_group pads to PRIM_CHUNK=128, a GROUP_SUP multiple)
        spad = _round_up(pad, 128)
        nsb = spad // GROUP_SUP
        sbbg = np.zeros((6, nsb), F32)
        for sc in range(nsb):
            ids = idx[sc * GROUP_SUP:(sc + 1) * GROUP_SUP]
            if ids:
                sbbg[0:3, sc] = bbmin[ids].min(axis=0)
                sbbg[3:6, sc] = bbmax[ids].max(axis=0)
            else:       # padding-only window: empty box
                sbbg[0:3, sc] = 1.0
                sbbg[3:6, sc] = -1.0
        group_codes.append(code)
        g_trf.append(jnp.asarray(trf))
        g_inv.append(jnp.asarray(inv))
        g_prim.append(jnp.asarray(pid))
        g_chunk.append(chunk)
        g_cbb.append(jnp.asarray(cbb))
        g_sbb.append(jnp.asarray(sbbg))

        if total_analytic > ANA_SCENE_MIN and len(idx) > ANA_GROUP_MIN:  # noqa: E501 (padded totals, see above)
            # chunk-major pool blocks for the fused kernel's large-group
            # walk: [nkc16, 32, 128] per-prim scalar rows (zeros = pad
            # prims whose ok flag row stays 0), chunk/super world boxes
            # padded to TRI_SUPER-multiples with empty boxes
            nkc16 = _round_up(nkc, TRI_SUPER)
            rows = np.zeros((nkc16 * kchunk, 32), F32)
            ni = len(idx)
            rows[:ni, 0:12] = inv[:ni, :3, :4].reshape(ni, 12)
            rows[:ni, 12:24] = trf[:ni, :3, :4].reshape(ni, 12)
            rows[:ni, 24:27] = mat[idx, 0:3]
            rows[:ni, 27:31] = color[idx]
            rows[:ni, 31] = 1.0
            acbb = np.concatenate(
                [cbb, np.tile([[1.0]] * 3 + [[-1.0]] * 3,
                              (1, nkc16 - nkc)).astype(F32)], axis=1)
            asbb = np.zeros((6, nkc16 // TRI_SUPER), F32)
            for sc in range(nkc16 // TRI_SUPER):
                real = [c for c in range(sc * TRI_SUPER,
                                         min((sc + 1) * TRI_SUPER, nkc))]
                if real:
                    asbb[0:3, sc] = acbb[0:3, real].min(axis=1)
                    asbb[3:6, sc] = acbb[3:6, real].max(axis=1)
                else:
                    asbb[0:3, sc] = 1.0
                    asbb[3:6, sc] = -1.0
            ana_meta.append(
                (int(code), ana_coff, nkc16, ana_soff))
            ana_pool.append(
                rows.reshape(nkc16, kchunk, 32).transpose(0, 2, 1))
            ana_cbb_l.append(acbb)
            ana_sbb_l.append(asbb)
            ana_coff += nkc16
            ana_soff += nkc16 // TRI_SUPER

    # mesh instances: pre-gather triangle corners/normals in mesh-local
    # space, MORTON-ORDERED by centroid so contiguous 128-triangle kernel
    # chunks are spatially coherent; per-chunk mesh-local AABBs then give
    # the triangle kernel its frontier culling (the TPU-native per-mesh
    # BVH — Mesh_intersect / gpu_bvh_scene.cpp:51-118 analog).
    mesh_prim_index, mesh_tri_offset, mesh_tri_padded = [], [], []
    va_l, vb_l, vc_l, na_l, nb_l, nc_l = [], [], [], [], [], []
    mesh_cbb, mesh_sbb = [], []
    tri_chunks_l = []
    offset = 0
    for i, p in enumerate(scene.prims):
        if p.type != CODE_MESH:
            continue
        geom = scene.meshes[p.mesh_id]
        t = geom.triangles
        ntris = t.shape[0]
        cent = (geom.vertices[t[:, 0]] + geom.vertices[t[:, 1]]
                + geom.vertices[t[:, 2]]) / 3.0
        lo, hi = cent.min(axis=0), cent.max(axis=0)
        order = sorted(range(ntris), key=lambda k: _morton3(cent[k], lo, hi))
        t = t[order]
        chunk = min(tri_chunk, _round_up(ntris, 8))
        pad = _round_up(ntris, chunk)
        va = np.zeros((pad, 3), F32)
        vb = np.zeros((pad, 3), F32)
        vc = np.zeros((pad, 3), F32)
        na = np.zeros((pad, 3), F32)
        nb_ = np.zeros((pad, 3), F32)
        nc = np.zeros((pad, 3), F32)
        va[:ntris] = geom.vertices[t[:, 0]]
        vb[:ntris] = geom.vertices[t[:, 1]]
        vc[:ntris] = geom.vertices[t[:, 2]]
        na[:ntris] = geom.normals[t[:, 0]]
        nb_[:ntris] = geom.normals[t[:, 1]]
        nc[:ntris] = geom.normals[t[:, 2]]
        # chunk AABBs at the kernel granularity (pad_tris rounds the pool
        # slice up to 128-lane chunks). The leaf table is padded to a
        # TRI_SUPER multiple with EMPTY boxes so the kernel's two-level
        # loop needs no edge handling; super boxes union their real
        # chunks' boxes.
        kchunk = 128
        nkc = _round_up(pad, kchunk) // kchunk
        nkc_pad = _round_up(nkc, TRI_SUPER)
        cbb = np.zeros((6, nkc_pad), F32)
        for c in range(nkc_pad):
            s, e = c * kchunk, min((c + 1) * kchunk, ntris)
            if s < ntris:
                corners = np.concatenate([va[s:e], vb[s:e], vc[s:e]])
                cbb[0:3, c] = corners.min(axis=0)
                cbb[3:6, c] = corners.max(axis=0)
            else:   # padding-only chunk: empty box that nothing enters
                cbb[0:3, c] = 1.0
                cbb[3:6, c] = -1.0
        nsuper = nkc_pad // TRI_SUPER
        sbb = np.zeros((6, nsuper), F32)
        for sc in range(nsuper):
            lo, hi = sc * TRI_SUPER, (sc + 1) * TRI_SUPER
            real = [c for c in range(lo, min(hi, nkc))
                    if c * kchunk < ntris]
            if real:
                sbb[0:3, sc] = cbb[0:3, real].min(axis=1)
                sbb[3:6, sc] = cbb[3:6, real].max(axis=1)
            else:
                sbb[0:3, sc] = 1.0
                sbb[3:6, sc] = -1.0
        mesh_prim_index.append(i)
        mesh_tri_offset.append(offset)
        mesh_tri_padded.append(pad)
        mesh_cbb.append(jnp.asarray(cbb))
        mesh_sbb.append(jnp.asarray(sbb))
        # chunk-major [nkc_pad, 18, 128] block pool for the fused
        # bounce kernel (zeros = degenerate triangles that never hit)
        tri18 = np.zeros((nkc_pad * kchunk, 18), F32)
        tri18[:ntris] = np.concatenate(
            [va[:ntris], vb[:ntris], vc[:ntris],
             na[:ntris], nb_[:ntris], nc[:ntris]], axis=1)
        tri_chunks_l.append(
            tri18.reshape(nkc_pad, kchunk, 18).transpose(0, 2, 1))
        va_l.append(va); vb_l.append(vb); vc_l.append(vc)
        na_l.append(na); nb_l.append(nb_); nc_l.append(nc)
        offset += pad

    def cat(parts):
        if not parts:
            return jnp.zeros((0, 3), jnp.float32)
        return jnp.asarray(np.concatenate(parts, axis=0))

    def rows9(a_parts, b_parts, c_parts):
        """[T,3] pools -> [9, T] rows (ax ay az bx .. cz)."""
        if not a_parts:
            return jnp.zeros((9, 0), jnp.float32)
        a = np.concatenate(a_parts, axis=0)
        b = np.concatenate(b_parts, axis=0)
        c = np.concatenate(c_parts, axis=0)
        return jnp.asarray(np.concatenate([a.T, b.T, c.T], axis=0))

    has_transparent = bool(np.any(color[:, 3] < 1.0))

    return DeviceScene(
        color=jnp.asarray(color),
        mat=jnp.asarray(mat),
        transfo=jnp.asarray(transfo),
        inv_transfo=jnp.asarray(inv_transfo),
        mesh_transfo=jnp.asarray(mesh_transfo),
        group_transfo=tuple(g_trf),
        group_inv=tuple(g_inv),
        group_prim=tuple(g_prim),
        group_chunk_bb=tuple(g_cbb),
        group_super_bb=tuple(g_sbb),
        tri_va=cat(va_l), tri_vb=cat(vb_l), tri_vc=cat(vc_l),
        tri_na=cat(na_l), tri_nb=cat(nb_l), tri_nc=cat(nc_l),
        tri_pos_rows=rows9(va_l, vb_l, vc_l),
        tri_norm_rows=rows9(na_l, nb_l, nc_l),
        mesh_chunk_bb=tuple(mesh_cbb),
        mesh_super_bb=tuple(mesh_sbb),
        tri_chunks=(jnp.asarray(np.concatenate(tri_chunks_l, axis=0))
                    if tri_chunks_l else jnp.zeros((0, 18, 128), jnp.float32)),
        ana_chunks=(jnp.asarray(np.concatenate(ana_pool, axis=0))
                    if ana_pool else jnp.zeros((0, 32, 128), jnp.float32)),
        ana_chunk_bb=(jnp.asarray(np.concatenate(ana_cbb_l, axis=1))
                      if ana_cbb_l else jnp.zeros((6, 0), jnp.float32)),
        ana_super_bb=(jnp.asarray(np.concatenate(ana_sbb_l, axis=1))
                      if ana_sbb_l else jnp.zeros((6, 0), jnp.float32)),
        ana_groups=tuple(ana_meta),
        prim_bb_min=jnp.asarray(bbmin.astype(F32)),
        prim_bb_max=jnp.asarray(bbmax.astype(F32)),
        group_codes=tuple(group_codes),
        group_chunk=tuple(g_chunk),
        mesh_prim_index=tuple(mesh_prim_index),
        mesh_tri_offset=tuple(mesh_tri_offset),
        mesh_tri_padded=tuple(mesh_tri_padded),
        tri_chunk=tri_chunk,
        nb_prims=n,
        nb_emissives=nb_emissives,
        flat_face=flat_face,
        has_transparent=has_transparent,
    )
