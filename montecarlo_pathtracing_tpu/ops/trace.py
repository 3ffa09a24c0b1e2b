"""Scene-level trace: fold every primitive group into a closest Hit.

The TPU-native replacement for traverse_all_bvh / intersect_bvh
(shaders/raytracer_func.frag:731-781). Instead of a per-thread stack walk
over the BVH heap — pure divergence on a lockstep vector machine — the
dense path intersects every ray against every primitive, grouped by type so
each shape test is branch-free, with transforms applied as batched einsums
(MXU work) and chunks folded by a running arg-min. For the scenes the
reference ships (9 .. ~1100 prims) this is bandwidth-friendly and beats a
scalarized stack walk on TPU; the Pallas traversal kernel (ops/pallas_trace)
takes over when scenes grow.

Tie-breaking: a candidate replaces the best hit only if strictly closer in
WORLD distance (the GLSL compares `dist < closest.dist` per intersector);
fold order is group-by-type then chunk-ascending, first-lowest-index within
a chunk. The CPU oracle (testing/cpu_ref.py) uses the identical rule so
framework-vs-oracle parity is exact.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import intersect
from .intersect import Hit, miss_hit, trace_analytic_group, trace_mesh_instance


def trace(scene, O, D, *, use_pallas: bool = False,
          pallas_interpret: bool = False) -> Hit:
    """Closest hit of world rays O, D: [N,3] against the whole scene.

    use_pallas routes the analytic groups through the fused VMEM kernel
    (ops/pallas_trace.py) — same winners, ~no HBM intermediates; the
    dense XLA path remains the default and the reference semantics.
    """
    best = miss_hit(O.shape[:-1])
    if use_pallas:
        from .pallas_trace import trace_analytic_group_pallas, PRIM_CHUNK
    for gi, code in enumerate(scene.group_codes):
        # the fused kernel pads groups to PRIM_CHUNK lanes — a win only
        # when the group actually fills them (measured: 6x faster on the
        # 895-prim colonnes scene, slower on the 9-prim box)
        if use_pallas and scene.group_prim[gi].shape[0] >= PRIM_CHUNK:
            best = trace_analytic_group_pallas(
                best, O, D, code,
                scene.group_transfo[gi], scene.group_inv[gi],
                scene.group_prim[gi], interpret=pallas_interpret,
            )
            continue
        best = trace_analytic_group(
            best, O, D, code,
            scene.group_transfo[gi], scene.group_inv[gi],
            scene.group_prim[gi], scene.group_chunk[gi],
        )
    if use_pallas and scene.mesh_prim_index:
        from .pallas_trace import trace_mesh_instance_pallas
    for mi, prim_index in enumerate(scene.mesh_prim_index):
        off = scene.mesh_tri_offset[mi]
        cnt = scene.mesh_tri_padded[mi]
        if use_pallas:
            best = trace_mesh_instance_pallas(
                best, O, D,
                scene.inv_transfo[prim_index],
                scene.mesh_transfo[prim_index], prim_index,
                scene.tri_va[off:off + cnt], scene.tri_vb[off:off + cnt],
                scene.tri_vc[off:off + cnt],
                tri_offset=off, interpret=pallas_interpret,
            )
            continue
        chunk = min(scene.tri_chunk, cnt)
        best = trace_mesh_instance(
            best, O, D,
            scene.inv_transfo[prim_index], scene.mesh_transfo[prim_index],
            prim_index,
            scene.tri_va[off:off + cnt], scene.tri_vb[off:off + cnt],
            scene.tri_vc[off:off + cnt],
            tri_offset=off, chunk=chunk,
        )
    return best


def hit_any(scene, O, D):
    """Occlusion query (just_hit_bvh analog): True where any prim is hit."""
    return trace(scene, O, D).shape >= 0
