"""Block-sparse trace worklists: decide per (ray tile, primitive block)
OUTSIDE the kernel, then run only the pairs that can intersect.

The round-2 kernels culled with in-kernel tile votes (`@pl.when(
jnp.any(boxhit))` per chunk): every chunk paid its slab test + vote in
every tile, votes were per-1024-ray tiles (too coarse — measured 27/32
chunks activated even for sorted secondary rays), and the predicated
regions multiplied Mosaic compile time (145-245 s). This module replaces
the scheme with the TPU-idiomatic block-sparse pattern (the same shape
as block-sparse attention / MoE dispatch):

1. Per ray tile, compute a conservative BUNDLE: componentwise origin
   interval [olo, ohi] and direction interval [dlo, dhi].
2. Test every bundle against every primitive-block AABB with interval
   arithmetic (exists t >= 0 with o + t*d inside the box on all three
   axes simultaneously-per-axis) — a dense [ntiles, nblocks] boolean,
   trivially cheap in XLA (tens of ops per pair).
3. Flatten the votes (with a per-tile sentinel column so every tile is
   visited at least once) into a worklist of (tile_id, block_id) pairs,
   sorted by tile, padded to a static budget.
4. A Pallas kernel with grid=(Wmax,) and scalar-prefetched ids runs
   exactly those pairs; its output block is indexed by tile_id and
   revisited consecutively, initialized on tile change.

Conservativeness: the bundle contains every ray of the tile and the
interval test accepts whenever any contained ray's slab test could,
so the worklist is a superset of the per-ray chunk hits — winners are
identical to the brute fold. If the votes exceed the static budget
(incoherent wavefront and no sorting), the caller falls back to the
brute kernel via lax.cond, trading speed for correctness.

The reference mechanism replaced: the per-ray BVH stack walk
(shaders/raytracer_func.frag:734-769) — here the "traversal" is the
dense XLA vote phase and the "stack" is the worklist.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

INF = np.float32(3e38)


def tile_bundles(o_rows, d_rows, tile: int):
    """Per-tile componentwise ray bundles.

    o_rows, d_rows: [3, M] ray rows (M a multiple of `tile`). Returns
    (olo, ohi, dlo, dhi), each [3, ntiles]."""
    m = o_rows.shape[1]
    nt = m // tile
    ot = o_rows.reshape(3, nt, tile)
    dt = d_rows.reshape(3, nt, tile)
    return (ot.min(axis=2), ot.max(axis=2), dt.min(axis=2), dt.max(axis=2))


def _cond_interval(a, b):
    """Feasible t >= 0 interval of a*t <= b (a, b broadcastable arrays):
    returns (lo, hi); empty encoded as lo > hi."""
    pos = a > 0
    neg = a < 0
    zer = ~(pos | neg)
    ratio = b / jnp.where(zer, np.float32(1.0), a)
    lo = jnp.where(neg, jnp.maximum(ratio, 0.0), np.float32(0.0))
    hi = jnp.where(pos, ratio, INF)
    # a == 0: all t if b >= 0 else empty
    hi = jnp.where(zer & (b < 0), np.float32(-1.0), hi)
    return lo, hi


def bundle_box_entry(bundles, boxes):
    """Like bundle_box_votes, but returns the conservative ENTRY distance
    t_lo [ntiles, S] of each bundle into each box — INF where the bundle
    cannot reach the box. t_lo lower-bounds every contained ray's slab
    entry, so `t_lo >= max(best)` proves a box cannot improve any ray's
    strictly-closer winner (the occlusion prune of the iterative mesh
    trace, sparse_trace.mesh_best_rows_occl). Degenerate (padding)
    boxes with min > max are forced to INF explicitly — the interval
    test alone can admit them for wide bundles whose origin interval
    spans the sentinel coordinates."""
    olo, ohi, dlo, dhi = bundles
    t_lo = jnp.zeros((olo.shape[1], boxes.shape[1]), jnp.float32)
    t_hi = jnp.full_like(t_lo, INF)
    for c in range(3):
        blo = boxes[c][None, :]
        bhi = boxes[3 + c][None, :]
        lo1, hi1 = _cond_interval(dlo[c][:, None], bhi - olo[c][:, None])
        lo2, hi2 = _cond_interval(-dhi[c][:, None], ohi[c][:, None] - blo)
        t_lo = jnp.maximum(t_lo, jnp.maximum(lo1, lo2))
        t_hi = jnp.minimum(t_hi, jnp.minimum(hi1, hi2))
    real = jnp.all(boxes[0:3] <= boxes[3:6], axis=0)[None, :]
    return jnp.where((t_hi >= t_lo) & real, t_lo, INF)


def bundle_box_votes(bundles, boxes):
    """Conservative bundle-vs-AABB test.

    bundles: (olo, ohi, dlo, dhi) each [3, ntiles];
    boxes: [6, S] (rows 0-2 min, 3-5 max; empty boxes min > max never
    vote). Returns votes [ntiles, S] bool.

    Per axis c, a contained ray's position interval at t >= 0 is
    [olo_c + t*dlo_c, ohi_c + t*dhi_c]; it can overlap [blo_c, bhi_c]
    iff  dlo_c * t <= bhi_c - olo_c  AND  -dhi_c * t <= ohi_c - blo_c.
    Intersect the six per-condition t-intervals; non-empty => vote.
    Degenerate boxes (min > max: block padding) are masked explicitly:
    the sentinel coordinates alone don't reject a bundle whose origin
    interval spans them (wide/incoherent tiles), and spurious votes
    burn worklist budget and can force the brute fallback."""
    olo, ohi, dlo, dhi = bundles
    t_lo = jnp.zeros((olo.shape[1], boxes.shape[1]), jnp.float32)
    t_hi = jnp.full_like(t_lo, INF)
    for c in range(3):
        blo = boxes[c][None, :]          # [1, S]
        bhi = boxes[3 + c][None, :]
        lo1, hi1 = _cond_interval(dlo[c][:, None], bhi - olo[c][:, None])
        lo2, hi2 = _cond_interval(-dhi[c][:, None], ohi[c][:, None] - blo)
        t_lo = jnp.maximum(t_lo, jnp.maximum(lo1, lo2))
        t_hi = jnp.minimum(t_hi, jnp.minimum(hi1, hi2))
    real = jnp.all(boxes[0:3] <= boxes[3:6], axis=0)[None, :]
    return (t_hi >= t_lo) & real


def build_worklist(votes, budget: int):
    """Flatten votes into a tile-sorted worklist.

    votes: [ntiles, S] bool. Returns (tile_id, block_id, n, overflow):
    tile_id/block_id [Wmax] i32 with Wmax = ntiles * budget (statically),
    block_id == -1 for the per-tile sentinel entries (every tile has
    one, so every output block gets initialized) and for tail padding;
    n: the REAL worklist length (sentinels + votes) — kernels run a
    dynamic grid of exactly n steps, so the static budget costs nothing
    beyond SMEM; overflow: true when n exceeded Wmax (caller must fall
    back to the brute kernel)."""
    nt, s = votes.shape
    wmax = nt * budget
    full = jnp.concatenate(
        [jnp.ones((nt, 1), bool), votes], axis=1)      # sentinel col 0
    flat = full.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))            # includes sentinels
    # Compaction via argsort, not jnp.nonzero: XLA lowers nonzero to a
    # 1D cumsum that costs MILLISECONDS on TPU for tens-of-K elements,
    # while the hardware sort is ~0.03 ms at 250K. Voted entries keep
    # their flat index (ascending = tile-sorted), unvoted sort after
    # every voted one; the tail past `count` is rewritten to the LAST
    # tile's sentinel so tile ids stay monotone even when a static grid
    # (interpret mode) runs the padding.
    l = flat.shape[0]
    iota = jnp.arange(l, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(flat, iota, iota + l))
    fill = (nt - 1) * (s + 1)
    take = min(wmax, l)
    order_p = jnp.full((wmax,), fill, jnp.int32).at[:take].set(order[:take])
    idx = jnp.where(jnp.arange(wmax, dtype=jnp.int32) < count, order_p, fill)
    tile_id = (idx // (s + 1)).astype(jnp.int32)
    block_id = (idx % (s + 1)).astype(jnp.int32) - 1
    return tile_id, block_id, jnp.minimum(count, wmax), count > wmax
