"""Shading-normal reconstruction (intersection_info).

Reimplements the per-shape *_inter_geom_info dispatch
(shaders/raytracer_func.frag:783-897) as one masked dense computation: every
shape's normal formula is evaluated from the Hit record and selected by the
type code. The reference's construction is kept literally:

    N = normalize( (transfo * (pl + No_local)).xyz - Pg )

i.e. the local offset No is pushed through the prim's affine transform by
point-differencing (NOT the inverse-transpose normal matrix) — for
non-uniform scales this is the reference's behavior, so it is the spec.

Quirks preserved:
  - cone face code 1 (top "cap") yields N = vec3(0) (raytracer_func.frag:852)
  - mesh smooth normals are area-weighted barycentric blends of vertex
    normals; flat normals use cross(B-A, C-A) (:795-809); selected by the
    static flat_face flag (the reference's uniform is never set by the app,
    so GLSL default false = smooth is our default too)
  - on a miss (shape < 0) the previous N, P are kept — the GLSL leaves its
    `out` variables unwritten, which matters for the refraction inner
    re-trace (tp/montecarlo.frag:150-152)
"""
from __future__ import annotations

import jax.numpy as jnp

from .intersect import (
    Hit, CODE_MESH, CODE_SPHERE, CODE_CUBE, CODE_CYLINDER, CODE_CONE,
    CODE_ORIENTED_QUAD,
)
from ..utils.transforms import normalize, transform_point


def _axis_offset(dircode, sign_from_parity=True):
    """No for cube faces: unit vector along axis dir/2, sign from dir%2
    (raytracer_func.frag:820-827)."""
    ax = dircode // 2
    sg = jnp.where(dircode % 2 != 0, 1.0, -1.0)
    no = jnp.zeros(dircode.shape + (3,), jnp.float32)
    for c in range(3):
        no = no.at[..., c].set(jnp.where(ax == c, sg, 0.0))
    return no


def intersection_info(scene, hit: Hit, prev_n=None, prev_p=None):
    """Returns (N [*,3], P [*,3]) world shading normal and hit point.

    prev_n/prev_p: values to keep where hit.shape < 0 (stale-output GLSL
    semantics); default zero-vectors.
    """
    prim = jnp.clip(hit.prim, 0, scene.nb_prims - 1)
    trf = jnp.take(scene.transfo, prim, axis=0)          # [*,4,4]
    pl = hit.pl
    pg = hit.pg

    # --- analytic local offsets -----------------------------------------
    no_cube = _axis_offset(hit.dircode)
    # cylinder: caps -> +-z by dir%2; side -> (pl.xy, 0)
    cap = hit.dircode < 2
    no_cyl = jnp.where(
        cap[..., None],
        jnp.stack([jnp.zeros_like(pl[..., 0]), jnp.zeros_like(pl[..., 0]),
                   jnp.where(hit.dircode % 2 != 0, 1.0, -1.0)], -1),
        jnp.stack([pl[..., 0], pl[..., 1], jnp.zeros_like(pl[..., 0])], -1),
    )
    # cone: dir 0 bottom cap -> pl + (0,0,-1); dir 2 side -> (pl.xy, len/2)
    rxy = jnp.sqrt(pl[..., 0] ** 2 + pl[..., 1] ** 2)
    no_cone = jnp.where(
        (hit.dircode == 0)[..., None],
        jnp.stack([jnp.zeros_like(rxy), jnp.zeros_like(rxy),
                   jnp.full_like(rxy, -1.0)], -1),
        jnp.stack([pl[..., 0], pl[..., 1], rxy / 2.0], -1),
    )
    no_quad = jnp.stack([jnp.zeros_like(pl[..., 0]),
                         jnp.zeros_like(pl[..., 0]),
                         jnp.ones_like(pl[..., 0])], -1)

    shape = hit.shape
    # sphere uses trf*(2*pl) - Pg; the others use trf*(pl + No) - Pg
    point = jnp.where(
        (shape == CODE_SPHERE)[..., None], 2.0 * pl,
        pl + jnp.where(
            (shape == CODE_CUBE)[..., None], no_cube,
            jnp.where(
                (shape == CODE_CYLINDER)[..., None], no_cyl,
                jnp.where((shape == CODE_CONE)[..., None], no_cone, no_quad),
            ),
        ),
    )
    n_analytic = normalize(transform_point(trf, point) - pg)
    # cone top-"cap" quirk: N = 0 (raytracer_func.frag:850-853)
    cone_zero = (shape == CODE_CONE) & (hit.dircode == 1)
    n_analytic = jnp.where(cone_zero[..., None], 0.0, n_analytic)

    # --- mesh normals ----------------------------------------------------
    if scene.tri_va.shape[0] > 0:
        tri = jnp.clip(hit.tri, 0, scene.tri_va.shape[0] - 1)
        A = jnp.take(scene.tri_va, tri, axis=0)
        B = jnp.take(scene.tri_vb, tri, axis=0)
        C = jnp.take(scene.tri_vc, tri, axis=0)
        mtrf = jnp.take(scene.mesh_transfo, prim, axis=0)
        if scene.flat_face:
            no_mesh = jnp.cross(B - A, C - A)
        else:
            PA, PB, PC = A - pl, B - pl, C - pl
            tA = jnp.linalg.norm(jnp.cross(PB, PC), axis=-1, keepdims=True)
            tB = jnp.linalg.norm(jnp.cross(PA, PC), axis=-1, keepdims=True)
            tC = jnp.linalg.norm(jnp.cross(PA, PB), axis=-1, keepdims=True)
            nA = jnp.take(scene.tri_na, tri, axis=0)
            nB = jnp.take(scene.tri_nb, tri, axis=0)
            nC = jnp.take(scene.tri_nc, tri, axis=0)
            no_mesh = nA * tA + nB * tB + nC * tC
        n_mesh = normalize(transform_point(mtrf, pl + no_mesh) - pg)
        n = jnp.where((shape == CODE_MESH)[..., None], n_mesh, n_analytic)
    else:
        n = n_analytic

    # --- stale-on-miss ---------------------------------------------------
    is_hit = (shape >= 0)[..., None]
    if prev_n is None:
        prev_n = jnp.zeros_like(n)
    if prev_p is None:
        prev_p = jnp.zeros_like(pg)
    return jnp.where(is_hit, n, prev_n), jnp.where(is_hit, pg, prev_p)


# ---------------------------------------------------------------------------
# SoA intersection_info (vec3 = tuple of [M] arrays) — the TPU-layout twin
# of the function above; used by the SoA integrator. Same formulas.
# ---------------------------------------------------------------------------

def intersection_info_soa(scene, hit, prev=None):
    """hit: ops.trace.HitS. Returns (n vec3, p vec3); keeps prev on miss."""
    from . import vec

    prim = jnp.clip(hit.prim, 0, scene.nb_prims - 1)
    trf_rows = jnp.take(vec.affine_rows(scene.transfo), prim, axis=1)
    pl, pg = hit.pl, hit.pg
    shape = hit.shape
    dircode = hit.dircode
    z = jnp.zeros_like(pl[0])
    one = jnp.ones_like(pl[0])

    # cube: axis = dir//2, sign from dir%2
    ax = dircode // 2
    sg = jnp.where(dircode % 2 != 0, 1.0, -1.0)
    no_cube = (jnp.where(ax == 0, sg, 0.0), jnp.where(ax == 1, sg, 0.0),
               jnp.where(ax == 2, sg, 0.0))
    # cylinder: caps +-z, side (pl.xy, 0)
    cap = dircode < 2
    no_cyl = (jnp.where(cap, z, pl[0]), jnp.where(cap, z, pl[1]),
              jnp.where(cap, jnp.where(dircode % 2 != 0, 1.0, -1.0), z))
    # cone: bottom cap (0,0,-1); side (pl.xy, |pl.xy|/2)
    rxy = jnp.sqrt(pl[0] * pl[0] + pl[1] * pl[1])
    bot = dircode == 0
    no_cone = (jnp.where(bot, z, pl[0]), jnp.where(bot, z, pl[1]),
               jnp.where(bot, -one, rxy / 2.0))
    no_quad = (z, z, one)

    # select local offset, sphere uses the point 2*pl directly
    def sel(code, v, default):
        return vec.where(shape == code, v, default)

    no = sel(CODE_CUBE, no_cube,
             sel(CODE_CYLINDER, no_cyl,
                 sel(CODE_CONE, no_cone, no_quad)))
    point = vec.where(shape == CODE_SPHERE, vec.scale(pl, 2.0),
                      vec.add(pl, no))
    n = vec.normalize(vec.sub(vec.apply_affine(trf_rows, point), pg),
                      eps=1e-30)
    cone_zero = (shape == CODE_CONE) & (dircode == 1)
    n = vec.where(cone_zero, (z, z, z), n)

    if scene.tri_va.shape[0] > 0:
        tri = jnp.clip(hit.tri, 0, scene.tri_va.shape[0] - 1)
        # ONE row-form gather per table ([9, T] take along axis 1) — 18
        # separate 1-D takes cost ~milliseconds EACH on TPU (random
        # 4-byte accesses), the row form ~0.03 ms (see device.py)
        pr = jnp.take(scene.tri_pos_rows, tri, axis=1)   # [9, M]
        A, B, C = (pr[0], pr[1], pr[2]), (pr[3], pr[4], pr[5]), \
                  (pr[6], pr[7], pr[8])
        mrows = jnp.take(vec.affine_rows(scene.mesh_transfo), prim, axis=1)
        if scene.flat_face:
            no_mesh = vec.cross(vec.sub(B, A), vec.sub(C, A))
        else:
            PA, PB, PC = vec.sub(A, pl), vec.sub(B, pl), vec.sub(C, pl)
            tA = vec.length(vec.cross(PB, PC))
            tB = vec.length(vec.cross(PA, PC))
            tC = vec.length(vec.cross(PA, PB))
            nr = jnp.take(scene.tri_norm_rows, tri, axis=1)
            nA, nB, nC = (nr[0], nr[1], nr[2]), (nr[3], nr[4], nr[5]), \
                         (nr[6], nr[7], nr[8])
            no_mesh = vec.add(vec.add(vec.scale(nA, tA), vec.scale(nB, tB)),
                              vec.scale(nC, tC))
        n_mesh = vec.normalize(
            vec.sub(vec.apply_affine(mrows, vec.add(pl, no_mesh)), pg),
            eps=1e-30)
        n = vec.where(shape == CODE_MESH, n_mesh, n)

    is_hit = shape >= 0
    if prev is None:
        zz = (z, z, z)
        prev = (zz, zz)
    return vec.where(is_hit, n, prev[0]), vec.where(is_hit, pg, prev[1])
