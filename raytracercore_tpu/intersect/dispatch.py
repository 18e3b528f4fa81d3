"""Closest-hit query over the whole scene with material-level filtering.

This is the batched equivalent of the reference's per-primitive wrapper +
scene scan:

* ``Primitive.RayTrace`` (Primitive.cs:46-75): iterate candidates nearest
  first, apply ``Invert`` (flip the inside flag), cull inside hits on
  single-sided primitives, and skip the hit matching the previous bounce's
  hit (``Util.RayHitMatches``, Util.cs:179-192) — self-intersection avoidance
  WITHOUT epsilon ray offsets.
* ``Scene.RayTracePrimitives`` (Scene.cs:65-111): keep the closest surviving
  hit across all primitives.

Here all candidates are evaluated dense ([R rays × table]) and reduced with a
masked argmin; the BVH path narrows the candidate set upstream.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import vecmath as vm
from ..scene.types import SceneArrays
from . import jnp_ref


class HitRecord(struct.PyTreeNode):
    """Batched hit: ``prim == -1`` ⇒ miss (the reference's null Hit)."""

    prim: jnp.ndarray      # [R] int32 global primitive id, -1 = miss
    t: jnp.ndarray         # [R]
    position: jnp.ndarray  # [R, 3]
    normal: jnp.ndarray    # [R, 3]
    inside: jnp.ndarray    # [R] bool

    @property
    def found(self):
        return self.prim >= 0

    @classmethod
    def none(cls, n, dtype=jnp.float32):
        return cls(prim=jnp.full((n,), -1, jnp.int32),
                   t=jnp.zeros((n,), dtype),
                   position=jnp.zeros((n, 3), dtype),
                   normal=jnp.zeros((n, 3), dtype),
                   inside=jnp.zeros((n,), bool))


def _position_eps(dtype):
    """Tolerance for the skip-hit position match.

    The reference compares positions with a relative epsilon of 1e-24 in f64
    (Util.cs:18,41-74) — effectively exact.  In f32 the hit position is
    recomputed through different formulas between bounces, so a looser
    dtype-aware tolerance is needed.
    """
    return 1e-9 if jnp.dtype(dtype) == jnp.float64 else 1e-4


def _skip_match(ray_d, cand_pos, cand_inside, cand_prim, skip, eps):
    """Batched Util.RayHitMatches (Util.cs:179-192).

    a = candidate, b = skip (previous bounce's hit).  Match requires same
    primitive, nearly-equal position, and the inside-parity rule keyed on
    whether the new ray leaves along the skip hit's normal.
    """
    if skip is None:
        return jnp.zeros(cand_prim.shape, bool)
    same_prim = cand_prim == skip.prim[:, None]
    d2 = jnp.sum((cand_pos - skip.position[:, None, :]) ** 2, axis=-1)
    scale = 1.0 + jnp.sum(skip.position ** 2, axis=-1)[:, None]
    pos_close = d2 <= (eps * eps) * scale
    leaving = jnp.sum(ray_d * skip.normal, axis=-1)[:, None] > 0
    parity = jnp.where(leaving,
                       cand_inside != skip.inside[:, None],
                       cand_inside == skip.inside[:, None])
    return same_prim & pos_close & parity & (skip.prim >= 0)[:, None]


def _filter(mats, prim_ids, inside_geo, valid, ray_d, approx_pos, skip, eps):
    """Apply invert / two-sided / skip filtering to candidate grids.

    Returns (valid', inside') where inside' has the Invert flip applied
    (Hit.Inverted, Hit.cs:39-42 — flips only the flag; the geometric normal
    flip already happened in the primitive's inside handling).
    """
    safe_ids = jnp.maximum(prim_ids, 0)
    invert = jnp.take(mats.invert, safe_ids)[None, :]
    two_sided = jnp.take(mats.two_sided, safe_ids)[None, :]

    inside = jnp.where(invert, ~inside_geo, inside_geo)
    valid = valid & ~(inside & ~two_sided)
    match = _skip_match(ray_d, approx_pos, inside,
                        jnp.broadcast_to(prim_ids[None, :], inside.shape),
                        skip, eps)
    valid = valid & ~match
    return valid, inside


def _best(t, valid):
    """Masked argmin over the table axis → (t_best [R], idx [R], any [R])."""
    t = jnp.where(valid, t, jnp.inf)
    idx = jnp.argmin(t, axis=1)
    t_best = jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]
    return t_best, idx, jnp.isfinite(t_best)


def closest_hit(scene: SceneArrays, ray_o, ray_d, skip: HitRecord | None
                ) -> HitRecord:
    """Closest surviving hit across all primitive tables (brute force).

    ``skip`` carries the previous bounce's hit per ray (prim == -1 ⇒ none).
    """
    dtype = ray_o.dtype
    eps_behind = vm.near_enough(dtype)
    eps_pos = _position_eps(dtype)
    mats = scene.materials
    R = ray_o.shape[0]

    # --- triangles -------------------------------------------------------
    tri = scene.triangles
    tc = jnp_ref.triangle_candidates(tri, ray_o, ray_d, eps_behind)
    tri_pos_approx = ray_o[:, None, :] + ray_d[:, None, :] * jnp.where(
        tc["valid"], tc["t"], 0.0)[..., None]
    t_valid, t_inside = _filter(mats, tri.prim_id, tc["inside"], tc["valid"],
                                ray_d, tri_pos_approx, skip, eps_pos)
    tri_t, tri_idx, tri_any = _best(tc["t"], t_valid)

    # --- spheres (near + far roots as separate candidate sets) ----------
    sph = scene.spheres
    sc = jnp_ref.sphere_candidates(sph, ray_o, ray_d)

    def sphere_set(t_obj, valid, inside_flag):
        # World-metric approx position for skip matching (object t equals
        # world t for untransformed; transformed uses the exact recompute in
        # the detail pass — approximate here with the object-ray point mapped
        # by obj_to_world, which is exact for position).
        pos_obj = sc["o_obj"] + sc["d_obj"] * jnp.where(
            valid, t_obj, 0.0)[..., None]
        pos_w = (jnp.einsum("sij,rsj->rsi", sph.obj_to_world[:, :3, :3],
                            pos_obj) + sph.obj_to_world[None, :, :3, 3])
        inside = jnp.broadcast_to(inside_flag, valid.shape)
        valid2, inside2 = _filter(mats, sph.prim_id, inside, valid,
                                  ray_d, pos_w, skip, eps_pos)
        # Sort in world-metric t so cross-table comparison is consistent.
        t_w = jnp.sum(ray_d[:, None, :] * (pos_w - ray_o[:, None, :]),
                      axis=-1)
        t_w = jnp.where(valid2, t_w, jnp.inf)
        return t_w, t_obj, valid2, inside2

    near_tw, near_tobj, near_valid, near_inside = sphere_set(
        sc["t_near_obj"], sc["valid_near"], False)
    far_tw, far_tobj, far_valid, far_inside = sphere_set(
        sc["t_far_obj"], sc["valid_far"], True)

    # Per-sphere best of (near, far): near root is always closer, so prefer
    # near when valid (matches the reference's ordered candidate scan).
    sph_tw = jnp.where(near_valid, near_tw, far_tw)
    sph_tobj = jnp.where(near_valid, near_tobj, far_tobj)
    sph_inside = jnp.where(near_valid, near_inside, far_inside)
    sph_geo_inside = jnp.where(near_valid, False, True)  # pre-invert flag
    sph_valid = near_valid | far_valid
    sph_t, sph_idx, sph_any = _best(
        jnp.where(sph_valid, sph_tw, jnp.inf), sph_valid)

    # --- planes ----------------------------------------------------------
    pl = scene.planes
    pc = jnp_ref.plane_candidates(pl, ray_o, ray_d, eps_behind)
    pl_pos_approx = ray_o[:, None, :] + ray_d[:, None, :] * jnp.where(
        pc["valid"], pc["t"], 0.0)[..., None]
    p_valid, p_inside = _filter(mats, pl.prim_id, pc["inside"], pc["valid"],
                                ray_d, pl_pos_approx, skip, eps_pos)
    pl_t, pl_idx, pl_any = _best(pc["t"], p_valid)

    # --- cross-table reduction ------------------------------------------
    ts = jnp.stack([jnp.where(tri_any, tri_t, jnp.inf),
                    jnp.where(sph_any, sph_t, jnp.inf),
                    jnp.where(pl_any, pl_t, jnp.inf)], axis=1)
    table = jnp.argmin(ts, axis=1)
    found = jnp.isfinite(jnp.min(ts, axis=1))

    # --- details per table winner ---------------------------------------
    # Losing/missing winners gather t = inf; computing positions with inf
    # would produce NaNs that leak through the final selects in reverse-mode
    # AD, so every gathered winner value is sanitized to a finite dummy.
    gather = lambda grid, idx: jnp.take_along_axis(
        grid, idx[:, None], axis=1)[:, 0]
    fin = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)

    tri_u = fin(gather(tc["u"], tri_idx))
    tri_v = fin(gather(tc["v"], tri_idx))
    tri_in_geo = gather(tc["inside"], tri_idx)
    tri_in = gather(t_inside, tri_idx)
    tri_p, tri_n = jnp_ref.triangle_hit_detail(tri, tri_idx, tri_u, tri_v,
                                               tri_in_geo)

    sph_tobj_w = fin(gather(sph_tobj, sph_idx))
    sph_in_geo = gather(sph_geo_inside, sph_idx)
    sph_in = gather(sph_inside, sph_idx)
    o_obj_w = jnp.take_along_axis(
        sc["o_obj"], sph_idx[:, None, None], axis=1)[:, 0]
    d_obj_w = jnp.take_along_axis(
        sc["d_obj"], sph_idx[:, None, None], axis=1)[:, 0]
    sph_p, sph_n, sph_t_exact = jnp_ref.sphere_hit_detail(
        sph, sph_idx, ray_o, ray_d, o_obj_w, d_obj_w, sph_tobj_w, sph_in_geo)

    pl_in_geo = gather(pc["inside"], pl_idx)
    pl_in = gather(p_inside, pl_idx)
    pl_t_w = fin(gather(pc["t"], pl_idx))
    pl_p, pl_n = jnp_ref.plane_hit_detail(pl, pl_idx, ray_o, ray_d, pl_t_w,
                                          pl_in_geo)

    def pick3(a, b, c):
        return jnp.where((table == 0)[..., None] if a.ndim == 2
                         else table == 0, a,
                         jnp.where((table == 1)[..., None] if a.ndim == 2
                                   else table == 1, b, c))

    position = pick3(tri_p, sph_p, pl_p)
    normal = pick3(tri_n, sph_n, pl_n)
    inside = pick3(tri_in, sph_in, pl_in)
    t = fin(pick3(fin(tri_t), sph_t_exact, pl_t_w))

    prim = pick3(jnp.take(tri.prim_id, tri_idx),
                 jnp.take(sph.prim_id, sph_idx),
                 jnp.take(pl.prim_id, pl_idx))
    prim = jnp.where(found, prim, -1)

    return HitRecord(prim=prim.astype(jnp.int32), t=t, position=position,
                     normal=normal, inside=inside)
