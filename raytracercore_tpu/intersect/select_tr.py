"""Lane-optimal selection kernels: transposed [prims, rays] grids.

TPU vector units operate on (8 sublanes × 128 lanes) tiles over the two
minor dimensions.  The natural `[R, 3]` / `[R, T]` formulations put a tiny
axis (3 vector components, or a small primitive table) in the lane
dimension, wasting up to 97% of the VPU.  These kernels compute the same
candidate grids **componentwise** with shape ``[T, R]`` — the big ray axis
lands in lanes, small table axes in sublanes — and reduce over axis 0.

They implement only the stop-gradient SELECTION phase (which candidate
wins); values are re-derived by the differentiable winner evaluation in
:mod:`.dispatch`.  Semantics identical to :mod:`.jnp_ref` (the readable
oracle) — equivalence is pinned by tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.types import Planes, Spheres, Triangles

INF = jnp.inf


def _comp(a):
    """[N, 3] table → three [N, 1] column components."""
    return a[:, 0:1], a[:, 1:2], a[:, 2:3]


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _skip_match_tr(prim_ids, pos_x, pos_y, pos_z, inside, dx, dy, dz,
                   skip, eps):
    """Transposed-batch Util.RayHitMatches (Util.cs:179-192).
    prim_ids [T,1]; pos_* / inside [T,R]; d* [R]; skip fields [R]."""
    if skip is None:
        return jnp.zeros(inside.shape, bool)
    same = prim_ids == skip.prim[None, :]
    sx, sy, sz = skip.position[:, 0], skip.position[:, 1], skip.position[:, 2]
    d2 = ((pos_x - sx) ** 2 + (pos_y - sy) ** 2 + (pos_z - sz) ** 2)
    scale = 1.0 + sx * sx + sy * sy + sz * sz
    pos_close = d2 <= (eps * eps) * scale
    leaving = (dx * skip.normal[:, 0] + dy * skip.normal[:, 1]
               + dz * skip.normal[:, 2]) > 0
    parity = jnp.where(leaving[None, :], inside != skip.inside[None, :],
                       inside == skip.inside[None, :])
    return same & pos_close & parity & (skip.prim >= 0)[None, :]


def _argmin0(t, valid):
    """Masked argmin over the table axis (axis 0) → (idx [R], any [R])."""
    t = jnp.where(valid, t, INF)
    idx = jnp.argmin(t, axis=0)
    t_best = jnp.min(t, axis=0)
    return idx.astype(jnp.int32), jnp.isfinite(t_best)


def triangle_select(tri: Triangles, mats, ray_o, ray_d, skip, eps_behind,
                    eps_pos):
    """Transposed Möller–Trumbore selection (semantics of
    jnp_ref.moller_trumbore + dispatch filtering).  Returns (idx, any)."""
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]   # [R]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    v0x, v0y, v0z = _comp(tri.v0)                        # [T, 1]
    e1x, e1y, e1z = _comp(tri.e1)
    e2x, e2y, e2z = _comp(tri.e2)
    nx, ny, nz = _comp(tri.normal)

    sx, sy, sz = _cross(dx, dy, dz, e2x, e2y, e2z)       # [T, R]
    det = e1x * sx + e1y * sy + e1z * sz
    fx, fy, fz = ox - v0x, oy - v0y, oz - v0z

    inv = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    u_n = inv * (fx * sx + fy * sy + fz * sz)
    ocx, ocy, ocz = _cross(fx, fy, fz, e1x, e1y, e1z)
    v_n = inv * (dx * ocx + dy * ocy + dz * ocz)
    t_n = inv * (e2x * ocx + e2y * ocy + e2z * ocz)
    inside_n = inv < 0

    on_plane = jnp.abs(fx * nx + fy * ny + fz * nz) <= eps_behind
    degenerate = (det == 0) & on_plane
    u = jnp.where(degenerate, e1x * fx + e1y * fy + e1z * fz, u_n)
    v = jnp.where(degenerate, e2x * fx + e2y * fy + e2z * fz, v_n)
    t = jnp.where(degenerate, 0.0, t_n)
    inside_geo = jnp.where(degenerate, True, inside_n)

    mirror = tri.mirror[:, None]
    uv_limit = jnp.where(mirror, v, u + v)
    uv_ok = (u >= 0) & (u <= 1) & (v >= 0) & (uv_limit <= 1)
    ahead = degenerate | (t >= -eps_behind)
    solvable = (det != 0) | degenerate
    valid = uv_ok & ahead & solvable & (tri.prim_id >= 0)[:, None]

    # Material filters.
    safe_ids = jnp.maximum(tri.prim_id, 0)
    invert = jnp.take(mats.invert, safe_ids)[:, None]
    two_sided = jnp.take(mats.two_sided, safe_ids)[:, None]
    inside = jnp.where(invert, ~inside_geo, inside_geo)
    valid = valid & ~(inside & ~two_sided)

    ts = jnp.where(valid, t, 0.0)
    match = _skip_match_tr(tri.prim_id[:, None], ox + dx * ts, oy + dy * ts,
                           oz + dz * ts, inside, dx, dy, dz, skip, eps_pos)
    valid = valid & ~match
    return _argmin0(t, valid)


def sphere_select(sph: Spheres, mats, ray_o, ray_d, skip, eps_pos):
    """Transposed sphere selection (near+far roots).
    Returns (idx [R], use_near [R], any [R])."""
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]

    w = sph.world_to_obj                                 # [S, 4, 4]
    m = lambda i, j: w[:, i, j][:, None]                 # [S, 1]
    o_x = m(0, 0) * ox + m(0, 1) * oy + m(0, 2) * oz + m(0, 3)  # [S, R]
    o_y = m(1, 0) * ox + m(1, 1) * oy + m(1, 2) * oz + m(1, 3)
    o_z = m(2, 0) * ox + m(2, 1) * oy + m(2, 2) * oz + m(2, 3)
    d_x = m(0, 0) * dx + m(0, 1) * dy + m(0, 2) * dz
    d_y = m(1, 0) * dx + m(1, 1) * dy + m(1, 2) * dz
    d_z = m(2, 0) * dx + m(2, 1) * dy + m(2, 2) * dz
    d_len = jnp.sqrt(d_x * d_x + d_y * d_y + d_z * d_z)
    d_x, d_y, d_z = d_x / d_len, d_y / d_len, d_z / d_len

    cx, cy, cz = _comp(sph.center)
    fx, fy, fz = o_x - cx, o_y - cy, o_z - cz
    b = -2.0 * (fx * d_x + fy * d_y + fz * d_z)
    c = fx * fx + fy * fy + fz * fz - (sph.radius ** 2)[:, None]
    disc = b * b - 4.0 * c
    has_root = disc >= 0
    radix = jnp.sqrt(jnp.where(has_root, disc, 0.0))

    table_ok = (sph.prim_id >= 0)[:, None]
    any_hit = has_root & (radix >= -b) & table_ok
    both = radix < b
    t_near = (b - radix) / 2.0
    t_far = (b + radix) / 2.0
    valid_near = any_hit & both
    valid_far = any_hit

    safe_ids = jnp.maximum(sph.prim_id, 0)
    invert = jnp.take(mats.invert, safe_ids)[:, None]
    two_sided = jnp.take(mats.two_sided, safe_ids)[:, None]

    o2 = sph.obj_to_world
    m2 = lambda i, j: o2[:, i, j][:, None]

    def filt(t_obj, valid, geo_inside):
        # World position of the candidate (exact — obj_to_world applied).
        ts = jnp.where(valid, t_obj, 0.0)
        px = o_x + d_x * ts
        py = o_y + d_y * ts
        pz = o_z + d_z * ts
        wx = m2(0, 0) * px + m2(0, 1) * py + m2(0, 2) * pz + m2(0, 3)
        wy = m2(1, 0) * px + m2(1, 1) * py + m2(1, 2) * pz + m2(1, 3)
        wz = m2(2, 0) * px + m2(2, 1) * py + m2(2, 2) * pz + m2(2, 3)
        inside = jnp.where(invert, ~geo_inside, geo_inside)
        valid = valid & ~(inside & ~two_sided)
        match = _skip_match_tr(sph.prim_id[:, None], wx, wy, wz, inside,
                               dx, dy, dz, skip, eps_pos)
        valid = valid & ~match
        t_w = dx * (wx - ox) + dy * (wy - oy) + dz * (wz - oz)
        return jnp.where(valid, t_w, INF), valid

    geo_f = jnp.zeros(b.shape, bool)
    near_tw, near_valid = filt(t_near, valid_near, geo_f)
    far_tw, far_valid = filt(t_far, valid_far, ~geo_f)

    tw = jnp.where(near_valid, near_tw, far_tw)
    valid = near_valid | far_valid
    idx, any_ = _argmin0(jnp.where(valid, tw, INF), valid)
    use_near = jnp.take_along_axis(near_valid, idx[None, :], axis=0)[0]
    return idx, use_near, any_


def plane_select(pl: Planes, mats, ray_o, ray_d, skip, eps_behind, eps_pos):
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    nx, ny, nz = _comp(pl.normal)
    dist0 = pl.origin_dist[:, None]

    ray_dist = nx * ox + ny * oy + nz * oz               # [P, R]
    denom = nx * dx + ny * dy + nz * dz
    table_ok = (pl.prim_id >= 0)[:, None]

    coplanar = (denom == 0) & (jnp.abs(dist0 - ray_dist)
                               <= eps_behind * (1.0 + jnp.abs(dist0)))
    t = jnp.where(denom != 0,
                  (dist0 - ray_dist) / jnp.where(denom == 0, 1.0, denom),
                  0.0)
    ahead = (denom != 0) & (t >= -eps_behind)
    t_abs = jnp.where(coplanar, 0.0, jnp.abs(t))
    inside_geo = jnp.where(coplanar, True, denom > 0)
    valid = (coplanar | ahead) & table_ok

    safe_ids = jnp.maximum(pl.prim_id, 0)
    invert = jnp.take(mats.invert, safe_ids)[:, None]
    two_sided = jnp.take(mats.two_sided, safe_ids)[:, None]
    inside = jnp.where(invert, ~inside_geo, inside_geo)
    valid = valid & ~(inside & ~two_sided)

    ts = jnp.where(valid, t_abs, 0.0)
    match = _skip_match_tr(pl.prim_id[:, None], ox + dx * ts, oy + dy * ts,
                           oz + dz * ts, inside, dx, dy, dz, skip, eps_pos)
    valid = valid & ~match
    return _argmin0(t_abs, valid)
