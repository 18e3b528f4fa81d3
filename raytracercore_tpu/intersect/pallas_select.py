"""Pallas TPU closest-hit kernel.

This is the [NATIVE-TIER] replacement for the reference's AVX2 intersection
routines (SIMDHelpers.cs, Triangle.cs:76-146, Sphere.cs:50-155) done the TPU
way: one fused kernel walks every primitive table with rays laid out as
(sublanes × 128 lanes) tiles, keeping all candidate state in registers — no
[rays × prims] HBM traffic, full lane occupancy.

The kernel emits BOTH:

* per-table winner indices — the stop-gradient SELECTION result consumed by
  the differentiable winner re-evaluation in :mod:`.dispatch` (train path);
* the complete hit record (t, position, normal, inside, prim) computed
  in-kernel — the fast FORWARD path (progressive rendering), which skips the
  [R, 3]-shaped jnp evaluation entirely.

Semantics identical to :mod:`.jnp_ref` — pinned by equivalence tests
(interpret mode on CPU).  Tables are packed into dense f32/i32 matrices kept
whole in VMEM; suited to brute-force-sized tables (≤ ~768 primitives);
larger scenes route triangles through the BVH instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import SceneArrays

LANES = 128
BM = 32          # sublane rows per ray block → 32×128 = 4096 rays/block
BLOCK = BM * LANES

# Packed float-table column layouts.
TRI_F = 21       # v0(3) e1(3) e2(3) n(3) n0(3) n1(3) n2(3)
SPH_F = 28       # w2o rows (12), o2w rows (12), center(3), radius
PL_F = 4         # n(3), dist
# int columns: prim_id, flag(mirror/smooth packed), invert, two_sided


def _pack_tables(scene: SceneArrays):
    mats = scene.materials

    def icols(prim_id, flag):
        safe = jnp.maximum(prim_id, 0)
        return jnp.stack(
            [prim_id, flag.astype(jnp.int32),
             jnp.take(mats.invert, safe).astype(jnp.int32),
             jnp.take(mats.two_sided, safe).astype(jnp.int32)], axis=1)

    tri = scene.triangles
    tf = jnp.concatenate([tri.v0, tri.e1, tri.e2, tri.normal,
                          tri.n0, tri.n1, tri.n2], axis=1)
    # flag bit0 = mirror, bit1 = smooth
    tflag = tri.mirror.astype(jnp.int32) + 2 * tri.smooth.astype(jnp.int32)
    ti = icols(tri.prim_id, tflag)

    sph = scene.spheres
    w2o = sph.world_to_obj[:, :3, :].reshape(-1, 12)
    o2w = sph.obj_to_world[:, :3, :].reshape(-1, 12)
    sf = jnp.concatenate([w2o, o2w, sph.center, sph.radius[:, None]], axis=1)
    si = icols(sph.prim_id, jnp.zeros_like(sph.prim_id))

    pln = scene.planes
    pf = jnp.concatenate([pln.normal, pln.origin_dist[:, None]], axis=1)
    pi = icols(pln.prim_id, jnp.zeros_like(pln.prim_id))
    return tf, ti, sf, si, pf, pi


def _make_kernel(T: int, S: int, P: int, eps_behind: float, eps_pos: float,
                 has_skip: bool):
    """Build the kernel body for static table sizes."""

    def kernel(ox, oy, oz, dx, dy, dz,
               skp, spx, spy, spz, snx, sny, snz, sin_,
               tf, ti, sf, si, pf, pi,
               tri_idx_o, sph_idx_o, sph_near_o, pl_idx_o,
               t_o, prim_o, inside_o, px_o, py_o, pz_o, nx_o, ny_o, nz_o):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        shape = o_x.shape
        inf = jnp.full(shape, jnp.inf, jnp.float32)
        neg1 = jnp.full(shape, -1, jnp.int32)
        zero = jnp.zeros(shape, jnp.float32)

        if has_skip:
            k_prim = skp[:]
            k_px, k_py, k_pz = spx[:], spy[:], spz[:]
            k_leaving = (d_x * snx[:] + d_y * sny[:] + d_z * snz[:]) > 0
            k_inside = sin_[:] != 0
            k_scale = 1.0 + k_px * k_px + k_py * k_py + k_pz * k_pz

        def skip_match(prim_id, px, py, pz, inside):
            if not has_skip:
                return jnp.zeros(shape, bool)
            d2 = ((px - k_px) ** 2 + (py - k_py) ** 2 + (pz - k_pz) ** 2)
            pos_close = d2 <= (eps_pos * eps_pos) * k_scale
            # (leaving ? inside != k : inside == k) as pure boolean ops —
            # Mosaic rejects selects on 1-bit vectors.
            parity = jnp.logical_xor(k_leaving, inside == k_inside)
            return (k_prim == prim_id) & (k_prim >= 0) & pos_close & parity

        # Global best record, combined across all three tables.
        g_t = inf
        g_prim = neg1
        g_inside = jnp.zeros(shape, jnp.int32)
        g_px = g_py = g_pz = zero
        g_nx = g_ny = g_nz = zero

        def commit(better, tt, prim, inside_i32, px, py, pz, nx, ny, nz):
            nonlocal g_t, g_prim, g_inside, g_px, g_py, g_pz
            nonlocal g_nx, g_ny, g_nz
            g_t = jnp.where(better, tt, g_t)
            g_prim = jnp.where(better, prim, g_prim)
            g_inside = jnp.where(better, inside_i32, g_inside)
            g_px = jnp.where(better, px, g_px)
            g_py = jnp.where(better, py, g_py)
            g_pz = jnp.where(better, pz, g_pz)
            g_nx = jnp.where(better, nx, g_nx)
            g_ny = jnp.where(better, ny, g_ny)
            g_nz = jnp.where(better, nz, g_nz)

        # --- triangles (Möller–Trumbore, Triangle.cs:148-207) ------------
        best_t = inf
        best_i = neg1
        for t in range(T):
            v0x, v0y, v0z = tf[t, 0], tf[t, 1], tf[t, 2]
            e1x, e1y, e1z = tf[t, 3], tf[t, 4], tf[t, 5]
            e2x, e2y, e2z = tf[t, 6], tf[t, 7], tf[t, 8]
            fnx, fny, fnz = tf[t, 9], tf[t, 10], tf[t, 11]
            prim = ti[t, 0]
            mirror = (ti[t, 1] & 1) != 0
            smooth = (ti[t, 1] & 2) != 0
            inv_f = ti[t, 2] != 0
            two_s = ti[t, 3] != 0

            sx = d_y * e2z - d_z * e2y
            sy = d_z * e2x - d_x * e2z
            sz = d_x * e2y - d_y * e2x
            det = e1x * sx + e1y * sy + e1z * sz
            fx, fy, fz = o_x - v0x, o_y - v0y, o_z - v0z
            inv = jnp.where(det != 0,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
            u_n = inv * (fx * sx + fy * sy + fz * sz)
            ocx = fy * e1z - fz * e1y
            ocy = fz * e1x - fx * e1z
            ocz = fx * e1y - fy * e1x
            v_n = inv * (d_x * ocx + d_y * ocy + d_z * ocz)
            t_n = inv * (e2x * ocx + e2y * ocy + e2z * ocz)

            on_plane = jnp.abs(fx * fnx + fy * fny + fz * fnz) <= eps_behind
            degen = (det == 0) & on_plane
            u = jnp.where(degen, e1x * fx + e1y * fy + e1z * fz, u_n)
            v = jnp.where(degen, e2x * fx + e2y * fy + e2z * fz, v_n)
            tt = jnp.where(degen, 0.0, t_n)
            inside_geo = degen | (inv < 0)

            uv_lim = jnp.where(mirror, v, u + v)
            ok = ((u >= 0) & (u <= 1) & (v >= 0) & (uv_lim <= 1)
                  & (degen | (tt >= -eps_behind)) & ((det != 0) | degen)
                  & (prim >= 0))
            inside = jnp.logical_xor(inside_geo, inv_f)
            ok = ok & (two_s | ~inside)

            # Exact hit position (Triangle.cs:192).
            hx = v0x + e1x * u + e2x * v
            hy = v0y + e1y * u + e2y * v
            hz = v0z + e1z * u + e2z * v
            ok = ok & ~skip_match(prim, hx, hy, hz, inside)

            # Normal (Triangle.GetNormal, Triangle.cs:209-224).
            if True:
                n0x, n0y, n0z = tf[t, 12], tf[t, 13], tf[t, 14]
                n1x, n1y, n1z = tf[t, 15], tf[t, 16], tf[t, 17]
                n2x, n2y, n2z = tf[t, 18], tf[t, 19], tf[t, 20]
                w2 = u + v
                ix = n0x * u + n1x * v + n2x * w2
                iy = n0y * u + n1y * v + n2y * w2
                iz = n0z * u + n1z * v + n2z * w2
                rl = jax.lax.rsqrt(
                    jnp.maximum(ix * ix + iy * iy + iz * iz, 1e-30))
                ix, iy, iz = ix * rl, iy * rl, iz * rl
                dotf = ix * fnx + iy * fny + iz * fnz
                # inside: reflect interpolated normal through face plane
                rx = ix - fnx * (2.0 * dotf)
                ry = iy - fny * (2.0 * dotf)
                rz = iz - fnz * (2.0 * dotf)
                smx = jnp.where(inside_geo, rx, ix)
                smy = jnp.where(inside_geo, ry, iy)
                smz = jnp.where(inside_geo, rz, iz)
                flip = jnp.where(inside_geo, -1.0, 1.0)
                flx, fly, flz = fnx * flip, fny * flip, fnz * flip
                nx = jnp.where(smooth, smx, flx)
                ny = jnp.where(smooth, smy, fly)
                nz = jnp.where(smooth, smz, flz)

            better_tab = ok & (tt < best_t)
            best_t = jnp.where(better_tab, tt, best_t)
            best_i = jnp.where(better_tab, t, best_i)
            commit(ok & (tt < g_t), tt, prim, inside.astype(jnp.int32),
                   hx, hy, hz, nx, ny, nz)
        tri_idx_o[:] = best_i

        # --- spheres (Sphere.cs:156-209) ---------------------------------
        best_t = inf
        best_i = neg1
        best_n = jnp.zeros(shape, jnp.int32)
        for s in range(S):
            m = lambda k: sf[s, k]
            oox = m(0) * o_x + m(1) * o_y + m(2) * o_z + m(3)
            ooy = m(4) * o_x + m(5) * o_y + m(6) * o_z + m(7)
            ooz = m(8) * o_x + m(9) * o_y + m(10) * o_z + m(11)
            ddx = m(0) * d_x + m(1) * d_y + m(2) * d_z
            ddy = m(4) * d_x + m(5) * d_y + m(6) * d_z
            ddz = m(8) * d_x + m(9) * d_y + m(10) * d_z
            dlen = jax.lax.rsqrt(
                jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-30))
            ddx, ddy, ddz = ddx * dlen, ddy * dlen, ddz * dlen

            cx, cy, cz, rad = m(24), m(25), m(26), m(27)
            fx, fy, fz = oox - cx, ooy - cy, ooz - cz
            b = -2.0 * (fx * ddx + fy * ddy + fz * ddz)
            c = fx * fx + fy * fy + fz * fz - rad * rad
            disc = b * b - 4.0 * c
            has_root = disc >= 0
            radix = jnp.sqrt(jnp.where(has_root, disc, 0.0))
            prim = si[s, 0]
            inv_f = si[s, 2] != 0
            two_s = si[s, 3] != 0
            any_hit = has_root & (radix >= -b) & (prim >= 0)
            v_near = any_hit & (radix < b)
            v_far = any_hit
            inv_rad = 1.0 / rad

            def eval_root(t_obj, valid, geo_inside: bool):
                ts = jnp.where(valid, t_obj, 0.0)
                px = oox + ddx * ts
                py = ooy + ddy * ts
                pz = ooz + ddz * ts
                # World position via obj_to_world (Sphere.cs:158-166).
                wx = m(12) * px + m(13) * py + m(14) * pz + m(15)
                wy = m(16) * px + m(17) * py + m(18) * pz + m(19)
                wz = m(20) * px + m(21) * py + m(22) * pz + m(23)
                # Object normal, then MatrixToNormal = w2o^T (Sphere.cs:36).
                qx = (px - cx) * inv_rad
                qy = (py - cy) * inv_rad
                qz = (pz - cz) * inv_rad
                nwx = m(0) * qx + m(4) * qy + m(8) * qz
                nwy = m(1) * qx + m(5) * qy + m(9) * qz
                nwz = m(2) * qx + m(6) * qy + m(10) * qz
                nrl = jax.lax.rsqrt(
                    jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30))
                nwx, nwy, nwz = nwx * nrl, nwy * nrl, nwz * nrl
                inside_s = jnp.logical_not(inv_f) if geo_inside else inv_f
                inside = jnp.broadcast_to(inside_s, valid.shape)
                valid = valid & (two_s | ~inside)
                valid = valid & ~skip_match(prim, wx, wy, wz, inside)
                tw = d_x * (wx - o_x) + d_y * (wy - o_y) + d_z * (wz - o_z)
                # Geometric-inside hits negate the normal (Sphere.cs:168-169).
                flip = -1.0 if geo_inside else 1.0
                # inside as i32: Mosaic cannot select between i1 vectors.
                return tw, valid, inside.astype(jnp.int32), wx, wy, wz, \
                    nwx * flip, nwy * flip, nwz * flip

            rn = eval_root((b - radix) / 2.0, v_near, False)
            rf = eval_root((b + radix) / 2.0, v_far, True)
            t_near, v_near = rn[0], rn[1]
            t_far, v_far = rf[0], rf[1]
            tw = jnp.where(v_near, t_near, t_far)
            valid = v_near | v_far

            better_tab = valid & (tw < best_t)
            best_t = jnp.where(better_tab, tw, best_t)
            best_i = jnp.where(better_tab, s, best_i)
            best_n = jnp.where(better_tab, v_near.astype(jnp.int32), best_n)

            bg = valid & (tw < g_t)
            pick = lambda a, bq: jnp.where(v_near, a, bq)
            commit(bg, tw, prim, pick(rn[2], rf[2]),
                   pick(rn[3], rf[3]), pick(rn[4], rf[4]),
                   pick(rn[5], rf[5]), pick(rn[6], rf[6]),
                   pick(rn[7], rf[7]), pick(rn[8], rf[8]))
        sph_idx_o[:] = best_i
        sph_near_o[:] = best_n

        # --- planes (Plane.cs:36-66) -------------------------------------
        best_t = inf
        best_i = neg1
        for q in range(P):
            qnx, qny, qnz, dist0 = pf[q, 0], pf[q, 1], pf[q, 2], pf[q, 3]
            prim = pi[q, 0]
            inv_f = pi[q, 2] != 0
            two_s = pi[q, 3] != 0
            ray_dist = qnx * o_x + qny * o_y + qnz * o_z
            denom = qnx * d_x + qny * d_y + qnz * d_z
            coplanar = (denom == 0) & (
                jnp.abs(dist0 - ray_dist)
                <= eps_behind * (1.0 + jnp.abs(dist0)))
            tt = jnp.where(denom != 0, (dist0 - ray_dist)
                           / jnp.where(denom == 0, 1.0, denom), 0.0)
            ahead = (denom != 0) & (tt >= -eps_behind)
            t_abs = jnp.where(coplanar, 0.0, jnp.abs(tt))
            inside_geo = coplanar | (denom > 0)
            ok = (coplanar | ahead) & (prim >= 0)
            inside = jnp.logical_xor(inside_geo, inv_f)
            ok = ok & (two_s | ~inside)
            hx = o_x + d_x * t_abs
            hy = o_y + d_y * t_abs
            hz = o_z + d_z * t_abs
            ok = ok & ~skip_match(prim, hx, hy, hz, inside)
            flip = jnp.where(inside_geo, -1.0, 1.0)

            better_tab = ok & (t_abs < best_t)
            best_t = jnp.where(better_tab, t_abs, best_t)
            best_i = jnp.where(better_tab, q, best_i)
            commit(ok & (t_abs < g_t), t_abs, prim,
                   inside.astype(jnp.int32), hx, hy, hz,
                   qnx * flip, qny * flip, qnz * flip)
        pl_idx_o[:] = best_i

        # --- global record outputs --------------------------------------
        found = g_prim >= 0
        t_o[:] = jnp.where(found, g_t, 0.0)
        prim_o[:] = g_prim
        inside_o[:] = g_inside
        px_o[:] = g_px
        py_o[:] = g_py
        pz_o[:] = g_pz
        nx_o[:] = g_nx
        ny_o[:] = g_ny
        nz_o[:] = g_nz

    return kernel


N_OUT = 13


@functools.partial(jax.jit, static_argnames=("T", "S", "P", "eps_behind",
                                             "eps_pos", "has_skip",
                                             "interpret"))
def _run(ox, oy, oz, dx, dy, dz, skp, spx, spy, spz, snx, sny, snz, sin_,
         tf, ti, sf, si, pf, pi, T, S, P, eps_behind, eps_pos, has_skip,
         interpret):
    m = ox.shape[0]
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = _make_kernel(T, S, P, eps_behind, eps_pos, has_skip)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    out_shapes = (i32, i32, i32, i32, f32, i32, i32,
                  f32, f32, f32, f32, f32, f32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 14 + [table_spec(a)
                                    for a in (tf, ti, sf, si, pf, pi)],
        out_specs=(out_spec,) * N_OUT,
        out_shape=out_shapes,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, skp, spx, spy, spz, snx, sny, snz, sin_,
      tf, ti, sf, si, pf, pi)


def _invoke(scene, ray_o, ray_d, skip, eps_behind, eps_pos, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = ray_o.shape[0]
    pad = (-R) % BLOCK
    m = (R + pad) // LANES

    def prep(a):
        return jnp.pad(a, (0, pad)).reshape(m, LANES).astype(jnp.float32)

    ox, oy, oz = (prep(ray_o[:, k]) for k in range(3))
    dx, dy, dz = (prep(ray_d[:, k]) for k in range(3))

    if skip is None:
        zf = jnp.zeros((m, LANES), jnp.float32)
        zi = jnp.zeros((m, LANES), jnp.int32)
        skp, spx, spy, spz = zi, zf, zf, zf
        snx, sny, snz, sin_ = zf, zf, zf, zi
        has_skip = False
    else:
        skp = jnp.pad(skip.prim, (0, pad),
                      constant_values=-1).reshape(m, LANES)
        spx, spy, spz = (prep(skip.position[:, k]) for k in range(3))
        snx, sny, snz = (prep(skip.normal[:, k]) for k in range(3))
        sin_ = jnp.pad(skip.inside.astype(jnp.int32),
                       (0, pad)).reshape(m, LANES)
        has_skip = True

    tf, ti, sf, si, pf, pi = _pack_tables(scene)
    outs = _run(ox, oy, oz, dx, dy, dz, skp, spx, spy, spz, snx, sny, snz,
                sin_, tf.astype(jnp.float32), ti, sf.astype(jnp.float32),
                si, pf.astype(jnp.float32), pi,
                T=tf.shape[0], S=sf.shape[0], P=pf.shape[0],
                eps_behind=float(eps_behind), eps_pos=float(eps_pos),
                has_skip=has_skip, interpret=bool(interpret))
    unpack = lambda a: a.reshape(-1)[:R]
    return [unpack(a) for a in outs]


def select_all(scene: SceneArrays, ray_o, ray_d, skip, eps_behind, eps_pos,
               interpret=None):
    """Selection-phase outputs for the differentiable dispatch path.

    Returns ((tri_idx, tri_any), (sph_idx, use_near, sph_any),
    (pl_idx, pl_any)).
    """
    outs = _invoke(scene, ray_o, ray_d, skip, eps_behind, eps_pos, interpret)
    tri_idx, sph_idx, sph_near, pl_idx = outs[:4]
    return ((jnp.maximum(tri_idx, 0), tri_idx >= 0),
            (jnp.maximum(sph_idx, 0), sph_near != 0, sph_idx >= 0),
            (jnp.maximum(pl_idx, 0), pl_idx >= 0))


def closest_hit_fused(scene: SceneArrays, ray_o, ray_d, skip,
                      interpret=None):
    """Full HitRecord straight from the kernel (forward/rendering path;
    NOT differentiable — use dispatch.closest_hit for gradients)."""
    from ..core import vecmath as vm
    from .dispatch import HitRecord, _position_eps

    dtype = ray_o.dtype
    outs = _invoke(scene, ray_o, ray_d, skip, vm.near_enough(dtype),
                   _position_eps(dtype), interpret)
    (_, _, _, _, t, prim, inside, px, py, pz, nx, ny, nz) = outs
    return HitRecord(
        prim=prim.astype(jnp.int32), t=t.astype(dtype),
        position=jnp.stack([px, py, pz], axis=1).astype(dtype),
        normal=jnp.stack([nx, ny, nz], axis=1).astype(dtype),
        inside=inside != 0)
