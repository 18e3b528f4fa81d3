"""Path-replay backward: a fast custom gradient path for training.

The driver's primary metric is fwd+bwd rays/sec, and generic reverse-AD over
the full bounce loop is ~20x slower than forward: each rematerialized bounce
re-runs closest-hit SELECTION (the [rays × prims] scan / Pallas kernel / BVH
traversal) and reverse-differentiates through the whole body.

But the gradient only needs a tiny tape.  Branch selection is discrete and
already stop-gradded (see :mod:`..intersect.dispatch`); given the per-bounce
decisions — winning primitive, interaction branch, inside/Fresnel-live flags
(everything ``Raytracer.GetColor`` decides by comparison, Raytracer.cs:
65-246) — the pixel color is a closed-form differentiable function of the
material table: a product of gathered albedos × ``max(totalLum, 1)`` factors
ending in an emission term, with Fresnel/shininess/IOR entering through
[R]-shaped per-ray math.

So the train path is:

1. **Record** (stop-grad): one plain forward pass — any closest-hit
   implementation, including the Pallas kernels or the BVH — that emits a
   :class:`..render.integrator.PathTape` (int32 ``[bounces, R]`` prim +
   flags).
2. **Replay** (differentiable): re-walk the recorded path with [R]-shaped
   winner re-evaluation and shading math only.  No selection, no
   [rays × prims] anything; reverse-AD sees a shallow chain of gathers and
   elementwise ops.

All row gathers ride the MXU as one-hot matmuls (one packed matrix per
primitive table), so neither direction issues TPU scatter/gather ops — the
backward of a one-hot gather is just the transposed matmul.

``grad(trace_replay)`` equals ``grad(trace)`` for the same key — both
differentiate the same fixed-decision estimator — which the tests pin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.color import luminance
from ..intersect import jnp_ref
from ..intersect.dispatch import closest_hit
from ..scene.types import SceneArrays
from .integrator import (BounceType, PathTape, _material_matrix,
                         _random_shine, _split_material, gather_rows,
                         prepare_uniforms, trace)


def _pack_replay(scene: SceneArrays):
    """Per-table packed row matrices + the material/row-map matrix.

    Geometry matrices are stop-gradded (geometry gradients are out of scope
    per SURVEY §7); the material columns stay on the tape.  Row maps (global
    prim id → row within each table) ride along as float columns of the
    material matrix so one matmul gathers everything per-prim.
    """
    sg = jax.lax.stop_gradient
    tri, sph, pl = scene.triangles, scene.spheres, scene.planes
    mats = scene.materials
    n = max(scene.n_prims, 1)

    def inv_map(prim_id):
        rows = jnp.arange(prim_id.shape[0], dtype=jnp.int32)
        idx = jnp.where(prim_id >= 0, prim_id, n)  # padding rows → dropped
        return jnp.zeros((n,), jnp.int32).at[idx].set(rows, mode="drop")

    table = jnp.zeros((n,), jnp.int32)
    for tid, prim_id in ((1, sph.prim_id), (2, pl.prim_id)):
        idx = jnp.where(prim_id >= 0, prim_id, n)
        table = table.at[idx].set(tid, mode="drop")

    f = lambda x: x.astype(tri.v0.dtype)[:, None]
    # [N, 19]: materials (14, differentiable) + invert, table, rows (sg).
    matm = jnp.concatenate([
        _material_matrix(mats),
        sg(jnp.concatenate([f(mats.invert), f(table),
                            f(inv_map(tri.prim_id)), f(inv_map(sph.prim_id)),
                            f(inv_map(pl.prim_id))], axis=1))], axis=1)

    # [T, 23]: v0 e1 e2 normal n0 n1 n2 (×3), mirror, smooth.
    tfm = sg(jnp.concatenate([
        tri.v0, tri.e1, tri.e2, tri.normal, tri.n0, tri.n1, tri.n2,
        f(tri.mirror), f(tri.smooth)], axis=1))
    # [S, 38]: w2o 3x4, o2w 3x4, center, radius, normal_mat 3x3, transformed.
    S = sph.radius.shape[0]
    sfm = sg(jnp.concatenate([
        sph.world_to_obj[:, :3, :].reshape(S, 12),
        sph.obj_to_world[:, :3, :].reshape(S, 12),
        sph.center, sph.radius[:, None],
        sph.normal_mat.reshape(S, 9), f(sph.transformed)], axis=1))
    # [P, 4]: normal, origin_dist.
    pfm = sg(jnp.concatenate([pl.normal, pl.origin_dist[:, None]], axis=1))
    return matm, tfm, sfm, pfm


def _tri_eval(trow, o, d, eps_behind):
    """Triangle position/normal on gathered rows ([R, 23]) — the [R]-shaped
    twin of dispatch's winner evaluation (Möller–Trumbore +
    Triangle.GetNormal, Triangle.cs:148-224)."""
    v0, e1, e2 = trow[:, 0:3], trow[:, 3:6], trow[:, 6:9]
    face_n = trow[:, 9:12]
    mirror = trow[:, 21] != 0
    smooth = trow[:, 22] != 0
    mt = jnp_ref.moller_trumbore(o, d, v0, e1, e2, face_n, mirror,
                                 jnp.ones(o.shape[0], bool), eps_behind)
    u, v = mt["u"], mt["v"]
    inside_geo = mt["inside"]
    position = v0 + e1 * u[:, None] + e2 * v[:, None]

    n_interp = (trow[:, 12:15] * u[:, None] + trow[:, 15:18] * v[:, None]
                + trow[:, 18:21] * (u + v)[:, None])
    n_interp = vm.normalize(n_interp, eps=1e-30)
    n_interp_in = n_interp - face_n * (
        2.0 * vm.vdot(n_interp, face_n)
        / jnp.maximum(vm.vdot(face_n, face_n), 1e-30))
    n_smooth = jnp.where(inside_geo[:, None], n_interp_in, n_interp)
    n_flat = jnp.where(inside_geo[:, None], -face_n, face_n)
    normal = jnp.where(smooth[:, None], n_smooth, n_flat)
    return position, normal


def _sph_eval(srow, o, d, use_near):
    """Sphere position/normal on gathered rows ([R, 38]) with the recorded
    near/far root choice (Sphere.DoRayTrace/GetHit, Sphere.cs:156-209)."""
    w2o = srow[:, 0:12].reshape(-1, 3, 4)
    o2w = srow[:, 12:24].reshape(-1, 3, 4)
    center, radius = srow[:, 24:27], srow[:, 27]
    nmat = srow[:, 28:37].reshape(-1, 3, 3)
    transformed = srow[:, 37] != 0

    o_obj = jnp.einsum("rij,rj->ri", w2o[:, :, :3], o) + w2o[:, :, 3]
    d_obj = jnp.einsum("rij,rj->ri", w2o[:, :, :3], d)
    d_obj = d_obj / vm.safe_sqrt(jnp.sum(d_obj * d_obj, axis=-1))[:, None]

    offset = o_obj - center
    b = -2.0 * jnp.sum(offset * d_obj, axis=-1)
    c = jnp.sum(offset * offset, axis=-1) - radius ** 2
    disc = b * b - 4.0 * c
    radix = jnp.sqrt(jnp.maximum(jnp.where(disc >= 0, disc, 1.0), 1e-20))
    t_obj = jnp.where(use_near, (b - radix) / 2.0, (b + radix) / 2.0)
    inside_geo = ~use_near

    pos_obj = o_obj + d_obj * t_obj[:, None]
    n_obj = (pos_obj - center) / jnp.maximum(radius, 1e-30)[:, None]
    pos_w = jnp.einsum("rij,rj->ri", o2w[:, :, :3], pos_obj) + o2w[:, :, 3]
    n_w = vm.normalize(jnp.einsum("rij,rj->ri", nmat, n_obj), eps=1e-30)

    position = jnp.where(transformed[:, None], pos_w, pos_obj)
    normal = jnp.where(transformed[:, None], n_w, n_obj)
    normal = jnp.where(inside_geo[:, None], -normal, normal)
    return position, normal


def _pl_eval(prow, o, d, eps_behind):
    """Plane position/normal on gathered rows ([R, 4]; Plane.cs:36-66)."""
    n, dist0 = prow[:, 0:3], prow[:, 3]
    ray_dist = jnp.sum(o * n, axis=-1)
    denom = jnp.sum(d * n, axis=-1)
    coplanar = (denom == 0) & (jnp.abs(dist0 - ray_dist)
                               <= eps_behind * (1.0 + jnp.abs(dist0)))
    t = jnp.where(denom != 0,
                  (dist0 - ray_dist) / jnp.where(denom == 0, 1.0, denom),
                  0.0)
    t = jnp.where(coplanar, 0.0, jnp.abs(t))
    inside_geo = jnp.where(coplanar, True, denom > 0)
    position = o + d * t[:, None]
    normal = jnp.where(inside_geo[:, None], -n, n)
    return position, normal


def replay(scene: SceneArrays, ray_o, ray_d, uniforms, tape: PathTape,
           remat: bool = True):
    """Differentiable re-walk of a recorded path.

    Same (color, miss) contract and shading semantics as
    :func:`..render.integrator.trace`, but every discrete decision comes from
    ``tape`` instead of comparisons, so the whole function is [R]-shaped.

    ``remat``: rematerialize each bounce in the backward (checkpoint).  Off,
    reverse-AD saves every bounce's intermediates — more HBM, no recompute.
    """
    R = ray_o.shape[0]
    dtype = ray_o.dtype
    recursion = scene.recursion
    ambient = scene.ambient_rgb.astype(dtype)
    air = scene.air_refractive_index.astype(dtype)
    eps_behind = vm.near_enough(dtype)
    matm, tfm, sfm, pfm = _pack_replay(scene)

    def body(i, carry):
        o, d, tint, result, miss = carry
        # Periodic renormalization — must match trace (Raytracer.cs:74-75).
        d = jnp.where(i % 3 == 0, vm.normalize(d), d)

        prim = tape.prim[i]
        flags = tape.flags[i]
        code = flags & PathTape.CODE_MASK
        inside = (flags & PathTape.FLAG_INSIDE) != 0
        f_live = (flags & PathTape.FLAG_FLIVE) != 0
        safe_prim = jnp.maximum(prim, 0)

        # One matmul gathers materials + invert/table/row columns.
        g = gather_rows(matm, safe_prim)
        mat = _split_material(g)
        emission = mat["emission"]
        invert_p = g[:, 14] != 0
        table = g[:, 15].astype(jnp.int32)
        rows = g[:, 16:19].astype(jnp.int32)

        # --- differentiable winner re-evaluation (phase 2 of dispatch) ---
        tri_pos, tri_nrm = _tri_eval(gather_rows(tfm, rows[:, 0]), o, d,
                                     eps_behind)
        # For spheres: inside_geo = inside XOR invert; near root ⇔ outside.
        use_near = ~jnp.logical_xor(inside, invert_p)
        sph_pos, sph_nrm = _sph_eval(gather_rows(sfm, rows[:, 1]), o, d,
                                     use_near)
        pl_pos, pl_nrm = _pl_eval(gather_rows(pfm, rows[:, 2]), o, d,
                                  eps_behind)

        c0, c1 = (table == 0)[:, None], (table == 1)[:, None]
        position = jnp.where(c0, tri_pos, jnp.where(c1, sph_pos, pl_pos))
        normal = jnp.where(c0, tri_nrm, jnp.where(c1, sph_nrm, pl_nrm))

        u = uniforms[i]

        # --- shading math, decisions pinned by the tape -------------------
        rough_n = _random_shine(u[0], u[1], u[2], normal, mat["shininess"])
        cos = -vm.dot(rough_n, d)

        diff_lum = luminance(mat["diffuse"])
        spec_lum = luminance(mat["specular"])
        refr_lum = luminance(mat["refraction"])
        emis_lum = luminance(emission)

        ior_in = jnp.where(inside, mat["ior"], air)
        ior_out = jnp.where(inside, air, mat["ior"])
        safe_out = jnp.where(ior_out == 0, 1.0, ior_out)
        ior_ratio = ior_in / safe_out
        sin_out = ior_ratio * vm.safe_sqrt(1.0 - cos * cos)
        cos_out = vm.safe_sqrt(1.0 - sin_out * sin_out)
        cos_f = jnp.where(f_live, cos, 1.0)
        cos_out_f = jnp.where(f_live, cos_out, 1.0)
        rs = ((ior_out * cos_f) - (ior_in * cos_out_f)) / \
            ((ior_out * cos_f) + (ior_in * cos_out_f))
        rp = ((ior_in * cos_f) - (ior_out * cos_out_f)) / \
            ((ior_in * cos_f) + (ior_out * cos_out_f))
        fresnel = (rs * rs + rp * rp) / 2.0

        spec_lum = jnp.where(f_live, spec_lum * fresnel, spec_lum)
        refr_lum = jnp.where(f_live, refr_lum * (1.0 - fresnel),
                             jnp.zeros_like(refr_lum))
        total_lum = diff_lum + spec_lum + refr_lum + emis_lum

        # --- outcomes ------------------------------------------------------
        te = tint * emission
        terminal = ((code == BounceType.EMISSION)
                    | (code == BounceType.SPECULAR_FAIL)
                    | (code == BounceType.PURE_BLACK)
                    | (code == BounceType.RECURSION_COMPLETE))
        result = jnp.where(terminal[:, None], te, result)

        is_miss = code == BounceType.MISSED
        if scene.ambient_is_miss:
            miss = miss | is_miss
        else:
            miss = miss | (is_miss & (i == 0))
            result = jnp.where((is_miss & (i != 0))[:, None], ambient,
                               result)

        pick_refr = code == BounceType.TRANSMITTED
        pick_spec = code == BounceType.SPECULAR
        pick_diff = code == BounceType.DIFFUSE
        bounced = pick_refr | pick_spec | pick_diff

        refr_dir = (rough_n * (-cos_out)[:, None]
                    + (d + rough_n * cos[:, None]) * ior_ratio[:, None])
        refr_tint = jnp.where(inside[:, None],
                              jnp.ones_like(mat["refraction"]),
                              mat["refraction"])
        spec_dir = vm.reflect(rough_n, d, cos)
        diff_dir = vm.create_horizon_cs(normal, u[4], u[5], u[6])

        out_dir = jnp.where(pick_refr[:, None], refr_dir,
                            jnp.where(pick_spec[:, None], spec_dir,
                                      diff_dir))
        new_tint = jnp.where(pick_refr[:, None], refr_tint,
                             jnp.where(pick_spec[:, None], mat["specular"],
                                       mat["diffuse"]))
        new_tint = new_tint * jnp.maximum(total_lum, 1.0)[:, None]

        sel = bounced[:, None]
        o = jnp.where(sel, position, o)
        d = jnp.where(sel, out_dir, d)
        tint = jnp.where(sel, tint * new_tint, tint)
        return o, d, tint, result, miss

    init = (ray_o, ray_d, jnp.ones((R, 3), dtype),
            jnp.zeros((R, 3), dtype), jnp.zeros((R,), bool))
    # Per-bounce remat: residuals stay a handful of [R] arrays; recomputing
    # a replay bounce is pure elementwise + one-hot matmuls.
    body_fn = jax.checkpoint(body, prevent_cse=False) if remat else body
    _, _, _, result, miss = jax.lax.fori_loop(0, recursion + 1, body_fn,
                                              init)
    return result, miss


def record_tape(scene: SceneArrays, ray_o, ray_d, uniforms,
                closest_fn=closest_hit) -> PathTape:
    """Stop-grad forward recording pass via the integrator's own loop body
    (``want_tape=True``), so the tape can never drift from the render path.
    """
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    _, _, tape = trace(scene_sg, sg(ray_o), sg(ray_d), None,
                       closest_fn=closest_fn, uniforms=sg(uniforms),
                       want_tape=True)
    return jax.tree.map(sg, tape)


def _default_record_fn(scene: SceneArrays, closest_fn):
    """Pick the fastest recorder: the fused Pallas closest-hit on TPU for
    kernel-sized scenes (selection values never reach the tape's gradients,
    so the non-differentiable kernel is fine), else the given closest_fn."""
    if closest_fn is not closest_hit:
        return closest_fn  # caller chose (e.g. a BVH) — respect it
    from ..config import PALLAS_MAX_PRIMS
    n_rows = (scene.triangles.v0.shape[0] + scene.spheres.radius.shape[0]
              + scene.planes.origin_dist.shape[0])
    if jax.default_backend() == "tpu" and n_rows <= PALLAS_MAX_PRIMS:
        from ..intersect.pallas_select import closest_hit_fused
        return closest_hit_fused
    return closest_fn


def record_tape_fused(scene: SceneArrays, ray_o, ray_d, uniforms):
    """Stop-grad recording pass through the whole-path megakernel
    (:func:`..render.fused.trace_fused` with ``want_tape=True``): the
    tape is emitted from inside the kernel, so recording costs one
    megakernel pass instead of per-bounce HBM round trips."""
    from . import fused

    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    _, _, tape = fused.trace_fused(scene_sg, sg(ray_o), sg(ray_d), None,
                                   uniforms=sg(uniforms), want_tape=True)
    return jax.tree.map(sg, tape)


def trace_replay(scene: SceneArrays, ray_o, ray_d, key,
                 closest_fn=closest_hit, record_fused=None):
    """Drop-in for :func:`..render.integrator.trace` on the TRAIN path:
    identical (color, miss) estimator and gradients, ~selection-free
    backward.  Forward-only rendering should keep using ``trace`` (or the
    fused megakernel) — the tape write is pure overhead there.

    ``record_fused``: route the recording pass through the megakernel
    (:func:`record_tape_fused`).  Default ``None`` = auto: on TPU, for
    kernel-sized scenes, when the caller didn't pick a ``closest_fn``.
    Knife-edge branch picks can differ between Mosaic and XLA arithmetic
    for a tiny fraction of rays; the tape stays self-consistent (it is the
    path the megakernel itself sampled), so the estimator is unchanged.
    """
    if scene.debug_geom:
        # Flat geometry view has no bounce loop to replay.
        return trace(scene, ray_o, ray_d, key, closest_fn=closest_fn)
    R = ray_o.shape[0]
    uniforms = prepare_uniforms(key, R, scene.recursion + 1, ray_o.dtype)
    if record_fused is None:
        from . import fused
        record_fused = (closest_fn is closest_hit
                        and jax.default_backend() == "tpu"
                        and fused.fits(scene))
    if record_fused:
        tape = record_tape_fused(scene, ray_o, ray_d, uniforms)
    else:
        record_fn = _default_record_fn(scene, closest_fn)
        tape = record_tape(scene, ray_o, ray_d, uniforms,
                           closest_fn=record_fn)
    return replay(scene, ray_o, ray_d, uniforms, tape)
