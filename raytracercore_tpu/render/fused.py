"""Fused whole-path Pallas megakernel: the complete bounce loop on-core.

One kernel call renders a full progressive pass: camera rays enter, final
colors leave.  Every bounce — closest-hit over all primitive tables
(Scene.RayTracePrimitives, Scene.cs:65-111), material fetch, Fresnel/TIR
split, stochastic branch selection, and path-state update (the whole of
``Raytracer.GetColor``, Raytracer.cs:65-246) — runs inside a
``lax.fori_loop`` in VMEM/registers.  Nothing round-trips to HBM between
bounces; the XLA-side :func:`..render.integrator.trace` remains the
differentiable reference implementation (the two share the integrator
semantics and the preprocessed-uniform contract of
:func:`..render.integrator.prepare_uniforms`).

Forward-only: branch selection and the fori carry are not reverse-mode
differentiable.  Training records a :class:`..render.integrator.PathTape`
here (``want_tape=True``) and differentiates the [R]-shaped replay
(:mod:`.replay`) — the kernel emits each bounce's discrete decisions
(winning primitive + BounceType/inside/Fresnel-live flags) as two extra
int32 outputs, so the stop-grad recording pass runs at megakernel speed
instead of paying per-bounce HBM round trips through the dispatch path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FUSED_MAX_PRIMS as MAX_PRIMS
from ..core import vecmath as vm
from ..core.color import LUM_R, LUM_G, LUM_B
from ..intersect import kernel_body as kb
from ..scene.types import SceneArrays

LANES = 128
BM = 8
BLOCK = BM * LANES

MAT_F = 14  # emission(3) diffuse(3) specular(3) refraction(3) ior shin
SC_F = 4    # air_ior, ambient r g b


def _pack_materials(mats):
    # Luminances are computed in-kernel from the gathered rgb (5 flops
    # each) rather than carried as 4 extra gather channels (4 x N selects
    # per bounce).
    return jnp.concatenate([
        mats.emission, mats.diffuse, mats.specular, mats.refraction,
        mats.refractive_index[:, None], mats.shininess[:, None],
    ], axis=1).astype(jnp.float32)


def _make_kernel(T: int, S: int, P: int, N: int, n_bounces: int,
                 recursion: int, eps_behind: float, eps_pos: float,
                 ambient_is_miss: bool, want_tape: bool = False,
                 any_smooth: bool = True, coplanar: bool = True):
    from .integrator import BounceType as BT
    from .integrator import PathTape

    def kernel(ox, oy, oz, dx, dy, dz, u_ref, tf, ti, sf, si, pf, pi,
               mf, scf, rr_o, rg_o, rb_o, miss_o, *tape_refs):
        tp_o, tfl_o, tnx_o, tny_o, tnz_o = tape_refs if want_tape \
            else (None,) * 5
        shape = ox[:].shape
        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)
        izero = jnp.zeros(shape, jnp.int32)
        air = scf[0, 0]
        amb = (scf[0, 1], scf[0, 2], scf[0, 3])

        def uch(i, ch):
            # uniforms channel ch of bounce i (static index).
            return u_ref[i * 7 + ch]

        init = (
            (ox[:], oy[:], oz[:]),          # ray origin
            (dx[:], dy[:], dz[:]),          # ray direction
            (one, one, one),                # tint
            jnp.ones(shape, jnp.int32),     # alive
            (zero, zero, zero),             # result
            izero,                          # miss
            # prev-hit skip record (prim -1 ⇒ none)
            jnp.full(shape, -1, jnp.int32),  # prev prim
            (zero, zero, zero),             # prev position
            (zero, zero, one),              # prev normal
            izero,                          # prev inside
        )

        def body(i, carry):
            # ``i`` is a static Python int — the bounce loop is unrolled so
            # every per-bounce branch below specializes away instead of
            # executing masked.
            (o, d, tint, alive_i, result, miss_i,
             pv_prim, pv_pos, pv_nrm, pv_in) = carry
            alive = alive_i != 0

            # Periodic renormalization (Raytracer.cs:74-75).
            if i % 3 == 0 and i > 0:
                d = vm.scale3(d, jax.lax.rsqrt(vm.dot3(d, d)))

            # --- closest hit across all tables --------------------------
            if i == 0:
                skip = None  # camera rays have no previous hit
            else:
                skip = {"prim": pv_prim, "px": pv_pos[0], "py": pv_pos[1],
                        "pz": pv_pos[2], "nx": pv_nrm[0], "ny": pv_nrm[1],
                        "nz": pv_nrm[2], "inside": pv_in}
            skip_match = kb.make_skip_match(shape, d, skip, eps_pos)
            best = kb.GlobalBest(shape)

            def emit(row, ok, tt, prim, inside_i32, pos3, nrm3, extra):
                best.commit(ok, tt, prim, inside_i32, pos3, nrm3)

            kb.triangle_pass(T, tf, ti, o, d, eps_behind, skip_match, emit,
                             coplanar=coplanar, any_smooth=any_smooth)
            kb.sphere_pass(S, sf, si, o, d, skip_match, emit)
            kb.plane_pass(P, pf, pi, o, d, eps_behind, skip_match, emit)

            found = best.prim >= 0
            hit_pos = best.pos
            hit_nrm = best.nrm
            inside = best.inside != 0

            # Tape masks: aliveness at bounce entry, and this bounce's miss.
            active = alive
            was_missed = alive & ~found

            # --- miss handling (Raytracer.cs:81-91) ----------------------
            miss = miss_i != 0
            if i == 0:
                miss = miss | (alive & ~found)
            elif ambient_is_miss:
                miss = miss | (alive & ~found)
            else:
                result = vm.where3(alive & ~found, amb, result)
            alive = alive & found

            # --- material fetch (rows are global prim ids) ---------------
            safe_prim = jnp.maximum(best.prim, 0)
            emis = (zero, zero, zero)
            diff = (zero, zero, zero)
            spec = (zero, zero, zero)
            refr = (zero, zero, zero)
            ior = zero
            shin = zero
            last = i >= recursion  # static: the final bounce only needs
            for p_row in range(N):  # emission (everything else is dead code)
                sel = safe_prim == p_row
                g = lambda k, cur: jnp.where(sel, mf[p_row, k], cur)
                emis = (g(0, emis[0]), g(1, emis[1]), g(2, emis[2]))
                if last:
                    continue
                diff = (g(3, diff[0]), g(4, diff[1]), g(5, diff[2]))
                spec = (g(6, spec[0]), g(7, spec[1]), g(8, spec[2]))
                refr = (g(9, refr[0]), g(10, refr[1]), g(11, refr[2]))
                ior = g(12, ior)
                shin = g(13, shin)
            # Luminances from the gathered rgb (4 x 5 flops) instead of 4
            # more gather channels (4 x N selects) — the gather loop was
            # ~9% of kernel ops at bounce.txt's N = 22.
            lum = lambda c: LUM_R * c[0] + LUM_G * c[1] + LUM_B * c[2]
            l_e = lum(emis)
            l_d = lum(diff)
            l_s = lum(spec)
            l_r = lum(refr)

            # --- recursion complete (Raytracer.cs:100-104) ----------------
            te = (tint[0] * emis[0], tint[1] * emis[1], tint[2] * emis[2])
            if i >= recursion:  # statically the last bounce
                result = vm.where3(alive, te, result)
                if want_tape:
                    # No shading on the final bounce, so no FLIVE bit — the
                    # replay only reads flags on bounced codes, which cannot
                    # occur here (everything still alive is
                    # RECURSION_COMPLETE, Raytracer.cs:100-104).
                    code = jnp.where(was_missed, BT.MISSED,
                                     jnp.where(alive, BT.RECURSION_COMPLETE,
                                               BT.SKIPPED))
                    flags = code | jnp.where(inside, PathTape.FLAG_INSIDE, 0)
                    tp_o[i] = jnp.where(active, best.prim, -1)
                    tfl_o[i] = jnp.where(active, flags, 0)
                    tnx_o[i] = hit_nrm[0]
                    tny_o[i] = hit_nrm[1]
                    tnz_o[i] = hit_nrm[2]
                return (o, d, tint, izero, result,
                        miss.astype(jnp.int32), pv_prim, pv_pos, pv_nrm,
                        pv_in)

            # --- shading --------------------------------------------------
            # RandomShine (Raytracer.cs:51-56): z = exp(ln U / shininess).
            z_shine = jnp.where(jnp.isinf(shin), 1.0,
                                jnp.exp(uch(i, 0) / shin))
            rough_n = vm.create_horizon3_cs(hit_nrm, z_shine,
                                            uch(i, 1), uch(i, 2))

            cos = -vm.dot3(rough_n, d)

            # Fresnel split (Raytracer.cs:120-157).
            can_refract = ((l_r > 0) | (l_s > 0)) & (ior != 0) & (cos >= 0)
            ior_in = jnp.where(inside, ior, air)
            ior_out = jnp.where(inside, air, ior)
            safe_out = jnp.where(ior_out == 0, 1.0, ior_out)
            ior_ratio = ior_in / safe_out
            sin_out = ior_ratio * vm.safe_sqrt(1.0 - cos * cos)
            tir = sin_out >= 1.0
            cos_out = vm.safe_sqrt(1.0 - sin_out * sin_out)
            f_live = can_refract & ~tir
            cos_f = jnp.where(f_live, cos, 1.0)
            cos_out_f = jnp.where(f_live, cos_out, 1.0)
            rs = ((ior_out * cos_f) - (ior_in * cos_out_f)) / \
                ((ior_out * cos_f) + (ior_in * cos_out_f))
            rp = ((ior_in * cos_f) - (ior_out * cos_out_f)) / \
                ((ior_in * cos_f) + (ior_out * cos_out_f))
            fresnel = (rs * rs + rp * rp) / 2.0

            spec_lum = jnp.where(f_live, l_s * fresnel, l_s)
            refr_lum = jnp.where(f_live, l_r * (1.0 - fresnel), 0.0)
            total_lum = l_d + spec_lum + refr_lum + l_e

            # Pure black termination (Raytracer.cs:165-169).
            black = alive & (total_lum <= 0)
            result = vm.where3(black, te, result)
            alive = alive & ~black

            # --- stochastic branch selection (Raytracer.cs:177-229) ------
            ray_rand = uch(i, 3) * total_lum
            pick_refr = (refr_lum != 0) & (ray_rand - refr_lum <= 0)
            r2 = ray_rand - refr_lum
            pick_spec = ~pick_refr & (spec_lum != 0) & (r2 - spec_lum <= 0)
            r3 = r2 - spec_lum
            pick_diff = ~pick_refr & ~pick_spec & (l_d != 0) & \
                (r3 - l_d <= 0)
            pick_emit = ~pick_refr & ~pick_spec & ~pick_diff

            # Transmission (Raytracer.cs:181-193).
            refr_dir = tuple(
                rough_n[k] * (-cos_out) + (d[k] + rough_n[k] * cos)
                * ior_ratio for k in range(3))
            refr_tint = vm.where3(inside, (one, one, one), refr)

            # Specular with rough-normal fail (Raytracer.cs:194-209).
            spec_dir = vm.reflect3(rough_n, d, cos)
            spec_ok = vm.dot3(spec_dir, hit_nrm) > 0

            # Diffuse (Raytracer.cs:210-219) around the TRUE normal.
            diff_dir = vm.create_horizon3_cs(hit_nrm, uch(i, 4),
                                             uch(i, 5), uch(i, 6))

            # Terminal branches: emission pick, or failed specular.
            terminal = alive & (pick_emit | (pick_spec & ~spec_ok))
            result = vm.where3(terminal, te, result)
            alive = alive & ~terminal

            out_dir = vm.where3(pick_refr, refr_dir,
                                vm.where3(pick_spec, spec_dir, diff_dir))
            new_tint = vm.where3(pick_refr, refr_tint,
                                 vm.where3(pick_spec, spec, diff))
            # Energy compensation (Raytracer.cs:238-240).
            comp = jnp.maximum(total_lum, 1.0)
            new_tint = vm.scale3(new_tint, comp)

            bounced = alive
            if want_tape:
                # Discrete decisions of this bounce (same mask logic as the
                # tape write in integrator.trace; masks are disjoint and all
                # include aliveness).
                code = jnp.where(was_missed, BT.MISSED, BT.SKIPPED)
                code = jnp.where(black, BT.PURE_BLACK, code)
                code = jnp.where(terminal & pick_emit, BT.EMISSION, code)
                code = jnp.where(terminal & pick_spec & ~spec_ok,
                                 BT.SPECULAR_FAIL, code)
                code = jnp.where(bounced & pick_refr, BT.TRANSMITTED, code)
                code = jnp.where(bounced & pick_spec, BT.SPECULAR, code)
                code = jnp.where(bounced & pick_diff, BT.DIFFUSE, code)
                flags = (code
                         | jnp.where(inside, PathTape.FLAG_INSIDE, 0)
                         | jnp.where(f_live, PathTape.FLAG_FLIVE, 0))
                tp_o[i] = jnp.where(active, best.prim, -1)
                tfl_o[i] = jnp.where(active, flags, 0)
                tnx_o[i] = hit_nrm[0]
                tny_o[i] = hit_nrm[1]
                tnz_o[i] = hit_nrm[2]
            o = vm.where3(bounced, hit_pos, o)
            d = vm.where3(bounced, out_dir, d)
            tint = vm.where3(
                bounced,
                (tint[0] * new_tint[0], tint[1] * new_tint[1],
                 tint[2] * new_tint[2]), tint)

            pv_prim = jnp.where(bounced, best.prim, pv_prim)
            pv_pos = vm.where3(bounced, hit_pos, pv_pos)
            pv_nrm = vm.where3(bounced, hit_nrm, pv_nrm)
            pv_in = jnp.where(bounced, best.inside, pv_in)

            return (o, d, tint, alive.astype(jnp.int32), result,
                    miss.astype(jnp.int32), pv_prim, pv_pos, pv_nrm, pv_in)

        # Unrolled bounce loop: static per-bounce specialization (no skip
        # test on camera rays, renorm only every 3rd bounce, emission-only
        # material fetch + no shading on the final bounce) and no loop-carry
        # round trips.  (A per-bounce all-dead lax.cond skip was tried in
        # round 4 and REGRESSED the forward 12.2 -> 17.3 ms: the branch
        # carries ~20 live (8,128) planes whose spill/refill around each
        # region costs more than the skipped tail bounces save.)
        carry = init
        for i in range(n_bounces):
            carry = body(i, carry)
        final = carry
        result = final[4]
        rr_o[:] = result[0]
        rg_o[:] = result[1]
        rb_o[:] = result[2]
        miss_o[:] = final[5]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "T", "S", "P", "N", "n_bounces", "recursion", "eps_behind", "eps_pos",
    "ambient_is_miss", "interpret", "want_tape", "any_smooth", "coplanar"))
def _run(ox, oy, oz, dx, dy, dz, u, tf, ti, sf, si, pf, pi, mf, scf,
         T, S, P, N, n_bounces, recursion, eps_behind, eps_pos,
         ambient_is_miss, interpret, want_tape=False, any_smooth=True,
         coplanar=True):
    m = ox.shape[0]
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((u.shape[0], BM, LANES), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = _make_kernel(T, S, P, N, n_bounces, recursion,
                          eps_behind, eps_pos, ambient_is_miss,
                          want_tape=want_tape, any_smooth=any_smooth,
                          coplanar=coplanar)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    out_shape = (f32, f32, f32, i32)
    out_specs = (out_spec,) * 4
    if want_tape:
        tape_i32 = jax.ShapeDtypeStruct((n_bounces, m, LANES), jnp.int32)
        tape_f32 = jax.ShapeDtypeStruct((n_bounces, m, LANES), jnp.float32)
        tape_spec = pl.BlockSpec((n_bounces, BM, LANES), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = out_shape + (tape_i32, tape_i32, tape_f32, tape_f32,
                                 tape_f32)
        out_specs = out_specs + (tape_spec,) * 5
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 6 + [u_spec]
        + [table_spec(a) for a in (tf, ti, sf, si, pf, pi, mf, scf)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, u, tf, ti, sf, si, pf, pi, mf, scf)


# The kernel unrolls the table and material loops ACROSS EVERY BOUNCE;
# route bigger scenes to the per-bounce dispatch kernels or the BVH
# (MAX_PRIMS is config.FUSED_MAX_PRIMS — tighter than the per-bounce
# kernels' PALLAS_MAX_PRIMS because scoped VMEM scales with the unroll).


def fits(scene: SceneArrays) -> bool:
    n_rows = (scene.triangles.v0.shape[0] + scene.spheres.radius.shape[0]
              + scene.planes.origin_dist.shape[0])
    return n_rows <= MAX_PRIMS and not scene.debug_geom


def trace_fused(scene: SceneArrays, ray_o, ray_d, key, interpret=None,
                uniforms=None, want_tape=False):
    """Drop-in forward replacement for :func:`..render.integrator.trace`
    (same (color, miss) contract, same uniform consumption).

    ``uniforms``: pre-generated :func:`..render.integrator.prepare_uniforms`
    output ([bounces, 7, R]) to consume instead of drawing from ``key`` —
    the replay train path shares one uniform set between recording and
    replay.  ``want_tape``: also return a
    :class:`..render.integrator.PathTape` of per-bounce discrete decisions,
    recorded inside the kernel (the fast recording pass for
    :func:`.replay.trace_replay`).
    """
    from .integrator import PathTape, prepare_uniforms

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = ray_o.dtype
    R = ray_o.shape[0]
    n_bounces = scene.recursion + 1
    pad = (-R) % BLOCK
    m = (R + pad) // LANES

    if uniforms is None:
        uniforms = prepare_uniforms(key, R, n_bounces, jnp.float32)
    u = jnp.pad(uniforms.astype(jnp.float32).reshape(n_bounces * 7, R),
                ((0, 0), (0, pad))).reshape(n_bounces * 7, m, LANES)

    def prep(a):
        return jnp.pad(a, (0, pad)).reshape(m, LANES).astype(jnp.float32)

    ox, oy, oz = (prep(ray_o[:, k]) for k in range(3))
    dx, dy, dz = (prep(ray_d[:, k]) for k in range(3))

    tf, ti, sf, si, pf, pi = kb.pack_tables(scene)
    mf = _pack_materials(scene.materials)
    scf = jnp.concatenate([
        scene.air_refractive_index.reshape(1).astype(jnp.float32),
        scene.ambient_rgb.reshape(3).astype(jnp.float32)]).reshape(1, SC_F)

    eps_behind = float(vm.near_enough(jnp.float32))
    from ..intersect.dispatch import _position_eps
    eps_pos = float(_position_eps(jnp.float32))

    from ..config import FUSED_COPLANAR_BRANCH
    out = _run(
        ox, oy, oz, dx, dy, dz, u,
        tf.astype(jnp.float32), ti, sf.astype(jnp.float32), si,
        pf.astype(jnp.float32), pi, mf, scf,
        T=tf.shape[0], S=sf.shape[0], P=pf.shape[0], N=mf.shape[0],
        n_bounces=n_bounces, recursion=scene.recursion,
        eps_behind=eps_behind, eps_pos=eps_pos,
        ambient_is_miss=scene.ambient_is_miss, interpret=bool(interpret),
        want_tape=want_tape, any_smooth=scene.any_smooth,
        coplanar=FUSED_COPLANAR_BRANCH)
    rr, rg, rb, miss = out[:4]

    unpack = lambda a: a.reshape(-1)[:R]
    color = jnp.stack([unpack(rr), unpack(rg), unpack(rb)],
                      axis=1).astype(dtype)
    if want_tape:
        unpack_t = lambda a: a.reshape(n_bounces, -1)[:, :R]
        tape = PathTape(prim=unpack_t(out[4]), flags=unpack_t(out[5]),
                        nx=unpack_t(out[6]).astype(dtype),
                        ny=unpack_t(out[7]).astype(dtype),
                        nz=unpack_t(out[8]).astype(dtype))
        return color, unpack(miss) != 0, tape
    return color, unpack(miss) != 0
