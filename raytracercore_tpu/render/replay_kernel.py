"""Pallas replay kernel: the whole tape-replay bounce chain on-core.

The XLA replay (:mod:`.replay`) is ~170 elementwise ops per bounce over [R]
planes, but XLA materializes the fori_loop carry and the remat'd backward as
dozens of small fusions with HBM round trips between bounces — measured on
v5e (docs/TRAIN_STEP.md) the replay forward costs as much as the FULL
megakernel forward (12.1 vs 12.2 ms) despite doing ~5% of the flops, and
fwd+bwd 26.8 ms against a ~8 ms speed-of-light.

This module keeps the same estimator but runs the shading chain inside one
Pallas kernel per direction:

* the MATERIAL GATHER stays in XLA: one ``[C, N] @ [N, B·R]`` one-hot matmul
  (precision=HIGHEST — see integrator.gather_rows) produces every bounce's
  gathered channels ``g`` up front, so the kernel consumes dense [B·C]
  planes and the backward's scatter-add transpose is again a single MXU
  matmul that XLA differentiates;
* the FORWARD kernel walks the recorded path (uniforms + tape flags/normals
  + ``g``) bounce-by-bounce entirely in VMEM/registers;
* the BACKWARD kernel re-runs the forward sweep, stashing each bounce's
  (direction, tint) carry in VMEM scratch (6 planes × bounces ≈ 0.3 MB per
  1024-ray block), then runs the reverse sweep calling :func:`jax.vjp` on
  the per-bounce shading function — the transpose is traced INTO the kernel,
  so the hand-written part is only the sweep structure, not the derivative
  math — and emits the cotangent ``dL/dg`` planes.

``replay_fused(...)`` is a drop-in for :func:`.replay.replay` on TPU for
f32 scenes; values/gradients match the XLA replay to f32 round-off (the op
order differs inside a bounce), which the tests pin with tolerances.
Semantics cite the same reference lines as replay.py (Raytracer.cs:65-246).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import vecmath as vm
from ..core.color import LUM_B, LUM_G, LUM_R
from .integrator import BounceType, PathTape, _material_matrix

LANES = 128
BM = 8
BLOCK = BM * LANES
C = 14  # material channels (see integrator._material_matrix)
MAX_KERNEL_MATS = 64  # in-kernel gather unrolls over the material table


def _bounce_fwd(i, d, tint, result, g, u, flags, normal, air, ambient,
                ambient_is_miss):
    """One replay bounce (replay.body semantics, Raytracer.cs:65-246).

    Diff inputs: d(3), tint(3), result(3), g(14 planes).  Everything else
    rides the closure.  Returns (d', tint', result', is_miss)."""
    if i % 3 == 0:
        len_d = jnp.sqrt(vm.dot3(d, d))
        d = (d[0] / len_d, d[1] / len_d, d[2] / len_d)

    code = flags & PathTape.CODE_MASK
    inside = (flags & PathTape.FLAG_INSIDE) != 0
    f_live = (flags & PathTape.FLAG_FLIVE) != 0

    emission = (g[0], g[1], g[2])
    diffuse = (g[3], g[4], g[5])
    specular = (g[6], g[7], g[8])
    refraction = (g[9], g[10], g[11])
    ior = g[12]
    shininess = g[13]

    z_shine = jnp.where(jnp.isinf(shininess), 1.0,
                        jnp.exp(u[0] / shininess))
    rough_n = vm.create_horizon3_cs(normal, z_shine, u[1], u[2])
    cos = -vm.dot3(rough_n, d)

    lum = lambda c: LUM_R * c[0] + LUM_G * c[1] + LUM_B * c[2]
    diff_lum = lum(diffuse)
    spec_lum = lum(specular)
    refr_lum = lum(refraction)
    emis_lum = lum(emission)

    ior_in = jnp.where(inside, ior, air)
    ior_out = jnp.where(inside, air, ior)
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

    te = (tint[0] * emission[0], tint[1] * emission[1],
          tint[2] * emission[2])
    terminal = ((code == BounceType.EMISSION)
                | (code == BounceType.SPECULAR_FAIL)
                | (code == BounceType.PURE_BLACK)
                | (code == BounceType.RECURSION_COMPLETE))
    result = vm.where3(terminal, te, result)

    is_miss = code == BounceType.MISSED
    if not ambient_is_miss:
        result = vm.where3(is_miss & (i != 0), ambient, result)

    pick_refr = code == BounceType.TRANSMITTED
    pick_spec = code == BounceType.SPECULAR
    pick_diff = code == BounceType.DIFFUSE
    bounced = pick_refr | pick_spec | pick_diff

    refr_dir = tuple(
        rough_n[k] * (-cos_out) + (d[k] + rough_n[k] * cos) * ior_ratio
        for k in range(3))
    one = jnp.ones_like(cos)
    refr_tint = vm.where3(inside, (one, one, one), refraction)
    spec_dir = vm.reflect3(rough_n, d, cos)
    diff_dir = vm.create_horizon3_cs(normal, u[4], u[5], u[6])

    out_dir = vm.where3(pick_refr, refr_dir,
                        vm.where3(pick_spec, spec_dir, diff_dir))
    new_tint = vm.where3(pick_refr, refr_tint,
                         vm.where3(pick_spec, specular, diffuse))
    comp = jnp.maximum(total_lum, 1.0)
    new_tint = vm.scale3(new_tint, comp)

    d = vm.where3(bounced, out_dir, d)
    tint = vm.where3(bounced,
                     (tint[0] * new_tint[0], tint[1] * new_tint[1],
                      tint[2] * new_tint[2]), tint)
    return d, tint, result, is_miss


def _read_bounce(i, u_ref, fl_ref, nx_ref, ny_ref, nz_ref, pr_ref,
                 matf_ref, n_mats):
    shape = (BM, LANES)
    u = tuple(u_ref[i * 7 + ch].reshape(shape) for ch in range(7))
    flags = fl_ref[i].reshape(shape)
    normal = (nx_ref[i].reshape(shape), ny_ref[i].reshape(shape),
              nz_ref[i].reshape(shape))
    # In-kernel material gather: an unrolled select loop over the (tiny)
    # material table — the XLA prologue's one-hot matmul + transpose + pad
    # chain measured 10.06 ms of the 10.8 ms "kernel" time (the [C, B·R]
    # gathered tensor is 300 MB that never needs to exist).
    prim = pr_ref[i].reshape(shape)
    gs = [jnp.zeros(shape, jnp.float32) for _ in range(C)]
    for row in range(n_mats):
        sel = prim == row
        for c in range(C):
            gs[c] = jnp.where(sel, matf_ref[row, c], gs[c])
    return u, flags, normal, tuple(gs)


def _make_fwd_kernel(n_bounces, ambient_is_miss, n_mats):
    def kernel(dx, dy, dz, u_ref, fl_ref, nx_ref, ny_ref, nz_ref, pr_ref,
               matf_ref, scf, rr_o, rg_o, rb_o, miss_o):
        shape = (BM, LANES)
        air = scf[0, 0]
        ambient = (scf[0, 1], scf[0, 2], scf[0, 3])
        d = (dx[:].reshape(shape), dy[:].reshape(shape),
             dz[:].reshape(shape))
        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        tint = (one, one, one)
        result = (zero, zero, zero)
        miss = jnp.zeros(shape, jnp.int32)
        for i in range(n_bounces):
            u, flags, normal, g = _read_bounce(i, u_ref, fl_ref, nx_ref,
                                               ny_ref, nz_ref, pr_ref,
                                               matf_ref, n_mats)
            d, tint, result, is_miss = _bounce_fwd(
                i, d, tint, result, g, u, flags, normal, air, ambient,
                ambient_is_miss)
            if ambient_is_miss or i == 0:
                miss = miss | is_miss.astype(jnp.int32)
        rr_o[:] = result[0].reshape(-1)
        rg_o[:] = result[1].reshape(-1)
        rb_o[:] = result[2].reshape(-1)
        miss_o[:] = miss.reshape(-1)

    return kernel


def _make_bwd_kernel(n_bounces, ambient_is_miss, n_mats):
    def kernel(dx, dy, dz, u_ref, fl_ref, nx_ref, ny_ref, nz_ref, pr_ref,
               matf_ref, scf, ctr, ctg, ctb, gct_o, scr):
        shape = (BM, LANES)
        air = scf[0, 0]
        ambient = (scf[0, 1], scf[0, 2], scf[0, 3])
        d = (dx[:].reshape(shape), dy[:].reshape(shape),
             dz[:].reshape(shape))
        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        tint = (one, one, one)
        result = (zero, zero, zero)

        # Forward sweep: stash each bounce's entry (d, tint) carry.
        for i in range(n_bounces):
            for j, pl_ in enumerate(d + tint):
                scr[i * 6 + j] = pl_
            u, flags, normal, g = _read_bounce(i, u_ref, fl_ref, nx_ref,
                                               ny_ref, nz_ref, pr_ref,
                                               matf_ref, n_mats)
            d, tint, result, _ = _bounce_fwd(
                i, d, tint, result, g, u, flags, normal, air, ambient,
                ambient_is_miss)

        # Reverse sweep: per-bounce vjp traced into the kernel.
        zero3 = (zero, zero, zero)
        d_ct = zero3
        t_ct = zero3
        r_ct = (ctr[:].reshape(shape), ctg[:].reshape(shape),
                ctb[:].reshape(shape))
        for i in reversed(range(n_bounces)):
            u, flags, normal, g = _read_bounce(i, u_ref, fl_ref, nx_ref,
                                               ny_ref, nz_ref, pr_ref,
                                               matf_ref, n_mats)
            d_i = tuple(scr[i * 6 + j] for j in range(3))
            tint_i = tuple(scr[i * 6 + 3 + j] for j in range(3))

            def f(d3, tint3, result3, g14, i=i, u=u, flags=flags,
                  normal=normal):
                d2, t2, r2, _ = _bounce_fwd(i, d3, tint3, result3, g14, u,
                                            flags, normal, air, ambient,
                                            ambient_is_miss)
                return d2, t2, r2

            _, vjp_fn = jax.vjp(f, d_i, tint_i, zero3, g)
            d_ct, t_ct, r_ct, g_ct = vjp_fn((d_ct, t_ct, r_ct))
            for c in range(C):
                gct_o[i * C + c] = g_ct[c]

    return kernel


def _specs(m, n_bounces, n_mats):
    ray_spec = pl.BlockSpec((BLOCK,), lambda i: (i,))
    u_spec = pl.BlockSpec((n_bounces * 7, BM, LANES), lambda i: (0, i, 0))
    b_spec = pl.BlockSpec((n_bounces, BM, LANES), lambda i: (0, i, 0))
    matf_spec = pl.BlockSpec((n_mats, C), lambda i: (0, 0))
    scf_spec = pl.BlockSpec((1, 4), lambda i: (0, 0))
    gct_spec = pl.BlockSpec((n_bounces * C, BM, LANES),
                            lambda i: (0, i, 0))
    return ray_spec, u_spec, b_spec, matf_spec, scf_spec, gct_spec


@functools.partial(jax.jit, static_argnames=("n_bounces", "ambient_is_miss",
                                             "interpret"))
def _run_fwd(d3, u, fl, nx, ny, nz, pr, matf, scf, *, n_bounces,
             ambient_is_miss, interpret):
    m = d3[0].shape[0] // LANES
    n_mats = matf.shape[0]
    ray_spec, u_spec, b_spec, matf_spec, scf_spec, _ = _specs(
        m, n_bounces, n_mats)
    R = d3[0].shape[0]
    f32 = jax.ShapeDtypeStruct((R,), jnp.float32)
    i32 = jax.ShapeDtypeStruct((R,), jnp.int32)
    return pl.pallas_call(
        _make_fwd_kernel(n_bounces, ambient_is_miss, n_mats),
        grid=(m // BM,),
        in_specs=[ray_spec] * 3 + [u_spec, b_spec, b_spec, b_spec, b_spec,
                                   b_spec, matf_spec, scf_spec],
        out_specs=(ray_spec,) * 4,
        out_shape=(f32, f32, f32, i32),
        interpret=interpret,
    )(*d3, u, fl, nx, ny, nz, pr, matf, scf)


@functools.partial(jax.jit, static_argnames=("n_bounces", "ambient_is_miss",
                                             "interpret"))
def _run_bwd(d3, u, fl, nx, ny, nz, pr, matf, scf, ct3, *, n_bounces,
             ambient_is_miss, interpret):
    m = d3[0].shape[0] // LANES
    n_mats = matf.shape[0]
    ray_spec, u_spec, b_spec, matf_spec, scf_spec, gct_spec = _specs(
        m, n_bounces, n_mats)
    R = d3[0].shape[0]
    return pl.pallas_call(
        _make_bwd_kernel(n_bounces, ambient_is_miss, n_mats),
        grid=(m // BM,),
        in_specs=[ray_spec] * 3 + [u_spec, b_spec, b_spec, b_spec, b_spec,
                                   b_spec, matf_spec, scf_spec]
        + [ray_spec] * 3,
        out_specs=gct_spec,
        out_shape=jax.ShapeDtypeStruct((n_bounces * C, R // LANES, LANES),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_bounces * 6, BM, LANES),
                                   jnp.float32)],
        interpret=interpret,
    )(*d3, u, fl, nx, ny, nz, pr, matf, scf, *ct3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _shade(d3, u, fl, nx, ny, nz, pr, matf, scf, n_bounces,
           ambient_is_miss, interpret):
    out = _run_fwd(d3, u, fl, nx, ny, nz, pr, matf, scf,
                   n_bounces=n_bounces, ambient_is_miss=ambient_is_miss,
                   interpret=interpret)
    return out


def _shade_fwd(d3, u, fl, nx, ny, nz, pr, matf, scf, n_bounces,
               ambient_is_miss, interpret):
    out = _shade(d3, u, fl, nx, ny, nz, pr, matf, scf, n_bounces,
                 ambient_is_miss, interpret)
    return out, (d3, u, fl, nx, ny, nz, pr, matf, scf)


def _bwd_core(n_bounces, ambient_is_miss, interpret, res, ct3):
    """Shared backward: bwd kernel + one-hot scatter-add to the material
    table.  Returns cotangents for (d3, u, fl, nx, ny, nz, pr, matf, scf)."""
    d3, u, fl, nx, ny, nz, pr, matf, scf = res
    g_ct = _run_bwd(d3, u, fl, nx, ny, nz, pr, matf, scf, ct3,
                    n_bounces=n_bounces, ambient_is_miss=ambient_is_miss,
                    interpret=interpret)
    # Scatter-add back to the material table: per-bounce [C, Rp] @ [Rp, N]
    # one-hot matmuls summed (the one-hot fuses into the matmul; HIGHEST
    # so the summed cotangents stay exact row copies; per-bounce avoids a
    # [B·C, Rp] transpose relayout of the whole cotangent tensor).
    n = matf.shape[0]
    Rp = d3[0].shape[0]
    g_ct_b = g_ct.reshape(n_bounces, C, Rp)
    rows = jnp.arange(n, dtype=jnp.int32)
    acc = jnp.zeros((C, n), jnp.float32)
    for i in range(n_bounces):
        onehot_i = (pr[i].reshape(-1)[:, None] == rows[None, :]
                    ).astype(jnp.float32)
        acc = acc + jnp.matmul(g_ct_b[i], onehot_i,
                               precision=jax.lax.Precision.HIGHEST)
    matf_ct = acc.T  # [N, C]
    zeros_like = jax.tree.map(jnp.zeros_like, (d3, u, fl, nx, ny, nz))
    return zeros_like + (jnp.zeros_like(pr), matf_ct,
                         jnp.zeros_like(scf))


def _shade_bwd(n_bounces, ambient_is_miss, interpret, res, ct):
    return _bwd_core(n_bounces, ambient_is_miss, interpret, res, ct[:3])


_shade.defvjp(_shade_fwd, _shade_bwd)


# --- Record-as-primal (round 5) --------------------------------------------
# The megakernel RECORDING pass already produced this batch's (color, miss)
# — the replay forward recomputes them from the tape to f32 round-off (the
# equivalence the tests pin), so on the train path the fwd kernel is pure
# overhead (~6.4 ms of the 33.5 ms step, docs/TRAIN_STEP.md).  This
# custom_vjp passes the recorder's color through as the primal and runs
# ONLY the backward kernel; gradients are identical to _shade's (the bwd
# kernel re-runs its own forward sweep from the tape either way).

@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _shade_recorded(rgb3, d3, u, fl, nx, ny, nz, pr, matf, scf,
                    n_bounces, ambient_is_miss, interpret):
    return rgb3


def _shade_recorded_fwd(rgb3, d3, u, fl, nx, ny, nz, pr, matf, scf,
                        n_bounces, ambient_is_miss, interpret):
    return rgb3, (d3, u, fl, nx, ny, nz, pr, matf, scf)


def _shade_recorded_bwd(n_bounces, ambient_is_miss, interpret, res, ct):
    # The primal input passes through unchanged, so its true cotangent is
    # ``ct`` itself (identity) — the recorder's color is stop_grad'd
    # upstream, so this terminates there.
    return (ct,) + _bwd_core(n_bounces, ambient_is_miss, interpret, res, ct)


_shade_recorded.defvjp(_shade_recorded_fwd, _shade_recorded_bwd)


def replay_fused(scene, ray_o, ray_d, uniforms, tape: PathTape,
                 interpret=None, grad_axis=None, primal=None):
    """Kernel-backed drop-in for :func:`.replay.replay` (f32 path).

    The material gather is one XLA one-hot matmul over all bounces (its
    autodiff transpose is the scatter-add back to the material table); the
    shading chain forward/backward runs in the Pallas kernels above.
    ``grad_axis``: as in replay.replay — the material cotangent is psum'd
    across the named mesh axis (one bucket; the per-bounce overlapped
    schedule stays on the XLA replay path).

    ``primal``: optional ``(color [R, 3], miss [R] bool)`` from the
    recording pass itself.  When given, the forward kernel is SKIPPED —
    the recorder's color rides through a pass-through custom_vjp and only
    the backward kernel runs (the round-5 train-step lever: the replay
    forward recomputes, to f32 round-off, values the megakernel recorder
    already produced).  Gradients are identical either way.
    """
    from .replay import _allreduce_in_bwd

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = ray_o.shape[0]
    B = scene.recursion + 1
    pad = (-R) % BLOCK
    Rp = R + pad

    matf = _material_matrix(scene.materials).astype(jnp.float32)  # [N, C]
    if grad_axis is not None:
        matf = _allreduce_in_bwd(matf, grad_axis)
    n = matf.shape[0]
    if n > MAX_KERNEL_MATS:
        raise ValueError(
            f"replay_fused kernel path supports material tables up to "
            f"{MAX_KERNEL_MATS} rows (got {n}); use replay.replay")

    pz = lambda a: jnp.pad(a.astype(jnp.float32), (0, pad))
    # Pad directions with +x (a zero direction NaNs the i%3 renormalize's
    # divide, and forward NaN on pad lanes poisons their cotangents even
    # under zero seeds).
    d3 = (jnp.pad(ray_d[:, 0].astype(jnp.float32), (0, pad),
                  constant_values=1.0),
          pz(ray_d[:, 1]), pz(ray_d[:, 2]))
    # Pad uniforms with -1, NOT 0: ch0 is ln(U) and a 0 pad makes
    # z_shine = exp(0/shininess) = NaN whenever material row 0 (the pad
    # prim) has shininess exactly 0 — the NaN survives zero cotangent
    # seeds in the backward kernel and the one-hot scatter matmul adds it
    # into row 0's gradient.  ln(U) < 0 for every real draw (uniform
    # excludes 1.0), so -1 is in-distribution; the other channels ignore
    # their pad values on SKIPPED lanes.
    u = jnp.pad(uniforms.astype(jnp.float32).reshape(B * 7, R),
                ((0, 0), (0, pad)),
                constant_values=-1.0).reshape(B * 7, Rp // LANES, LANES)
    pb = lambda a: jnp.pad(a, ((0, 0), (0, pad))).reshape(
        B, Rp // LANES, LANES)
    fl = pb(tape.flags)
    pr = pb(jnp.maximum(tape.prim, 0))
    nx, ny, nz = (pb(a.astype(jnp.float32))
                  for a in (tape.nx, tape.ny, tape.nz))
    scf = jnp.concatenate([
        scene.air_refractive_index.reshape(1).astype(jnp.float32),
        scene.ambient_rgb.reshape(3).astype(jnp.float32)]).reshape(1, 4)

    if primal is not None:
        p_color, p_miss = primal
        rgb3 = tuple(pz(jax.lax.stop_gradient(p_color[:, k]))
                     for k in range(3))
        rr, rg, rb = _shade_recorded(rgb3, d3, u, fl, nx, ny, nz, pr,
                                     matf, scf, B,
                                     bool(scene.ambient_is_miss),
                                     bool(interpret))
        color = jnp.stack([rr[:R], rg[:R], rb[:R]],
                          axis=1).astype(ray_o.dtype)
        return color, jax.lax.stop_gradient(p_miss)
    rr, rg, rb, miss = _shade(d3, u, fl, nx, ny, nz, pr, matf, scf, B,
                              bool(scene.ambient_is_miss), bool(interpret))
    color = jnp.stack([rr[:R], rg[:R], rb[:R]], axis=1).astype(ray_o.dtype)
    return color, miss[:R] != 0
