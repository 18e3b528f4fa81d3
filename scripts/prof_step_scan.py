"""Device-true train-step attribution (round 5).

The axon remote tunnel costs ~4.4 ms of BLOCKING host overhead per jitted
call (measured: a (8,128) `x+1` program takes 4.39 ms steady-state), so
per-call wall timings overstate every stage by that constant and hide
which stages actually dominate the device.  This harness times each stage
as a ``lax.scan`` of K=5 iterations inside ONE jitted call (key folded per
iteration, outputs carried so nothing is dead-code-eliminated) and reports
(wall - overhead) / K — the number the device actually spends.

Usage: python scripts/prof_step_scan.py [scene.txt] [size]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K = 5


def log(s):
    print(s, flush=True)


def sync(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def walltime(fn, n=3):
    sync(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def scan_bench(body, overhead_ms):
    """body(key) -> pytree; returns device ms per iteration."""

    @jax.jit
    def run(key):
        def step(carry, i):
            out = body(jax.random.fold_in(key, i))
            # Carry a scalar so every iteration's work is live.
            s = sum(jnp.sum(jnp.asarray(l).ravel()[:1].astype(jnp.float32))
                    for l in jax.tree.leaves(out))
            return carry + s, ()

        tot, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K))
        return tot

    key = jax.random.PRNGKey(0)
    return (walltime(lambda: run(key)) - overhead_ms) / K


def main():
    import optax

    from raytracercore_tpu.diff import (get_material_params,
                                        with_material_params)
    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.render import fused
    from raytracercore_tpu.render.integrator import prepare_uniforms
    from raytracercore_tpu.render.replay import trace_replay
    from raytracercore_tpu.render.uniforms_kernel import (
        prepare_uniforms_kernel)
    from raytracercore_tpu.scene import loader
    from raytracercore_tpu.scene.types import freeze_scene, init_camera

    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/Scenes/bounce.txt"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 700
    scene = loader.from_file(scene_path)
    scene.width = scene.height = size
    scene.recursion = 10
    arrays = freeze_scene(scene)
    cam = init_camera(scene.cameras[0], size, size)
    R, B = size * size, scene.recursion + 1

    tiny = jnp.ones((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    overhead = walltime(lambda: f_tiny(tiny))
    log(f"dispatch overhead            {overhead:7.2f} ms (subtracted)")

    log("uniforms kernel              %7.2f ms" % scan_bench(
        lambda k: prepare_uniforms_kernel(k, R, B), overhead))
    log("uniforms XLA threefry        %7.2f ms" % scan_bench(
        lambda k: prepare_uniforms(k, R, B), overhead))

    def cam_rays(k):
        px, py = cam_mod.pixel_grid(size, size)
        return cam_mod.camera_rays(cam, px, py, k)

    log("camera rays                  %7.2f ms" % scan_bench(
        cam_rays, overhead))

    o, d = jax.jit(cam_rays)(jax.random.PRNGKey(1))
    u0 = prepare_uniforms_kernel(jax.random.PRNGKey(2), R, B)

    log("fwd megakernel (no tape)     %7.2f ms" % scan_bench(
        lambda k: fused.trace_fused(arrays, o, d, None, uniforms=u0)[0],
        overhead))
    log("tape record    (megakernel)  %7.2f ms" % scan_bench(
        lambda k: fused.trace_fused(arrays, o, d, None, uniforms=u0,
                                    want_tape=True)[0], overhead))

    params = get_material_params(arrays)
    target = jnp.zeros((R, 3), jnp.float32)

    def vg(k):
        def loss_fn(p):
            s = with_material_params(arrays, p)
            color, miss = trace_replay(s, o, d, k)
            img = jnp.where(miss[:, None], 0.0, color)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    log("value_and_grad (r+u+rec+bwd) %7.2f ms" % scan_bench(vg, overhead))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def full_step(k):
        def loss_fn(p):
            s = with_material_params(arrays, p)
            px, py = cam_mod.pixel_grid(size, size)
            k_cam, k_path = jax.random.split(k)
            ro, rd = cam_mod.camera_rays(cam, px, py, k_cam)
            color, miss = trace_replay(s, ro, rd, k_path)
            img = jnp.where(miss[:, None], 0.0, color)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    log("FULL train step (scan)       %7.2f ms" % scan_bench(
        full_step, overhead))


if __name__ == "__main__":
    main()
