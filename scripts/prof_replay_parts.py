"""Attribute the replay-forward cost (scripts/prof_train.py showed replay
fwd = 3x the full megakernel forward).  Times ablated variants of
render.replay.replay plus gather microbenchmarks.

Usage: python scripts/prof_replay_parts.py [scene.txt] [size]
"""

import sys
import time

import jax
import jax.numpy as jnp


def log(s):
    print(s, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def bench(fn, n=5):
    out = fn(); sync(out); out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import raytracercore_tpu.render.integrator as integ
    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.render import fused, replay as rp
    from raytracercore_tpu.render.integrator import prepare_uniforms
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
    R = size * size
    B = scene.recursion + 1

    @jax.jit
    def setup():
        px, py = cam_mod.pixel_grid(size, size)
        k_cam, k_path = jax.random.split(jax.random.PRNGKey(0))
        o, d = cam_mod.camera_rays(cam, px, py, k_cam)
        return o, d, prepare_uniforms(k_path, R, B, jnp.float32)

    o, d, uniforms = setup()
    tape = jax.jit(lambda: fused.trace_fused(
        arrays, o, d, None, uniforms=uniforms, want_tape=True))()[2]
    tape = jax.tree.map(jax.lax.stop_gradient, tape)
    sync(tape.prim)

    f0 = jax.jit(lambda: rp.replay(arrays, o, d, uniforms, tape,
                                   remat=False))
    log("replay fwd baseline         %7.2f ms" % bench(f0))

    # cost analysis of the compiled baseline
    try:
        comp = jax.jit(lambda: rp.replay(arrays, o, d, uniforms, tape,
                                         remat=False)).lower().compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log("cost_analysis: flops=%.3g bytes=%.3g transcendentals=%.3g" % (
            ca.get("flops", -1), ca.get("bytes accessed", -1),
            ca.get("transcendentals", -1)))
    except Exception as e:  # noqa: BLE001
        log(f"cost_analysis failed: {e}")

    # take-gather instead of one-hot matmul
    old = integ.ONEHOT_MAX_ROWS
    integ.ONEHOT_MAX_ROWS = 0
    f1 = jax.jit(lambda: rp.replay(arrays, o, d, uniforms, tape,
                                   remat=False))
    log("replay fwd take-gather      %7.2f ms" % bench(f1))
    integ.ONEHOT_MAX_ROWS = old

    # gather microbenchmark: 4 one-hot gathers x 11 bounces, nothing else
    matm, tfm, sfm, pfm = rp._pack_replay(arrays)
    prim0 = jnp.maximum(tape.prim[0], 0)

    @jax.jit
    def gathers_only():
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(B):
            idx = jnp.maximum(tape.prim[i], 0)
            g = integ.gather_rows(matm, idx)
            rows = g[:, 16:19].astype(jnp.int32)
            t = integ.gather_rows(tfm, rows[:, 0])
            s = integ.gather_rows(sfm, rows[:, 1])
            p = integ.gather_rows(pfm, rows[:, 2])
            acc = acc + g[:, 0] + t[:, 0] + s[:, 0] + p[:, 0]
        return acc

    log("44 one-hot gathers only     %7.2f ms" % bench(gathers_only))

    # single [N, 84] packed-table variant: 11 gathers total
    packed = jnp.concatenate([
        matm,
        jnp.zeros((matm.shape[0], 65), jnp.float32)], axis=1)

    @jax.jit
    def gathers_packed():
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(B):
            idx = jnp.maximum(tape.prim[i], 0)
            g = integ.gather_rows(packed, idx)
            acc = acc + g[:, 0]
        return acc

    log("11 packed gathers only      %7.2f ms" % bench(gathers_packed))

    # transcendental-free shading probe: replay body minus the evals
    from raytracercore_tpu.render.replay import _pack_replay

    @jax.jit
    def no_evals():
        # same loop structure, winner eval replaced by pass-through
        matm_, *_ = _pack_replay(arrays)

        def body(i, carry):
            o_, d_, tint, result = carry
            idx = jnp.maximum(tape.prim[i], 0)
            g = integ.gather_rows(matm_, idx)
            mat = integ._split_material(g)
            emission = mat["emission"]
            te = tint * emission
            result = result + te
            tint = tint * mat["diffuse"]
            return o_, d_, tint, result

        init = (o, d, jnp.ones((R, 3), jnp.float32),
                jnp.zeros((R, 3), jnp.float32))
        _, _, _, result = jax.lax.fori_loop(0, B, body, init)
        return result

    log("loop: 1 gather + tint only  %7.2f ms" % bench(no_evals))


if __name__ == "__main__":
    main()
