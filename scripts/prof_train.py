"""Profile the fwd+bwd train step, term by term (VERDICT r2 #1).

Breaks the train step into its stages and times each jitted in isolation:

  1. forward render (megakernel trace_fused)         — the floor
  2. tape record     (trace_fused want_tape=True)    — stage 1 of replay
  3. replay fwd      (remat on / off)                — stage 2, no grad
  4. replay fwd+bwd  (value_and_grad of image loss)  — the gradient cost
  5. full train step (record + replay + loss + adam) — what bench.py times

Usage:  python scripts/prof_train.py [scene.txt] [size]
"""

import sys
import time

sys.path.insert(0, ".")

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
    import optax

    from raytracercore_tpu.diff import (get_material_params,
                                        with_material_params)
    from raytracercore_tpu.parallel.shard import make_train_step
    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.render import fused
    from raytracercore_tpu.render.integrator import prepare_uniforms
    from raytracercore_tpu.render.replay import replay
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

    # One jitted setup program (eager ops on the remote axon backend each
    # cost a round-trip compile).
    @jax.jit
    def setup():
        px, py = cam_mod.pixel_grid(size, size)
        k_cam, k_path = jax.random.split(jax.random.PRNGKey(0))
        o, d = cam_mod.camera_rays(cam, px, py, k_cam)
        return o, d, prepare_uniforms(k_path, R, B, jnp.float32)

    o, d, uniforms = setup()
    t_uni = bench(lambda: setup())
    log("setup (rays+uniforms)       %7.2f ms" % t_uni)

    log(f"scene={scene_path} size={size} R={R} B={B}")

    # 1. plain forward (no tape)
    f_fwd = jax.jit(lambda: fused.trace_fused(arrays, o, d, None,
                                              uniforms=uniforms))
    log("fwd (megakernel, no tape)   %7.2f ms" % bench(f_fwd))

    # 2. tape record
    f_rec = jax.jit(lambda: fused.trace_fused(arrays, o, d, None,
                                              uniforms=uniforms,
                                              want_tape=True))
    t_rec = bench(f_rec)
    log("tape record (megakernel)    %7.2f ms" % t_rec)
    tape = jax.tree.map(jax.lax.stop_gradient, f_rec()[2])
    tape = jax.tree.map(lambda x: x.block_until_ready(), tape)

    # 3. replay forward
    f_rp1 = jax.jit(lambda: replay(arrays, o, d, uniforms, tape, remat=True))
    log("replay fwd (remat=True)     %7.2f ms" % bench(f_rp1))
    f_rp0 = jax.jit(lambda: replay(arrays, o, d, uniforms, tape,
                                   remat=False))
    log("replay fwd (remat=False)    %7.2f ms" % bench(f_rp0))

    # 4. replay fwd+bwd: grad of mean image loss wrt material params
    params = get_material_params(arrays)
    target = jnp.zeros((R, 3), jnp.float32)

    def loss_fn(p, remat):
        s = with_material_params(arrays, p)
        color, miss = replay(s, o, d, uniforms, tape, remat=remat)
        img = jnp.where(miss[:, None], 0.0, color)
        return jnp.mean((img - target) ** 2)

    for remat in (True, False):
        f_vg = jax.jit(lambda p, r=remat: jax.value_and_grad(
            lambda q: loss_fn(q, r))(p))
        try:
            ms = bench(lambda: f_vg(params))
            log(f"replay fwd+bwd (remat={remat!s:5})%7.2f ms" % ms)
        except Exception as e:  # noqa: BLE001
            log(f"replay fwd+bwd (remat={remat}) FAILED: {e}")

    # 4b. Pallas replay kernel (replay_kernel.py)
    from raytracercore_tpu.render.replay_kernel import replay_fused
    f_rk = jax.jit(lambda: replay_fused(arrays, o, d, uniforms, tape))
    try:
        log("replay-kernel fwd           %7.2f ms" % bench(f_rk))
    except Exception as e:  # noqa: BLE001
        log(f"replay-kernel fwd FAILED: {e}")

    def loss_k(p):
        s = with_material_params(arrays, p)
        color, miss = replay_fused(s, o, d, uniforms, tape)
        img = jnp.where(miss[:, None], 0.0, color)
        return jnp.mean((img - target) ** 2)

    f_vgk = jax.jit(lambda p: jax.value_and_grad(loss_k)(p))
    try:
        log("replay-kernel fwd+bwd       %7.2f ms" % bench(
            lambda: f_vgk(params)))
    except Exception as e:  # noqa: BLE001
        log(f"replay-kernel fwd+bwd FAILED: {e}")

    # 5. full train step (what bench.py measures)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    tgt_img = jnp.zeros((size, size, 3), jnp.float32)
    step = make_train_step(None, optimizer)
    state = {"p": params, "o": opt_state}

    def one_step():
        p, os_, loss = step(state["p"], arrays, cam, tgt_img, state["o"],
                            jax.random.PRNGKey(0))
        state["p"], state["o"] = p, os_
        return loss

    log("full train step             %7.2f ms" % bench(one_step))


if __name__ == "__main__":
    main()
