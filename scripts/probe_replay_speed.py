"""Time the Pallas replay kernels (fwd / fwd+bwd) at 700² rec10 with a
configurable rays-per-grid-step (BM) — per-grid-step overhead attribution.

Usage: python scripts/probe_replay_speed.py [BM]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from raytracercore_tpu.render import replay_kernel as rk

if len(sys.argv) > 1:
    rk.BM = int(sys.argv[1])
    rk.BLOCK = rk.BM * rk.LANES

from raytracercore_tpu.diff import get_material_params, with_material_params
from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.render import fused
from raytracercore_tpu.render.integrator import prepare_uniforms
from raytracercore_tpu.scene import loader
from raytracercore_tpu.scene.types import freeze_scene, init_camera

size = 700
scene = loader.from_file("/root/reference/Scenes/bounce.txt")
scene.width = scene.height = size
scene.recursion = 10
arrays = freeze_scene(scene)
cam = init_camera(scene.cameras[0], size, size)
R = size * size
B = 11


@jax.jit
def setup():
    px, py = cam_mod.pixel_grid(size, size)
    k_cam, k_path = jax.random.split(jax.random.PRNGKey(0))
    o, d = cam_mod.camera_rays(cam, px, py, k_cam)
    return o, d, prepare_uniforms(k_path, R, B, jnp.float32)


o, d, uniforms = setup()
tape = jax.tree.map(jax.lax.stop_gradient, jax.jit(
    lambda: fused.trace_fused(arrays, o, d, None, uniforms=uniforms,
                              want_tape=True))()[2])
jax.block_until_ready(tape.prim)


def bench(fn, n=5):
    out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    return (time.perf_counter() - t0) / n * 1e3


f_rk = jax.jit(lambda: rk.replay_fused(arrays, o, d, uniforms, tape))
print(f"BM={rk.BM}  fwd   {bench(f_rk):7.2f} ms", flush=True)

params = get_material_params(arrays)


def loss_k(p):
    s = with_material_params(arrays, p)
    color, miss = rk.replay_fused(s, o, d, uniforms, tape)
    img = jnp.where(miss[:, None], 0.0, color)
    return jnp.mean(img ** 2)


f_vgk = jax.jit(lambda p: jax.value_and_grad(loss_k)(p))
print(f"BM={rk.BM}  fwd+bwd {bench(lambda: f_vgk(params)):7.2f} ms",
      flush=True)
