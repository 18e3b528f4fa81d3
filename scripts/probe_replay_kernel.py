"""Correctness probe: Pallas replay kernel vs XLA replay (values + grads)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from raytracercore_tpu.diff import get_material_params, with_material_params
from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.render.integrator import prepare_uniforms
from raytracercore_tpu.render.replay import record_tape, replay
from raytracercore_tpu.render.replay_kernel import replay_fused
from raytracercore_tpu.scene import loader
from raytracercore_tpu.scene.types import freeze_scene, init_camera

size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
scene = loader.from_file("/root/reference/Scenes/bounce.txt")
scene.width = scene.height = size
scene.recursion = int(sys.argv[2]) if len(sys.argv) > 2 else 10
arrays = freeze_scene(scene)
camera = init_camera(scene.cameras[0], size, size)
px, py = cam_mod.pixel_grid(size, size)
key = jax.random.PRNGKey(3)
k_cam, k_path = jax.random.split(key)
ray_o, ray_d = cam_mod.camera_rays(camera, px, py, k_cam)
uniforms = prepare_uniforms(k_path, ray_o.shape[0], arrays.recursion + 1)
tape = jax.jit(lambda: record_tape(arrays, ray_o, ray_d, uniforms))()

c_ref, m_ref = jax.jit(lambda: replay(arrays, ray_o, ray_d, uniforms,
                                      tape))()
c_k, m_k = jax.jit(lambda: replay_fused(arrays, ray_o, ray_d, uniforms,
                                        tape))()
err = float(jnp.max(jnp.abs(c_ref - c_k)))
merr = float(jnp.mean(m_ref != m_k))
print(f"fwd: max |dc| = {err:.3e}  miss mismatch = {merr:.5f}", flush=True)

params = get_material_params(arrays)


def loss_with(replay_fn):
    def f(p):
        s = with_material_params(arrays, p)
        c, m = replay_fn(s, ray_o, ray_d, uniforms, tape)
        img = jnp.where(m[:, None], 0.0, c)
        return jnp.mean(img ** 2)
    return f


g_ref = jax.jit(jax.grad(loss_with(replay)))(params)
g_k = jax.jit(jax.grad(loss_with(replay_fused)))(params)
for k in g_ref:
    a, b = np.asarray(g_ref[k]), np.asarray(g_k[k])
    scale = np.abs(a).max() + 1e-12
    print(f"grad[{k:17s}] max rel err = {np.abs(a-b).max()/scale:.3e} "
          f"(|g|max {scale:.3e})", flush=True)
