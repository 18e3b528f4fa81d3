"""Attribute replay_fused time: XLA prologue (gather matmul + reshapes)
vs the fwd kernel vs the bwd kernel, each timed with device-resident
pre-computed inputs."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.render import fused
from raytracercore_tpu.render import replay_kernel as rk
from raytracercore_tpu.render.integrator import (_material_matrix,
                                                 prepare_uniforms)
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
C = rk.C
LANES = rk.LANES
pad = (-R) % rk.BLOCK
Rp = R + pad


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


@jax.jit
def prologue():
    matm_T = _material_matrix(arrays.materials).T.astype(jnp.float32)
    prim_flat = jnp.maximum(tape.prim.reshape(-1), 0)
    n = matm_T.shape[1]
    onehot_T = (jnp.arange(n, dtype=jnp.int32)[:, None]
                == prim_flat[None, :]).astype(jnp.float32)
    g_flat = jnp.matmul(matm_T, onehot_T,
                        precision=jax.lax.Precision.HIGHEST)
    g = g_flat.reshape(C, B, R).transpose(1, 0, 2).reshape(B * C, R)
    g = jnp.pad(g, ((0, 0), (0, pad))).reshape(B * C, Rp // LANES, LANES)
    pz = lambda a: jnp.pad(a.astype(jnp.float32), (0, pad))
    d3 = tuple(pz(d[:, k]) for k in range(3))
    u = jnp.pad(uniforms.astype(jnp.float32).reshape(B * 7, R),
                ((0, 0), (0, pad))).reshape(B * 7, Rp // LANES, LANES)
    pb = lambda a: jnp.pad(a, ((0, 0), (0, pad))).reshape(
        B, Rp // LANES, LANES)
    fl = pb(tape.flags)
    nx, ny, nz = (pb(a.astype(jnp.float32))
                  for a in (tape.nx, tape.ny, tape.nz))
    scf = jnp.concatenate([
        arrays.air_refractive_index.reshape(1).astype(jnp.float32),
        arrays.ambient_rgb.reshape(3).astype(jnp.float32)]).reshape(1, 4)
    return d3, u, fl, nx, ny, nz, g, scf


def bench(fn, n=5):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    return (time.perf_counter() - t0) / n * 1e3


inputs = prologue()
inputs = jax.tree.map(lambda x: x.block_until_ready(), inputs)
print(f"prologue            {bench(prologue):7.2f} ms", flush=True)

d3, u, fl, nx, ny, nz, g, scf = inputs
f_fwd = jax.jit(lambda: rk._run_fwd(d3, u, fl, nx, ny, nz, g, scf,
                                    n_bounces=B, ambient_is_miss=False,
                                    interpret=False))
print(f"fwd kernel only     {bench(f_fwd):7.2f} ms", flush=True)

ct3 = tuple(jnp.ones((Rp,), jnp.float32) for _ in range(3))
f_bwd = jax.jit(lambda: rk._run_bwd(d3, u, fl, nx, ny, nz, g, scf, ct3,
                                    n_bounces=B, ambient_is_miss=False,
                                    interpret=False))
print(f"bwd kernel only     {bench(f_bwd):7.2f} ms", flush=True)
