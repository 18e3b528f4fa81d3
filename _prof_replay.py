import time, jax, jax.numpy as jnp
from raytracercore_tpu.scene import loader
from raytracercore_tpu.scene.types import freeze_scene, init_camera
from raytracercore_tpu.render.integrator import prepare_uniforms
import raytracercore_tpu.render.integrator as integ
from raytracercore_tpu.render import fused, camera as cam_mod
from raytracercore_tpu.render.replay import replay
def log(s): print(s, flush=True)

SIZE=700
scene = loader.from_file("/root/reference/Scenes/bounce.txt")
scene.width=scene.height=SIZE; scene.recursion=10
arrays = freeze_scene(scene)
cam = init_camera(scene.cameras[0], SIZE, SIZE)
px, py = cam_mod.pixel_grid(SIZE, SIZE)
k_cam, k_path = jax.random.split(jax.random.PRNGKey(0))
o, d = cam_mod.camera_rays(cam, px, py, k_cam)
uniforms = prepare_uniforms(k_path, o.shape[0], 11, jnp.float32)

def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].reshape(-1)[:1]))
def bench(fn, n=5):
    out=fn(); sync(out); out=fn(); sync(out)
    t0=time.perf_counter()
    for _ in range(n): out=fn()
    sync(out)
    return (time.perf_counter()-t0)/n*1e3

t0=time.perf_counter()
tape = jax.jit(lambda: fused.trace_fused(arrays, o, d, None, uniforms=uniforms, want_tape=True))()[2]
tape = jax.tree.map(lambda x: x.block_until_ready(), tape)
log("tape done %.1fs" % (time.perf_counter()-t0))

f1 = jax.jit(lambda: replay(arrays, o, d, uniforms, tape, remat=True))
log("replay fwd remat=True   %.2f ms" % bench(f1))
f2 = jax.jit(lambda: replay(arrays, o, d, uniforms, tape, remat=False))
log("replay fwd remat=False  %.2f ms" % bench(f2))
integ.ONEHOT_MAX_ROWS = 0
f3 = jax.jit(lambda: replay(arrays, o, d, uniforms, tape, remat=False))
log("replay fwd take-gather  %.2f ms" % bench(f3))
