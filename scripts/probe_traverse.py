"""Quick compile+run probe of the Pallas BVH traversal on the live backend."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from raytracercore_tpu.bvh.builder import build_triangle_bvh
from raytracercore_tpu.bvh.pallas_traverse import PallasBVH
from raytracercore_tpu.bvh.traverse import traverse_closest
from raytracercore_tpu.core import vecmath as vm
from raytracercore_tpu.intersect.dispatch import _position_eps
from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.scene.meshgen import make_mesh_scene
from raytracercore_tpu.scene.types import init_camera

grid, subdiv, size = (int(a) for a in (sys.argv[1:4] or [2, 1, 32]))
arrays, host_cam, (v0, e1, e2, mirror, valid) = make_mesh_scene(
    grid=grid, subdiv=subdiv, width=size, height=size)
bvh = build_triangle_bvh(v0, e1, e2, mirror, valid, leaf_size=8)
pb = PallasBVH(bvh, arrays.triangles, arrays.materials, arrays.n_prims)
print(f"tris={v0.shape[0]} nodes={pb.n_nodes} K={pb.K} "
      f"rays={size*size}", flush=True)

camera = init_camera(host_cam, size, size)
px, py = cam_mod.pixel_grid(size, size)
o, d = cam_mod.center_rays(camera, px, py)
eps_b, eps_p = vm.near_enough(o.dtype), _position_eps(o.dtype)

t0 = time.perf_counter()
rows, any_, _t = pb.select(o, d, None, eps_b, eps_p)
rows_h = jax.device_get(rows)
print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
for _ in range(5):
    rows, any_, _t = pb.select(o, d, None, eps_b, eps_p)
rows_h = jax.device_get(rows)
dt = (time.perf_counter() - t0) / 5
R = size * size
print(f"steady: {dt*1e3:.2f} ms, {R/dt/1e6:.2f}M rays/sec", flush=True)

ref_idx, _ = jax.jit(lambda o, d: traverse_closest(
    bvh, arrays.triangles, arrays.materials, o, d, None, eps_b, eps_p))(o, d)
import numpy as np

got = np.where(np.asarray(any_), rows_h, -1)
agree = (got == np.asarray(ref_idx)).mean()
print(f"agreement vs XLA traversal: {agree:.5f}", flush=True)
