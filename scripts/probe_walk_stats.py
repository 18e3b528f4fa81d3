"""Octo-walk traversal attribution probe: per-block iteration/visit/leaf
counters from the kernel's stats outputs, on primary and secondary-bounce
wavefronts, plus steady-state timing with and without counters.

Usage: python scripts/probe_walk_stats.py [grid] [subdiv] [size]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from raytracercore_tpu.bvh.builder import auto_leaf_size, build_triangle_bvh
from raytracercore_tpu.bvh.pallas_traverse import BLOCK, PallasBVH
from raytracercore_tpu.core import vecmath as vm
from raytracercore_tpu.intersect.dispatch import _position_eps
from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.scene.meshgen import make_mesh_scene
from raytracercore_tpu.scene.types import init_camera

grid, subdiv, size = (int(a) for a in (sys.argv[1:4] or [6, 3, 512]))
leaf = int(sys.argv[4]) if len(sys.argv) > 4 else 0
arrays, host_cam, (v0, e1, e2, mirror, valid) = make_mesh_scene(
    grid=grid, subdiv=subdiv, width=size, height=size)
leaf = leaf or auto_leaf_size(v0.shape[0])
bvh = build_triangle_bvh(v0, e1, e2, mirror, valid, leaf_size=leaf)
pb = PallasBVH(bvh, arrays.triangles, arrays.materials, arrays.n_prims)
print(f"tris={v0.shape[0]} nodes={pb.n_nodes} leaf={leaf} K={pb.K} "
      f"rays={size*size}", flush=True)

camera = init_camera(host_cam, size, size)
px, py = cam_mod.pixel_grid(size, size)
o, d = cam_mod.center_rays(camera, px, py)
# 32x32 tile order (matches render_passes tile=32).
ti = (jnp.arange(size * size) // (size * 32)) * (size * 32) \
    + (jnp.arange(size * size) % (size * 32))
tile = 32
lin = jnp.arange(size * size)
blk = lin // (tile * tile)
within = lin % (tile * tile)
bx = (blk % (size // tile)) * tile + within % tile
by = (blk // (size // tile)) * tile + within // tile
perm = by * size + bx
o_t, d_t = o[perm], d[perm]

eps_b, eps_p = float(vm.near_enough(o.dtype)), float(_position_eps(o.dtype))


def run(name, oo, dd, sort, walk_only=False):
    f = jax.jit(lambda a, b: pb.select(a, b, None, eps_b, eps_p,
                                       sort=sort, want_stats=True,
                                       walk_only=walk_only))
    rows, any_, t, st = f(oo, dd)
    st = np.asarray(st)
    f2 = jax.jit(lambda a, b: pb.select(a, b, None, eps_b, eps_p,
                                        sort=sort, walk_only=walk_only))
    r2 = f2(oo, dd)
    jax.block_until_ready(r2)
    t0 = time.perf_counter()
    for _ in range(5):
        r2 = f2(oo, dd)
    jax.block_until_ready(r2)
    dt = (time.perf_counter() - t0) / 5
    R = oo.shape[0]
    nb = st.shape[0]
    iters, vis, takes, flushes, fill = (st[:, c].sum() for c in range(5))
    print(f"[{name}] {dt*1e3:7.2f} ms  {R/dt/1e6:6.2f}M rays/s  "
          f"blocks={nb}  iters/blk={iters/nb:8.1f}  "
          f"visits/iter={vis/max(iters,1):4.2f}  "
          f"leaves/blk={takes/nb:7.1f}  "
          f"fill={fill/max(flushes,1):4.2f}  "
          f"ns/iter={dt*1e9/iters:6.1f}", flush=True)
    return rows, any_, t


quick = len(sys.argv) > 5 and sys.argv[5] == "quick"
rows, any_, t = run("primary/tile32", o_t, d_t, sort=False)
if not quick:
    run("primary/WALKONLY", o_t, d_t, sort=False, walk_only=True)

# Secondary-ish wavefront: origins at the hit points, random directions.
hitp = o_t + t[:, None] * d_t
key = jax.random.PRNGKey(0)
dr = jax.random.normal(key, d_t.shape)
dr = dr / jnp.linalg.norm(dr, axis=1, keepdims=True)
o2 = jnp.where(any_[:, None], hitp, o_t)
run("bounce/sorted", o2, dr, sort=True)
if not quick:
    run("bounce/WALKONLY", o2, dr, sort=True, walk_only=True)
