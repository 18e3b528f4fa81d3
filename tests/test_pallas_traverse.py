"""Pallas block-beam BVH traversal vs the XLA while_loop traversal and the
dense scan (interpret mode — the compiled kernel is exercised on hardware by
scripts/bench_scale.py and the bench kernel-equivalence check).
"""

import jax
import numpy as np

from raytracercore_tpu.bvh.builder import build_triangle_bvh
from raytracercore_tpu.bvh.pallas_traverse import PallasBVH
from raytracercore_tpu.bvh.traverse import traverse_closest
from raytracercore_tpu.core import vecmath as vm
from raytracercore_tpu.intersect.dispatch import _position_eps, closest_hit
from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.scene.meshgen import make_mesh_scene
from raytracercore_tpu.scene.types import init_camera


def _setup(grid=2, subdiv=1, size=16):
    arrays, host_cam, (v0, e1, e2, mirror, valid) = make_mesh_scene(
        grid=grid, subdiv=subdiv, width=size, height=size, recursion=2)
    bvh = build_triangle_bvh(v0, e1, e2, mirror, valid, backend="numpy")
    pb = PallasBVH(bvh, arrays.triangles, arrays.materials, arrays.n_prims)
    camera = init_camera(host_cam, size, size)
    px, py = cam_mod.pixel_grid(size, size)
    o, d = cam_mod.center_rays(camera, px, py)
    return arrays, bvh, pb, o, d


def test_pallas_traverse_matches_xla_primary():
    arrays, bvh, pb, o, d = _setup()
    eps_b = vm.near_enough(o.dtype)
    eps_p = _position_eps(o.dtype)
    rows_p, any_p = pb.select(o, d, None, eps_b, eps_p, interpret=True)
    ref_idx, _ = traverse_closest(bvh, arrays.triangles, arrays.materials,
                                  o, d, None, eps_b, eps_p)
    got = np.where(np.asarray(any_p), np.asarray(rows_p), -1)
    np.testing.assert_array_equal(got, np.asarray(ref_idx))
    assert (got >= 0).any()


def test_pallas_traverse_skip_hit():
    # Bounce rays FROM the first hit surface, with skip = that hit: the
    # skip-hit filter must exclude the originating surface point.
    arrays, bvh, pb, o, d = _setup()
    hit = jax.jit(closest_hit)(arrays, o, d, None)
    eps_b = vm.near_enough(o.dtype)
    eps_p = _position_eps(o.dtype)

    import jax.numpy as jnp
    found = hit.prim >= 0
    o2 = jnp.where(found[:, None], hit.position, o)
    # Reflect d about the normal where found (a specular-ish bounce).
    dn = jnp.sum(d * hit.normal, axis=-1, keepdims=True)
    d2 = jnp.where(found[:, None], d - 2.0 * dn * hit.normal, d)

    rows_p, any_p = pb.select(o2, d2, hit, eps_b, eps_p, interpret=True)
    ref_idx, _ = traverse_closest(bvh, arrays.triangles, arrays.materials,
                                  o2, d2, hit, eps_b, eps_p)
    got = np.where(np.asarray(any_p), np.asarray(rows_p), -1)
    np.testing.assert_array_equal(got, np.asarray(ref_idx))
