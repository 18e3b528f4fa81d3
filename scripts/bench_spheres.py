"""Sphere-BVH at-scale benchmark + on-hardware agreement check
(VERDICT r2 #5: a mixed 100k-sphere+triangle scene through the
accelerated path with dense-scan agreement >= 0.999).

Two stages:
1. agreement: a dense-tractable sphere count (default 40x40 = 1,600),
   accelerated vs dense closest hit on primary rays + one bounce;
2. throughput: a grid x grid field (default 320x320 = 102,400 analytic
   spheres + 2 quads) rendered through the sphere-BVH + tri-BVH path.

Usage: python scripts/bench_spheres.py [--grid 320] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=320)
    ap.add_argument("--agree-grid", type=int, default=40)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--recursion", type=int, default=4)
    ap.add_argument("--passes", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracercore_tpu.bvh.builder import build_triangle_bvh
    from raytracercore_tpu.intersect.dispatch import (closest_hit,
                                                      make_bvh_closest_fn)
    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.render.film import Film
    from raytracercore_tpu.render.renderer import render_passes
    from raytracercore_tpu.scene.meshgen import make_sphere_field_scene
    from raytracercore_tpu.scene.types import init_camera

    def tri_bvh(arrays):
        return build_triangle_bvh(
            np.asarray(arrays.triangles.v0), np.asarray(arrays.triangles.e1),
            np.asarray(arrays.triangles.e2),
            np.asarray(arrays.triangles.mirror),
            np.ones(arrays.triangles.v0.shape[0], bool), backend="numpy")

    # --- stage 1: agreement on a dense-tractable size ---------------------
    g = args.agree_grid
    arrays, host_cam = make_sphere_field_scene(grid=g, width=128,
                                               height=128,
                                               recursion=args.recursion)
    closest = make_bvh_closest_fn(tri_bvh(arrays), arrays)
    camera = init_camera(host_cam, 128, 128)
    px, py = cam_mod.pixel_grid(128, 128)
    o, d = cam_mod.center_rays(camera, px, py)
    hb = jax.jit(closest)(arrays, o, d, None)
    hd = jax.jit(closest_hit)(arrays, o, d, None)
    agree1 = float((hb.prim == hd.prim).mean())
    found = hd.prim >= 0
    o2 = jnp.where(found[:, None], hd.position, o)
    dn = jnp.sum(d * hd.normal, axis=-1, keepdims=True)
    d2 = jnp.where(found[:, None], d - 2.0 * dn * hd.normal, d)
    hb2 = jax.jit(closest)(arrays, o2, d2, hd)
    hd2 = jax.jit(closest_hit)(arrays, o2, d2, hd)
    agree2 = float((hb2.prim == hd2.prim).mean())
    print(f"agreement ({g*g} spheres): primary {agree1:.4f}, "
          f"bounce {agree2:.4f}", file=sys.stderr, flush=True)
    assert agree1 >= 0.999 and agree2 >= 0.999

    # --- stage 2: throughput at scale -------------------------------------
    t0 = time.perf_counter()
    arrays, host_cam = make_sphere_field_scene(
        grid=args.grid, width=args.size, height=args.size,
        recursion=args.recursion)
    t_gen = time.perf_counter() - t0
    n_sph = args.grid * args.grid
    closest = make_bvh_closest_fn(tri_bvh(arrays), arrays)
    camera = init_camera(host_cam, args.size, args.size)
    film = Film.create(args.size, args.size)
    key = jax.random.PRNGKey(0)
    log = lambda m: print(m, file=sys.stderr, flush=True)
    log(f"scene: {n_sph} spheres + 2 quads in {t_gen:.1f}s; compiling...")
    out = render_passes(arrays, camera, film, key, jnp.int32(0),
                        n=args.passes, closest_fn=closest, tile=32)
    float(out.samples[0, 0])
    t0 = time.perf_counter()
    out = render_passes(arrays, camera, out, key, jnp.int32(args.passes),
                        n=args.passes, closest_fn=closest, tile=32)
    float(out.samples[0, 0])
    dt = (time.perf_counter() - t0) / args.passes
    rays = args.size * args.size * (args.recursion + 1)
    log(f"steady: {dt*1e3:.1f} ms/pass, {rays/dt/1e6:.2f}M rays/sec")

    print(json.dumps({
        "metric": f"sphere-BVH render, {n_sph} spheres, "
                  f"{args.size}^2 rec{args.recursion}",
        "n_spheres": n_sph,
        "agreement_primary": agree1,
        "agreement_bounce": agree2,
        "ms_per_pass": round(dt * 1e3, 2),
        "wavefront_rays_per_sec": round(rays / dt, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
