"""At-scale BVH benchmark — BASELINE config 5 (~1M-triangle replicated mesh).

Builds a procedural icosphere-field scene (scene/meshgen.py), constructs the
skip-link BVH with the native C++ builder, renders through the BVH closest-
hit path on the current backend, and reports build + render throughput as
one JSON line.

Usage:
    python scripts/bench_scale.py                 # 1M tris, 1024x1024
    python scripts/bench_scale.py --grid 4 --subdiv 2 --size 256 --check
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=14)
    ap.add_argument("--subdiv", type=int, default=4)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--recursion", type=int, default=4)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--leaf-size", type=int, default=0,
                    help="0 = auto: grow leaves until the packed node "
                         "table fits the Pallas traversal's VMEM budget")
    ap.add_argument("--check", action="store_true",
                    help="compare BVH hits vs dense scan on sample rays "
                         "(small scenes only)")
    ap.add_argument("--png", default="", help="write a render to this path")
    ap.add_argument("--spp-png", type=int, default=16)
    ap.add_argument("--traversal", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--tile", type=int, default=32,
                    help="square-tile ray ordering (0 = row-major)")
    ap.add_argument("--sort", default="auto", choices=["auto", "on", "off"],
                    help="per-bounce (octant, Morton) ray sort")
    ap.add_argument("--train", action="store_true",
                    help="also time the fwd+bwd train step through the "
                         "BVH recorder (record -> replay -> grads -> adam)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracercore_tpu.bvh.builder import build_triangle_bvh
    from raytracercore_tpu.intersect.dispatch import make_bvh_closest_fn
    from raytracercore_tpu.native import native_available
    from raytracercore_tpu.render.film import Film
    from raytracercore_tpu.render.renderer import render_passes
    from raytracercore_tpu.scene.meshgen import make_mesh_scene
    from raytracercore_tpu.scene.types import init_camera

    t0 = time.perf_counter()
    arrays, host_cam, (v0, e1, e2, mirror, valid) = make_mesh_scene(
        grid=args.grid, subdiv=args.subdiv, recursion=args.recursion,
        width=args.size, height=args.size)
    t_gen = time.perf_counter() - t0
    n_tris = int(v0.shape[0])
    log(f"scene: {n_tris} triangles in {t_gen:.2f}s "
        f"(native builder available: {native_available()})")

    from raytracercore_tpu.bvh.builder import auto_leaf_size
    leaf = args.leaf_size or auto_leaf_size(n_tris)
    log(f"leaf size: {leaf}" + (" (auto)" if not args.leaf_size else ""))
    t0 = time.perf_counter()
    bvh = build_triangle_bvh(v0, e1, e2, mirror, valid, leaf_size=leaf)
    t_build = time.perf_counter() - t0
    log(f"bvh: {bvh.n_nodes} nodes, {bvh.leaf_prims.shape[0]} leaves "
        f"in {t_build:.2f}s")

    sort = None if args.sort == "auto" else (args.sort == "on")
    closest = make_bvh_closest_fn(bvh, arrays, traversal=args.traversal,
                                  sort=sort)
    tile = args.tile if args.size % max(args.tile, 1) == 0 else 0
    camera = init_camera(host_cam, args.size, args.size)
    film = Film.create(args.size, args.size)
    key = jax.random.PRNGKey(0)

    if args.check:
        from raytracercore_tpu.intersect.dispatch import closest_hit
        from raytracercore_tpu.render import camera as cam_mod
        px, py = cam_mod.pixel_grid(args.size, args.size)
        o, d = cam_mod.center_rays(camera, px, py)
        hb = jax.jit(closest)(arrays, o, d, None)
        hd = jax.jit(closest_hit)(arrays, o, d, None)
        agree = float(jnp.mean((hb.prim == hd.prim).astype(jnp.float32)))
        log(f"check: BVH vs dense primary-hit agreement {agree:.4f}")
        assert agree > 0.999, "BVH disagrees with dense scan"

    log("compiling render pass...")
    t0 = time.perf_counter()
    # Warm up the SAME static configuration that is timed below (n is a
    # static arg — a different n recompiles, which round 3 measured as a
    # phantom 8s/pass).
    out = render_passes(arrays, camera, film, key, jnp.int32(0),
                        n=args.passes, closest_fn=closest, tile=tile)
    float(out.samples[0, 0])
    t_compile = time.perf_counter() - t0
    log(f"first {args.passes} passes (compile+run): {t_compile:.1f}s")

    t0 = time.perf_counter()
    out = render_passes(arrays, camera, out, key, jnp.int32(args.passes),
                        n=args.passes, closest_fn=closest, tile=tile)
    float(out.samples[0, 0])
    dt = (time.perf_counter() - t0) / args.passes

    pixels = args.size * args.size
    rays = pixels * (args.recursion + 1)
    log(f"steady state: {dt*1e3:.1f} ms/pass, "
        f"{pixels/dt/1e6:.2f}M paths/sec, {rays/dt/1e6:.2f}M rays/sec")

    train = {}
    if args.train:
        # Fwd+bwd through the BVH recorder — config 5's actual training
        # workload (VERDICT r3 #2): record (BVH closest-hit) -> replay ->
        # material grads -> adam.
        import optax

        from raytracercore_tpu.diff import get_material_params
        from raytracercore_tpu.parallel.shard import make_train_step

        optimizer = optax.adam(1e-2)
        params = get_material_params(arrays)
        opt_state = optimizer.init(params)
        target = jnp.zeros((args.size, args.size, 3), jnp.float32)
        step = make_train_step(None, optimizer, closest_fn=closest)
        log("compiling train step (BVH record + replay)...")
        state = {"p": params, "o": opt_state}

        def one():
            p, o_, loss = step(state["p"], arrays, camera, target,
                               state["o"], key)
            state["p"], state["o"] = p, o_
            return loss

        t0 = time.perf_counter()
        loss = one()
        loss_f = float(loss)
        t_compile_tr = time.perf_counter() - t0
        log(f"train step compile+run: {t_compile_tr:.1f}s "
            f"(loss {loss_f:.4g})")
        float(one())
        t0 = time.perf_counter()
        n_tr = 3
        for _ in range(n_tr):
            loss = one()
        float(loss)
        dt_tr = (time.perf_counter() - t0) / n_tr
        log(f"train: {dt_tr*1e3:.1f} ms/step, "
            f"{rays/dt_tr/1e6:.3f}M fwd+bwd rays/sec")
        train = {"train_ms_per_step": round(dt_tr * 1e3, 2),
                 "train_steps_per_sec": round(1.0 / dt_tr, 4),
                 "train_wavefront_rays_per_sec": round(rays / dt_tr, 1),
                 "train_loss_finite": bool(np.isfinite(loss_f))}

    if args.png:
        from raytracercore_tpu.tools.png import write_png
        more = max(args.spp_png - 1 - args.passes, 0)
        if more:
            out = render_passes(arrays, camera, out, key,
                                jnp.int32(1 + args.passes), n=more,
                                closest_fn=closest, tile=tile)
        rgb, alpha = out.to_image(arrays.background_rgb,
                                  arrays.background_alpha)
        img = np.concatenate([np.asarray(rgb), np.asarray(alpha)[..., None]],
                             axis=-1)
        write_png(args.png, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        log(f"wrote {args.png}")

    print(json.dumps({
        "metric": f"BVH render, {n_tris} tris, {args.size}^2, "
                  f"rec{args.recursion}",
        "n_tris": n_tris,
        "bvh_nodes": int(bvh.n_nodes),
        "build_sec": round(t_build, 3),
        "ms_per_pass": round(dt * 1e3, 2),
        "paths_per_sec": round(pixels / dt, 1),
        "wavefront_rays_per_sec": round(rays / dt, 1),
        "traversal": args.traversal,
        "tile": tile,
        "sort": args.sort,
        "leaf_size": leaf,
        "device": str(jax.devices()[0]),
        **train,
    }))


if __name__ == "__main__":
    main()
