"""Full-pass stage attribution at scale (VERDICT r4 #2).

Splits one progressive render pass at 46k / 184k / 1M triangles into its
per-bounce stages, each timed as its own jitted call on the REAL
per-bounce ray wavefronts (captured from an actual trace via
``trace(want_wavefronts=True)`` — secondary-bounce distributions, not
synthetic rays):

  sort     — the (octant, Morton) multi-payload lax.sort + inverse perm
  walk     — BVH node walk only (kernel walk_only=True, minus sort)
  leaf     — leaf-flush tests (select minus walk-only, same sort state)
  eval     — winner re-eval + dense sphere/plane tails + combine
             (full closest_hit minus select)
  shade    — integrator shading/sampling residual
             (full pass minus camera/film/Σ closest)

Usage:
    python scripts/prof_scale.py --grid 4 --subdiv 3 --size 512
    python scripts/prof_scale.py --grid 14 --subdiv 4 --size 1024
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


def timed(fn, *args, reps=3):
    """Steady-state ms of a jitted callable (scalar-fetch fence)."""
    import jax
    import jax.numpy as jnp

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])

    fence(fn(*args))  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=4)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--recursion", type=int, default=4)
    ap.add_argument("--leaf-size", type=int, default=0)
    ap.add_argument("--tile", type=int, default=32)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from raytracercore_tpu.bvh.builder import (auto_leaf_size,
                                               build_triangle_bvh)
    from raytracercore_tpu.bvh.pallas_traverse import PallasBVH
    from raytracercore_tpu.core import vecmath as vm
    from raytracercore_tpu.intersect.dispatch import (HitRecord,
                                                      _position_eps,
                                                      make_bvh_closest_fn)
    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.render.film import Film
    from raytracercore_tpu.render.integrator import trace
    from raytracercore_tpu.render.renderer import render_passes
    from raytracercore_tpu.scene.meshgen import make_mesh_scene
    from raytracercore_tpu.scene.types import init_camera

    arrays, host_cam, (v0, e1, e2, mirror, valid) = make_mesh_scene(
        grid=args.grid, subdiv=args.subdiv, recursion=args.recursion,
        width=args.size, height=args.size)
    n_tris = int(v0.shape[0])
    leaf = args.leaf_size or auto_leaf_size(n_tris)
    bvh = build_triangle_bvh(v0, e1, e2, mirror, valid, leaf_size=leaf)
    pb = PallasBVH(bvh, arrays.triangles, arrays.materials, arrays.n_prims)
    do_sort = pb.n_nodes * pb.K > 16384
    closest = make_bvh_closest_fn(bvh, arrays)
    log(f"tris={n_tris} nodes={pb.n_nodes} leaf={leaf} sort={do_sort} "
        f"resident={pb.leaf_resident}")

    camera = init_camera(host_cam, args.size, args.size)
    tile = args.tile if args.size % max(args.tile, 1) == 0 else 0
    if tile:
        px, py = cam_mod.pixel_grid_tiled(args.size, args.size, tile)
    else:
        px, py = cam_mod.pixel_grid(args.size, args.size)
    key = jax.random.PRNGKey(0)
    k_cam, k_path = jax.random.split(jax.random.fold_in(key, 0))
    ray_o, ray_d = jax.jit(cam_mod.camera_rays)(camera, px, py, k_cam)

    # --- capture real per-bounce wavefronts ---------------------------
    log("capturing per-bounce wavefronts...")
    wf_fn = jax.jit(functools.partial(trace, closest_fn=closest,
                                      want_wavefronts=True))
    *_, wf = wf_fn(arrays, ray_o, ray_d, k_path)
    wf = jax.device_get(wf)
    B = args.recursion + 1
    alive_frac = [float(wf["alive"][i].mean()) for i in range(B)]
    log(f"alive fraction per bounce: "
        f"{[round(a, 3) for a in alive_frac]}")

    eps_b = vm.near_enough(ray_o.dtype)
    eps_p = _position_eps(ray_o.dtype)

    def mk_skip(i):
        return HitRecord(
            prim=jnp.asarray(wf["prev_prim"][i]),
            t=jnp.asarray(wf["prev_t"][i]),
            position=jnp.asarray(wf["prev_pos"][i]),
            normal=jnp.asarray(wf["prev_normal"][i]),
            inside=jnp.asarray(wf["prev_inside"][i]))

    # --- stage callables (one compile each; bounces share shapes) -----
    closest_j = jax.jit(closest)
    sel = jax.jit(functools.partial(
        pb.select, eps_behind=eps_b, eps_pos=eps_p, sort=do_sort))
    sel_walk = jax.jit(functools.partial(
        pb.select, eps_behind=eps_b, eps_pos=eps_p, sort=do_sort,
        walk_only=True))

    def sort_only(o, d, skip):
        R = o.shape[0]
        keyv = pb._sort_key(o, d)
        idx = jnp.arange(R, dtype=jnp.int32)
        planes = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  skip.t, skip.position[:, 0], skip.position[:, 1],
                  skip.position[:, 2], skip.inside.astype(jnp.float32))
        out = jax.lax.sort((keyv, idx) + planes, num_keys=1)
        # inverse perm of the two result planes, as select does
        back = jax.lax.sort((out[1], out[2], out[3]), num_keys=1)
        return back[1]

    sort_j = jax.jit(sort_only)

    # Per-call dispatch overhead on the remote platform: a null jit call
    # measures ~20+ ms on the axon tunnel, inflating every isolated stage
    # (round-5 finding: the "26-31 ms sort" of the first run was ~3-6 ms
    # of real work + dispatch).  Subtracted from the absolute stages;
    # difference stages (walk, leaf, eval) cancel it already.
    t_null = timed(jax.jit(lambda x: x + 1.0), jnp.float32(0.0))
    log(f"null-dispatch overhead: {t_null:.1f} ms")

    rows = []
    for i in range(B):
        o = jnp.asarray(wf["o"][i])
        d = jnp.asarray(wf["d"][i])
        skip = mk_skip(i)
        t_closest = timed(closest_j, arrays, o, d, skip)
        t_sel = timed(sel, o, d, skip)
        t_walk = timed(sel_walk, o, d, skip)
        t_sort = timed(sort_j, o, d, skip) if do_sort else 0.0
        rows.append({
            "bounce": i, "alive": round(alive_frac[i], 3),
            "closest": max(t_closest - t_null, 0.0),
            "select": max(t_sel - t_null, 0.0),
            "sort": max(t_sort - t_null, 0.0),
            "walk": max(t_walk - t_sort, 0.0),
            "leaf": max(t_sel - t_walk, 0.0),
            "eval": max(t_closest - t_sel, 0.0),
        })
        log(f"bounce {i}: closest {t_closest:7.1f}  select {t_sel:7.1f}  "
            f"sort {t_sort:6.1f}  walk {rows[-1]['walk']:7.1f}  "
            f"leaf {rows[-1]['leaf']:7.1f}  eval {rows[-1]['eval']:6.1f}")

    # --- whole-pass + fixed stages ------------------------------------
    film = Film.create(args.size, args.size)
    pass_fn = functools.partial(render_passes, n=1, closest_fn=closest,
                                tile=tile)
    t_pass = max(timed(pass_fn, arrays, camera, film, key, jnp.int32(0))
                 - t_null, 0.0)
    t_cam = max(timed(jax.jit(cam_mod.camera_rays), camera, px, py, k_cam)
                - t_null, 0.0)
    color = jnp.zeros((args.size * args.size, 3), jnp.float32)
    miss = jnp.zeros((args.size * args.size,), bool)
    t_film = max(timed(jax.jit(film.add_full_frame), color, miss)
                 - t_null, 0.0)

    tot = {k: sum(r[k] for r in rows)
           for k in ("closest", "select", "sort", "walk", "leaf", "eval")}
    shade = t_pass - tot["closest"] - t_cam - t_film
    log(f"pass {t_pass:.1f} ms | closest x{B} {tot['closest']:.1f} "
        f"(sort {tot['sort']:.1f} walk {tot['walk']:.1f} "
        f"leaf {tot['leaf']:.1f} eval {tot['eval']:.1f}) | "
        f"camera {t_cam:.1f} film {t_film:.1f} | shade-residual "
        f"{shade:.1f}")

    print(json.dumps({
        "n_tris": n_tris, "size": args.size, "recursion": args.recursion,
        "leaf": leaf, "sort": do_sort, "ms_null_dispatch": round(t_null, 1),
        "ms_pass": round(t_pass, 1),
        "ms_camera": round(t_cam, 1), "ms_film": round(t_film, 1),
        "ms_shade_residual": round(shade, 1),
        "totals_ms": {k: round(v, 1) for k, v in tot.items()},
        "per_bounce": [{k: (round(v, 1) if isinstance(v, float) else v)
                        for k, v in r.items()} for r in rows],
    }))


if __name__ == "__main__":
    main()
