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
    ap.add_argument("--ellipsoid", action="store_true",
                    help="TRANSFORMED spheres (ellipsoid-BVH tier) instead "
                         "of analytic untransformed spheres")
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
                                               recursion=args.recursion,
                                               ellipsoid=args.ellipsoid)
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

    # --- attribution of disagreements (VERDICT r3 #6 / r4 #5) -------------
    # Mirror bench.py's flip/graze/samepick discipline: classify every
    # disagreeing ray (PRIMARY rays too, not only bounce — round 5)
    # instead of calling 0.999x "noise".
    #   order-tie  — both paths found hits at the same t (within f32 slop)
    #                on different rows: equal-t candidate ordering, benign;
    #   skip-edge  — the disagreeing hit sits on the skip-epsilon knife
    #                edge (position-match ratio within 2x of 1): the
    #                accelerated and dense paths compute the hit position
    #                through different arithmetic and round the
    #                Util.RayHitMatches test differently, benign;
    #   found-flip — one side missed entirely: a grazing/discriminant
    #                knife edge under different FP op order;
    #   tangent-graze — an f64 ARBITER (below) shows the disputed sphere's
    #                discriminant sits within |disc|/b² < 1e-4 of zero: a
    #                tangent ray whose hit/miss f32 cannot resolve
    #                (disc = b² − 4c is catastrophic cancellation at 1e-7
    #                relative), so the two Mosaic kernels legitimately
    #                flip it — round-5 measurement: every previously
    #                "real" ellipsoid ray was this, margins 8e-9..6e-5,
    #                and the BVH side matched f64 on 5 of 7;
    #   real       — anything else: would be a genuine traversal bug.
    from raytracercore_tpu.intersect.dispatch import _position_eps
    eps_p = float(_position_eps(jnp.float32))

    def f64_disc_margin(ray_o, ray_d, ray_idx, prim):
        """|disc|/b² of `prim`'s quadratic for ray `ray_idx`, in f64 —
        the arbiter for knife-edge hit/miss disputes.  inf for quads."""
        sphs = arrays.spheres
        pid = np.asarray(sphs.prim_id)
        rows = np.nonzero(pid == prim)[0]
        if rows.size == 0:
            return np.inf
        r = int(rows[0])
        ro = np.asarray(ray_o, np.float64)[ray_idx]
        rd = np.asarray(ray_d, np.float64)[ray_idx]
        w2o = np.asarray(sphs.world_to_obj, np.float64)[r]
        oo = w2o[:3, :3] @ ro + w2o[:3, 3]
        dd = w2o[:3, :3] @ rd
        dd = dd / np.linalg.norm(dd)
        f = oo - np.asarray(sphs.center, np.float64)[r]
        b = -2.0 * f @ dd
        c = f @ f - float(np.asarray(sphs.radius, np.float64)[r]) ** 2
        disc = b * b - 4.0 * c
        return abs(disc) / max(b * b, 1e-30)

    def classify(hbx, hdx, skip_hit, tag, ray_o=None, ray_d=None):
        dis = np.asarray(hbx.prim != hdx.prim)
        t_b, t_d = np.asarray(hbx.t), np.asarray(hdx.t)
        f_b, f_d = np.asarray(hbx.prim >= 0), np.asarray(hdx.prim >= 0)
        both = dis & f_b & f_d
        tie = both & (np.abs(t_b - t_d) <= 1e-3 * (1.0 + np.abs(t_d)))
        if skip_hit is not None:
            kp = np.asarray(skip_hit.position)
            scale = 1.0 + (kp ** 2).sum(-1)
            lim = (eps_p ** 2) * scale

            def edge(h):
                d2_ = ((np.asarray(h.position) - kp) ** 2).sum(-1)
                r = d2_ / np.maximum(lim, 1e-30)
                return (r > 0.25) & (r < 4.0)

            skip_edge = dis & ~tie & (edge(hbx) | edge(hdx))
        else:
            skip_edge = np.zeros_like(dis)
        flip = dis & ~tie & ~skip_edge & (f_b != f_d)
        real = dis & ~tie & ~skip_edge & ~flip
        # f64 arbitration of the remaining disputes: a disagreement whose
        # DISPUTED sphere (each side's winner, as seen by the other) is a
        # tangent knife-edge in f64 is an arithmetic-order flip between
        # two correct f32 kernels, not a traversal bug.
        graze = np.zeros_like(real)
        if ray_o is not None:
            p_b = np.asarray(hbx.prim)
            p_d = np.asarray(hdx.prim)
            for i in np.nonzero(real | flip)[0]:
                m = min(f64_disc_margin(ray_o, ray_d, i, int(p_b[i])),
                        f64_disc_margin(ray_o, ray_d, i, int(p_d[i])))
                if m < 1e-4:
                    graze[i] = True
        real_left = real & ~graze
        flip_left = flip & ~graze
        n = dis.size
        frac = lambda m: round(float(m.sum()) / n, 6)
        print(f"{tag} disagreement attribution: order-tie {frac(tie)}, "
              f"skip-edge {frac(skip_edge)}, found-flip {frac(flip_left)}, "
              f"tangent-graze {frac(graze)}, "
              f"real {frac(real_left)} ({int(real_left.sum())} rays)",
              file=sys.stderr, flush=True)
        for m, name in ((flip_left, "flip"), (real_left, "real")):
            for i in np.nonzero(m)[0][:6]:
                print(f"  {tag} {name} ray {i}: "
                      f"bvh(prim={int(np.asarray(hbx.prim)[i])}"
                      f" t={t_b[i]:.6g}) "
                      f"dense(prim={int(np.asarray(hdx.prim)[i])}"
                      f" t={t_d[i]:.6g})",
                      file=sys.stderr, flush=True)
        return {"order_tie": frac(tie), "skip_edge": frac(skip_edge),
                "found_flip": frac(flip_left), "tangent_graze": frac(graze),
                "real": frac(real_left)}

    attribution_primary = classify(hb, hd, None, "primary", o, d)
    attribution = classify(hb2, hd2, hd, "bounce", o2, d2)

    # --- stage 2: throughput at scale -------------------------------------
    t0 = time.perf_counter()
    arrays, host_cam = make_sphere_field_scene(
        grid=args.grid, width=args.size, height=args.size,
        recursion=args.recursion, ellipsoid=args.ellipsoid)
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
        "metric": (f"{'ellipsoid' if args.ellipsoid else 'sphere'}-BVH "
                   f"render, {n_sph} spheres, "
                   f"{args.size}^2 rec{args.recursion}"),
        "ellipsoid": args.ellipsoid,
        "n_spheres": n_sph,
        "agreement_primary": agree1,
        "agreement_bounce": agree2,
        "primary_disagreement_attribution": attribution_primary,
        "bounce_disagreement_attribution": attribution,
        "ms_per_pass": round(dt * 1e3, 2),
        "wavefront_rays_per_sec": round(rays / dt, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
