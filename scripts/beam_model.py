"""Host-side cost model for block-beam BVH traversal designs.

Simulates the skip-link walk for blocks of camera rays on the meshgen scene
and counts visited nodes / leaves per block under two block shapes:

* row-major blocks (the current kernel: 1024 consecutive pixels = 1-2 image
  rows at 1024 wide) — the beam spans the whole scene horizontally;
* square tiles (32x32 pixels) — the TPU-native fix: coherent frusta.

The walk decision uses a conservative interval (frustum) test: origin box x
direction box vs node AABB — exactly what a scalar-core-driven kernel would
evaluate, so the node counts here ARE the per-block iteration counts of the
redesigned kernel.

Usage: python scripts/beam_model.py [--grid 6 --subdiv 3 --size 512]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def frustum_walk(bmin, bmax, skip, slot, o_lo, o_hi, d_lo, d_hi):
    """Walk the skip-link preorder with a conservative beam test.
    Returns (visited_nodes, visited_leaves)."""
    n = len(bmin)
    visited = leaves = 0
    p = 0
    eps = 1e-6
    while p < n:
        visited += 1
        # Interval slab test per axis: t = (b - o) / d over the boxes.
        # An axis whose direction interval straddles 0 imposes no
        # constraint (some ray in the beam travels arbitrarily far before
        # crossing the slab) — conservatively (-inf, inf).
        num_lo = bmin[p] - o_hi
        num_hi = bmax[p] - o_lo
        with np.errstate(divide="ignore", invalid="ignore"):
            cand = np.stack([num_lo / d_lo, num_lo / d_hi,
                             num_hi / d_lo, num_hi / d_hi])
        straddle = (d_lo <= 0) & (d_hi >= 0)
        t_lo = np.where(straddle, -np.inf, np.min(cand, axis=0))
        t_hi = np.where(straddle, np.inf, np.max(cand, axis=0))
        near = np.max(t_lo)
        far = np.min(t_hi)
        hit = (near <= far) and (far >= -eps)
        if hit and slot[p] >= 0:
            leaves += 1
            p += 1
        elif hit:
            p += 1
        else:
            p = skip[p]
    return visited, leaves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=6)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--leaf-size", type=int, default=0)
    ap.add_argument("--blocks", type=int, default=40,
                    help="number of sample blocks per shape")
    args = ap.parse_args()

    from raytracercore_tpu.bvh.builder import (auto_leaf_size,
                                               build_triangle_bvh)
    from raytracercore_tpu.render import camera as cam_mod
    from raytracercore_tpu.scene.meshgen import make_mesh_scene
    from raytracercore_tpu.scene.types import init_camera

    arrays, host_cam, (v0, e1, e2, mirror, valid) = make_mesh_scene(
        grid=args.grid, subdiv=args.subdiv, width=args.size,
        height=args.size)
    n_tris = len(v0)
    leaf = args.leaf_size or auto_leaf_size(n_tris)
    t0 = time.perf_counter()
    bvh = build_triangle_bvh(v0, e1, e2, mirror, valid, leaf_size=leaf)
    print(f"{n_tris} tris, leaf {leaf}, {bvh.n_nodes} nodes "
          f"({time.perf_counter()-t0:.1f}s build)", flush=True)

    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)
    skip = np.asarray(bvh.skip)
    slot = np.asarray(bvh.leaf_slot)

    camera = init_camera(host_cam, args.size, args.size)
    px, py = cam_mod.pixel_grid(args.size, args.size)
    o, d = cam_mod.center_rays(camera, px, py)
    o = np.asarray(o).reshape(args.size, args.size, 3)
    d = np.asarray(d).reshape(args.size, args.size, 3)

    rng = np.random.default_rng(0)

    def stats(blocks, label):
        vis, lvs = [], []
        for o_blk, d_blk in blocks:
            v, l = frustum_walk(bmin, bmax, skip, slot,
                                o_blk.min(axis=0), o_blk.max(axis=0),
                                d_blk.min(axis=0), d_blk.max(axis=0))
            vis.append(v)
            lvs.append(l)
        print(f"{label:24} nodes/block mean {np.mean(vis):8.0f} "
              f"p90 {np.percentile(vis, 90):8.0f}   "
              f"leaves mean {np.mean(lvs):7.0f}", flush=True)
        return np.mean(vis)

    # Row-major 1024-ray blocks (current kernel ordering).
    rows_per_block = max(1024 // args.size, 1)
    blocks = []
    for _ in range(args.blocks):
        r = rng.integers(0, args.size - rows_per_block)
        o_blk = o[r:r + rows_per_block].reshape(-1, 3)
        d_blk = d[r:r + rows_per_block].reshape(-1, 3)
        blocks.append((o_blk, d_blk))
    stats(blocks, f"row-major {rows_per_block}x{args.size}")

    # Square tiles.
    t = args.tile
    blocks = []
    for _ in range(args.blocks):
        r = rng.integers(0, args.size - t)
        c = rng.integers(0, args.size - t)
        o_blk = o[r:r + t, c:c + t].reshape(-1, 3)
        d_blk = d[r:r + t, c:c + t].reshape(-1, 3)
        blocks.append((o_blk, d_blk))
    stats(blocks, f"tile {t}x{t}")

    # Diffuse-bounce blocks: random hemisphere directions from points on
    # sphere surfaces (worst-case incoherence), tile-gathered origins.
    blocks = []
    for _ in range(args.blocks):
        r = rng.integers(0, args.size - t)
        c = rng.integers(0, args.size - t)
        o_blk = o[r:r + t, c:c + t].reshape(-1, 3) + d[r:r + t, c:c + t].reshape(-1, 3) * 12.0
        d_blk = rng.normal(size=(t * t, 3))
        d_blk /= np.linalg.norm(d_blk, axis=1, keepdims=True)
        blocks.append((o_blk, d_blk))
    stats(blocks, "diffuse tile (unsorted)")

    # Diffuse + octant split: same rays, but grouped by direction octant
    # (what a per-bounce octant/Morton sort gives the kernel).
    blocks_o = []
    for o_blk, d_blk in blocks:
        oct_ = ((d_blk[:, 0] >= 0).astype(int) + 2 * (d_blk[:, 1] >= 0)
                + 4 * (d_blk[:, 2] >= 0))
        for k in range(8):
            m = oct_ == k
            if m.sum() > 8:
                blocks_o.append((o_blk[m], d_blk[m]))
    stats(blocks_o, "diffuse octant-split")


if __name__ == "__main__":
    main()
