"""Stackless skip-link BVH traversal (batched wavefront, jnp).

Replaces the reference's recursive collect-all-leaves + sorted scan
(BVH.IntersectLeaves, Acceleration/BVH.cs:295-331; consumed with early exit
by Scene.RayTracePrimitives, Scene.cs:65-91) with a closest-hit traversal:
every ray walks the preorder node list via skip links, culling subtrees whose
AABB entry distance exceeds the current best hit — the same pruning the
reference gets from its near/far sort, without materializing candidate lists.

All rays advance in lockstep inside one ``lax.while_loop``; the traversal is
deliberately NON-differentiable (while_loop has no reverse rule) — it returns
only the winning triangle index per ray, and the dispatch layer re-evaluates
that single triangle differentiably.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..intersect.jnp_ref import moller_trumbore
from .builder import BVHArrays


def _slab(bmin, bmax, o, inv_d, o_is_inside):
    """Per-ray AABB slab test with precomputed 1/d (AABB.cs:107-142
    semantics: zero direction ⇒ ±inf handled via precomputed inv)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    # Zero-direction lanes: inv = ±inf gives ±inf already unless o == b
    # (0*inf = NaN); scrub NaNs to the open interval.
    lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
    hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
    near = jnp.max(lo, axis=-1)
    far = jnp.min(hi, axis=-1)
    return near, far


def traverse_closest(bvh: BVHArrays, tri, mats, ray_o, ray_d, skip,
                     near_enough, eps_pos):
    """Closest valid triangle per ray through the BVH.

    Filtering (invert / two-sided / skip-hit) happens DURING traversal so a
    closer invalid hit cannot shadow a farther valid one — mirroring
    Primitive.RayTrace inside the scan (Primitive.cs:46-75).

    Returns (best_idx [R] int32 triangle-table index or -1, best_t [R]).
    Non-differentiable: call under stop_gradient inputs.
    """
    R = ray_o.shape[0]
    n_nodes = bvh.n_nodes
    K = bvh.leaf_prims.shape[1]

    inv_d = jnp.where(ray_d != 0, 1.0 / jnp.where(ray_d == 0, 1.0, ray_d),
                      jnp.inf)

    # Per-triangle material flags, gathered per leaf slot below.
    tri_prim = tri.prim_id
    safe_prim = jnp.maximum(tri_prim, 0)
    tri_invert = jnp.take(mats.invert, safe_prim) & (tri_prim >= 0)
    tri_twosided = jnp.take(mats.two_sided, safe_prim) | (tri_prim < 0)

    def leaf_test(slot, o, d, best_t, best_idx, skip_fields):
        """Test the ≤K triangles of leaf row `slot` ([R] per-ray rows)."""
        rows = jnp.take(bvh.leaf_prims, jnp.maximum(slot, 0), axis=0)  # [R,K]
        rows = jnp.where((slot >= 0)[:, None], rows, -1)
        safe = jnp.maximum(rows, 0).reshape(-1)
        g3 = lambda a: jnp.take(a, safe, axis=0).reshape(R, K, 3)
        g1 = lambda a: jnp.take(a, safe, axis=0).reshape(R, K)
        mt = moller_trumbore(
            o[:, None, :], d[:, None, :],
            g3(tri.v0), g3(tri.e1), g3(tri.e2), g3(tri.normal),
            g1(tri.mirror), rows >= 0, near_enough)

        inside_geo = mt["inside"]
        invert = g1(tri_invert)
        twosided = g1(tri_twosided)
        inside = jnp.where(invert, ~inside_geo, inside_geo)
        valid = mt["valid"] & ~(inside & ~twosided)

        # Skip-hit (same-prim + position + parity; Util.cs:179-192).
        sk_prim, sk_pos, sk_normal, sk_inside = skip_fields
        prim_ids = jnp.take(tri_prim, safe.reshape(-1)).reshape(R, K)
        cand_pos = o[:, None, :] + d[:, None, :] * jnp.where(
            valid, mt["t"], 0.0)[..., None]
        d2 = jnp.sum((cand_pos - sk_pos[:, None, :]) ** 2, axis=-1)
        scale = 1.0 + jnp.sum(sk_pos ** 2, axis=-1)[:, None]
        pos_close = d2 <= (eps_pos * eps_pos) * scale
        leaving = jnp.sum(d * sk_normal, axis=-1)[:, None] > 0
        parity = jnp.where(leaving, inside != sk_inside[:, None],
                           inside == sk_inside[:, None])
        match = ((prim_ids == sk_prim[:, None]) & pos_close & parity
                 & (sk_prim >= 0)[:, None])
        valid = valid & ~match

        t = jnp.where(valid, mt["t"], jnp.inf)
        leaf_best = jnp.argmin(t, axis=1)
        leaf_t = jnp.take_along_axis(t, leaf_best[:, None], axis=1)[:, 0]
        leaf_idx = jnp.take_along_axis(rows, leaf_best[:, None],
                                       axis=1)[:, 0]
        better = leaf_t < best_t
        return (jnp.where(better, leaf_t, best_t),
                jnp.where(better, leaf_idx, best_idx))

    if skip is None:
        skip_fields = (jnp.full((R,), -1, jnp.int32),
                       jnp.zeros((R, 3), ray_o.dtype),
                       jnp.zeros((R, 3), ray_o.dtype),
                       jnp.zeros((R,), bool))
    else:
        skip_fields = (skip.prim, skip.position, skip.normal, skip.inside)

    def cond(state):
        ptr, best_t, best_idx = state
        return jnp.any(ptr < n_nodes)

    def body(state):
        ptr, best_t, best_idx = state
        live = ptr < n_nodes
        p = jnp.minimum(ptr, n_nodes - 1)
        bmin = jnp.take(bvh.bmin, p, axis=0)
        bmax = jnp.take(bvh.bmax, p, axis=0)
        near, far = _slab(bmin, bmax, ray_o, inv_d, None)
        hit_box = (near <= far) & (far >= -near_enough) & (near <= best_t)

        slot = jnp.take(bvh.leaf_slot, p)
        is_leaf = slot >= 0

        do_leaf = live & hit_box & is_leaf
        new_t, new_idx = leaf_test(jnp.where(do_leaf, slot, -1),
                                   ray_o, ray_d, best_t, best_idx,
                                   skip_fields)
        best_t = jnp.where(do_leaf, new_t, best_t)
        best_idx = jnp.where(do_leaf, new_idx, best_idx)

        # Advance: internal hit → fall through to i+1; otherwise escape.
        nxt = jnp.where(hit_box & ~is_leaf, p + 1, jnp.take(bvh.skip, p))
        ptr = jnp.where(live, nxt, ptr)
        return ptr, best_t, best_idx

    init = (jnp.zeros((R,), jnp.int32),
            jnp.full((R,), jnp.inf, ray_o.dtype),
            jnp.full((R,), -1, jnp.int32))
    _, best_t, best_idx = jax.lax.while_loop(cond, body, init)
    return best_idx, best_t


def count_node_hits(bvh: BVHArrays, ray_o, ray_d):
    """Per-ray count of BVH nodes whose AABB the ray enters — the debug
    heat-map statistic (BVH.GetIntersectionCount, BVH.cs:352-363).  Dense
    [R × nodes] evaluation (debug tool, small node counts)."""
    from ..intersect.jnp_ref import aabb_slab

    near, far = aabb_slab(bvh.bmin, bvh.bmax, ray_o, ray_d)
    hit = (near <= far) & (far >= 0)
    return jnp.sum(hit, axis=1)
