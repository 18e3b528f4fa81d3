"""Pallas TPU closest-hit kernel.

This is the [NATIVE-TIER] replacement for the reference's AVX2 intersection
routines (SIMDHelpers.cs, Triangle.cs:76-146, Sphere.cs:50-155) done the TPU
way: one fused kernel walks every primitive table with rays laid out as
(sublanes × 128 lanes) tiles, keeping all candidate state in registers — no
[rays × prims] HBM traffic, full lane occupancy.

The kernel emits BOTH:

* per-table winner indices — the stop-gradient SELECTION result consumed by
  the differentiable winner re-evaluation in :mod:`.dispatch` (train path);
* the complete hit record (t, position, normal, inside, prim) computed
  in-kernel — the fast FORWARD path (progressive rendering), which skips the
  [R, 3]-shaped jnp evaluation entirely.

Semantics identical to :mod:`.jnp_ref` — pinned by equivalence tests
(interpret mode on CPU).  Tables are packed into dense f32/i32 matrices kept
whole in VMEM; suited to brute-force-sized tables (≤ ~768 primitives);
larger scenes route triangles through the BVH instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import SceneArrays
from . import kernel_body as kb

LANES = 128
BM = 32          # sublane rows per ray block → 32×128 = 4096 rays/block
BLOCK = BM * LANES

_pack_tables = kb.pack_tables


def _make_kernel(T: int, S: int, P: int, eps_behind: float, eps_pos: float,
                 has_skip: bool):
    """Build the kernel body for static table sizes."""

    def kernel(ox, oy, oz, dx, dy, dz,
               skp, spx, spy, spz, snx, sny, snz, sin_,
               tf, ti, sf, si, pf, pi,
               tri_idx_o, sph_idx_o, sph_near_o, pl_idx_o,
               t_o, prim_o, inside_o, px_o, py_o, pz_o, nx_o, ny_o, nz_o):
        o3 = (ox[:], oy[:], oz[:])
        d3 = (dx[:], dy[:], dz[:])
        shape = o3[0].shape
        inf = jnp.full(shape, jnp.inf, jnp.float32)
        neg1 = jnp.full(shape, -1, jnp.int32)

        skip = None
        if has_skip:
            skip = {"prim": skp[:], "px": spx[:], "py": spy[:], "pz": spz[:],
                    "nx": snx[:], "ny": sny[:], "nz": snz[:],
                    "inside": sin_[:]}
        skip_match = kb.make_skip_match(shape, d3, skip, eps_pos)

        best = kb.GlobalBest(shape)

        # Per-table winner index tracking wrapped around the global commit.
        state = {"t": inf, "i": neg1, "n": jnp.zeros(shape, jnp.int32)}

        def emit(row, ok, tt, prim, inside_i32, pos3, nrm3, extra):
            better_tab = ok & (tt < state["t"])
            state["t"] = jnp.where(better_tab, tt, state["t"])
            state["i"] = jnp.where(better_tab, row, state["i"])
            if "v_near" in extra:
                state["n"] = jnp.where(better_tab, extra["v_near"],
                                       state["n"])
            best.commit(ok, tt, prim, inside_i32, pos3, nrm3)

        kb.triangle_pass(T, tf, ti, o3, d3, eps_behind, skip_match, emit)
        tri_idx_o[:] = state["i"]

        state["t"], state["i"] = inf, neg1
        kb.sphere_pass(S, sf, si, o3, d3, skip_match, emit)
        sph_idx_o[:] = state["i"]
        sph_near_o[:] = state["n"]

        state["t"], state["i"] = inf, neg1
        kb.plane_pass(P, pf, pi, o3, d3, eps_behind, skip_match, emit)
        pl_idx_o[:] = state["i"]

        # --- global record outputs --------------------------------------
        found = best.prim >= 0
        t_o[:] = jnp.where(found, best.t, 0.0)
        prim_o[:] = best.prim
        inside_o[:] = best.inside
        px_o[:], py_o[:], pz_o[:] = best.pos
        nx_o[:], ny_o[:], nz_o[:] = best.nrm

    return kernel


N_OUT = 13


@functools.partial(jax.jit, static_argnames=("T", "S", "P", "eps_behind",
                                             "eps_pos", "has_skip",
                                             "interpret"))
def _run(ox, oy, oz, dx, dy, dz, skp, spx, spy, spz, snx, sny, snz, sin_,
         tf, ti, sf, si, pf, pi, T, S, P, eps_behind, eps_pos, has_skip,
         interpret):
    m = ox.shape[0]
    grid = (m // BM,)
    ray_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BM, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = _make_kernel(T, S, P, eps_behind, eps_pos, has_skip)
    i32 = jax.ShapeDtypeStruct((m, LANES), jnp.int32)
    f32 = jax.ShapeDtypeStruct((m, LANES), jnp.float32)
    out_shapes = (i32, i32, i32, i32, f32, i32, i32,
                  f32, f32, f32, f32, f32, f32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 14 + [table_spec(a)
                                    for a in (tf, ti, sf, si, pf, pi)],
        out_specs=(out_spec,) * N_OUT,
        out_shape=out_shapes,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, skp, spx, spy, spz, snx, sny, snz, sin_,
      tf, ti, sf, si, pf, pi)


def _invoke(scene, ray_o, ray_d, skip, eps_behind, eps_pos, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = ray_o.shape[0]
    pad = (-R) % BLOCK
    m = (R + pad) // LANES

    def prep(a):
        return jnp.pad(a, (0, pad)).reshape(m, LANES).astype(jnp.float32)

    ox, oy, oz = (prep(ray_o[:, k]) for k in range(3))
    dx, dy, dz = (prep(ray_d[:, k]) for k in range(3))

    if skip is None:
        zf = jnp.zeros((m, LANES), jnp.float32)
        zi = jnp.zeros((m, LANES), jnp.int32)
        skp, spx, spy, spz = zi, zf, zf, zf
        snx, sny, snz, sin_ = zf, zf, zf, zi
        has_skip = False
    else:
        skp = jnp.pad(skip.prim, (0, pad),
                      constant_values=-1).reshape(m, LANES)
        spx, spy, spz = (prep(skip.position[:, k]) for k in range(3))
        snx, sny, snz = (prep(skip.normal[:, k]) for k in range(3))
        sin_ = jnp.pad(skip.inside.astype(jnp.int32),
                       (0, pad)).reshape(m, LANES)
        has_skip = True

    tf, ti, sf, si, pf, pi = _pack_tables(scene)
    outs = _run(ox, oy, oz, dx, dy, dz, skp, spx, spy, spz, snx, sny, snz,
                sin_, tf.astype(jnp.float32), ti, sf.astype(jnp.float32),
                si, pf.astype(jnp.float32), pi,
                T=tf.shape[0], S=sf.shape[0], P=pf.shape[0],
                eps_behind=float(eps_behind), eps_pos=float(eps_pos),
                has_skip=has_skip, interpret=bool(interpret))
    unpack = lambda a: a.reshape(-1)[:R]
    return [unpack(a) for a in outs]


def select_all(scene: SceneArrays, ray_o, ray_d, skip, eps_behind, eps_pos,
               interpret=None):
    """Selection-phase outputs for the differentiable dispatch path.

    Returns ((tri_idx, tri_any), (sph_idx, use_near, sph_any),
    (pl_idx, pl_any)).
    """
    outs = _invoke(scene, ray_o, ray_d, skip, eps_behind, eps_pos, interpret)
    tri_idx, sph_idx, sph_near, pl_idx = outs[:4]
    return ((jnp.maximum(tri_idx, 0), tri_idx >= 0),
            (jnp.maximum(sph_idx, 0), sph_near != 0, sph_idx >= 0),
            (jnp.maximum(pl_idx, 0), pl_idx >= 0))


def closest_hit_fused(scene: SceneArrays, ray_o, ray_d, skip,
                      interpret=None):
    """Full HitRecord straight from the kernel (forward/rendering path;
    NOT differentiable — use dispatch.closest_hit for gradients)."""
    from ..core import vecmath as vm
    from .dispatch import HitRecord, _position_eps

    dtype = ray_o.dtype
    outs = _invoke(scene, ray_o, ray_d, skip, vm.near_enough(dtype),
                   _position_eps(dtype), interpret)
    (_, _, _, _, t, prim, inside, px, py, pz, nx, ny, nz) = outs
    return HitRecord(
        prim=prim.astype(jnp.int32), t=t.astype(dtype),
        position=jnp.stack([px, py, pz], axis=1).astype(dtype),
        normal=jnp.stack([nx, ny, nz], axis=1).astype(dtype),
        inside=inside != 0)
