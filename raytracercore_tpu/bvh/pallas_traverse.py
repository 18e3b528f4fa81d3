"""Pallas block-beam BVH traversal — the at-scale [NATIVE-TIER] closest hit.

Why a kernel: the XLA ``while_loop`` traversal (bvh/traverse.py) advances
every ray one node per iteration with per-lane gathers; measured on TPU v5e
it runs ~25,000x slower than the dense Pallas path (15k rays/sec at 2.9k
tris).  TPUs have no per-lane gather — data-dependent access must be
scalar-driven (pallas_guide.md: dynamic slices / scalar prefetch), so the
TPU-native design makes traversal decisions at *beam* granularity.

Round-4 kernel ("octo-walk"): the round-3 kernel walked one 1024-ray beam
per grid program and paid ~270 ns per node visit (4 scalar loads + an
any-lane reduce + a data-dependent branch — docs/SCALE.md).  This kernel
restructures the walk around the three levers that budget identified:

* **8 independent 128-ray sub-beams** per 1024-ray block, one per VPU
  sublane row.  Each sub-beam walks the skip-link preorder with its OWN
  position pointer, so each walks only the union of *its* 128 rays' node
  sets (the round-3 beam walked the union of all 1024 — measured ~8x
  redundancy for sorted secondary rays, scripts/beam_model.py), and the 8
  pointer chains give the scalar core 8 independent dependency chains to
  pipeline.
* **Batched node testing**: per iteration the 8 chains' packed node
  records are gathered into one (8, 4) scratch row-set (vector fetch +
  lane/sublane roll per chain, one masked combine, one store), unpacked as
  (8, 1) box planes, and slab-tested against all 8 sub-beams in ONE
  (8, 128) vector pass — the vector cost of one round-3 visit now covers 8
  visits.  Any-hit is a per-row lane reduce; the 8 branch decisions read
  one (8, 1) bit plane with static-index scalar loads.
* **Per-row leaf broadcast**: a chain entering a leaf parks it as
  "pending" (starting its DMA into that chain's row of an (8, K·F) leaf
  scratch) and keeps walking; when no chain can advance without a flush,
  all pending leaves are tested in ONE batched pass — each sublane row
  tests its own leaf's K records against its own 128 rays, so up to 8
  leaves ride a single set of Möller–Trumbore vector ops, and the DMAs
  overlap the walking between flushes.

The leaf tests mirror the dense selection semantics exactly
(kernel_body.triangle_pass / Triangle.cs:148-224, Primitive.cs:46-75);
per-ray results are bit-identical to the per-ray skip-link walk: each ray's
leaves are processed in preorder order (a conservative superset — a leaf
box no lane of the row enters contributes no accepted hit), and the strict
``t <`` update keeps the earliest-preorder winner on ties.

Traversal returns only (winning row, t) per ray; the dispatch layer
re-evaluates the winner differentiably (dispatch._triangle_winner_eval).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .builder import BVHArrays

import os

BLOCK = 1024           # rays per grid program, shaped (8, 128)
# Chunked flush early-exit (round 5): skip trailing 16-record chunks
# beyond the pending leaves' max valid count.  Same-day A/B at 46k/512²:
# 255 -> 239 ms/pass; RTC_CHUNK_FLUSH=0 restores the flat loop.
CHUNK_FLUSH = os.environ.get("RTC_CHUNK_FLUSH", "1") != "0"
LANES = (8, 128)
CHAINS = 8             # independent 128-ray sub-beams per block
TRI_F = 16             # packed floats per leaf triangle (see pack_leaf_tris)
SPH_F = 8              # packed floats per leaf sphere (see pack_leaf_spheres)
SPT_F = 32             # packed floats per leaf ellipsoid (transformed sphere)
NEG = -1.0


def pack_nodes(bvh: BVHArrays) -> np.ndarray:
    """[N, 8] f32: bmin(3), bmax(3), skip, leaf_slot."""
    n = bvh.n_nodes
    out = np.zeros((n, 8), np.float32)
    out[:, 0:3] = np.asarray(bvh.bmin)
    out[:, 3:6] = np.asarray(bvh.bmax)
    out[:, 6] = np.asarray(bvh.skip).astype(np.float32)
    out[:, 7] = np.asarray(bvh.leaf_slot).astype(np.float32)
    return out


def _bf16_down(v: np.ndarray) -> np.ndarray:
    """A bf16-representable f32 ≤ v (pad by > 1 bf16 ulp, then truncate —
    robust across signs and zero crossings; enlarges boxes ≤ ~1%)."""
    v = np.asarray(v, np.float32)
    pad = np.abs(v) * np.float32(2 ** -7) + np.float32(1e-30)
    t = ((v - pad).view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    assert (t <= v).all()
    return t


def _bf16_up(v: np.ndarray) -> np.ndarray:
    return -_bf16_down(-np.asarray(v))


def pack_nodes4(bvh: BVHArrays) -> np.ndarray:
    """Compact [N, 4] i32 node table — HALF the scalar loads per walked
    node, the measured bottleneck of the traversal loop (~17 ns per scalar
    VMEM load on v5e; 8 loads/node dominated the round-2 iteration):

      w0..w2: per-axis box slab packed as two bf16 halves of one i32 word
              (hi = bmin rounded DOWN, lo = bmax rounded UP — conservative,
              so culling stays exact);
      w3:     internal node → skip link; leaf → -(slot + 1).  A leaf's
              preorder escape is always p+1, so one signed word carries
              both fields exactly.

    The table is emitted as [ceil(N/32) (8-padded), 128] — 32 records per
    128-lane row.  A VMEM [N, 4] layout lane-pads the minor dimension to
    128 (32x blowup: 179 MB for the 1M-triangle tree), and Mosaic scalar
    loads cannot use a dynamic LANE index, so the kernel fetches an
    8-aligned (8, 128) row window with a dynamic-slice vector load and
    lane/sublane-rolls the wanted record into a fixed position.
    """
    bmin = np.asarray(bvh.bmin, np.float32)
    bmax = np.asarray(bvh.bmax, np.float32)
    lo = _bf16_down(bmin)
    hi = _bf16_up(bmax)
    assert (lo <= bmin).all() and (hi >= bmax).all()
    lo_b = lo.view(np.uint32)
    hi_b = hi.view(np.uint32)
    skip = np.asarray(bvh.skip, np.int64)
    slot = np.asarray(bvh.leaf_slot, np.int64)
    w3 = np.where(slot >= 0, -(slot + 1), skip).astype(np.int32)
    out = np.zeros((bvh.n_nodes, 4), np.int32)
    for a in range(3):
        out[:, a] = ((lo_b[:, a] & 0xFFFF0000)
                     | (hi_b[:, a] >> 16)).astype(np.uint32).view(np.int32)
    out[:, 3] = w3
    n_pad = (-bvh.n_nodes) % 256  # 8 rows x 32 records
    if n_pad:
        # Padding records: empty box (never entered), skip = past-the-end.
        pad = np.zeros((n_pad, 4), np.int32)
        pad[:, 3] = bvh.n_nodes
        out = np.concatenate([out, pad])
    return out.reshape(-1, 128)


def pack_leaf_tris(bvh: BVHArrays, tri, mats) -> np.ndarray:
    """[L, K*TRI_F] f32 leaf-triangle blocks, DMA-ready.

    Per-triangle layout (TRI_F floats):
      v0(3), e1(3), e2(3), fn(3) face normal, row,
      flags (mirror | invert<<1 | two_sided<<2), prim_id, count
    Empty slots have row = prim = -1.  prim_id rides in the record so the
    kernel can emit the full winner hit detail (round 5) without any
    XLA-side [R]-row gathers — the measured dominant cost of the
    per-bounce "eval" stage (scripts/prof_scale.py).  Slot 15 of EVERY
    record carries the leaf's valid-record count (binned-SAH leaves
    average ~67% of the leaf-size cap at 1M tris), letting the flush skip
    whole trailing chunks when every pending leaf is short.
    """
    leaf_prims = np.asarray(bvh.leaf_prims)
    L, K = leaf_prims.shape
    v0 = np.asarray(tri.v0, np.float32)
    e1 = np.asarray(tri.e1, np.float32)
    e2 = np.asarray(tri.e2, np.float32)
    fn = np.asarray(tri.normal, np.float32)
    mirror = np.asarray(tri.mirror)
    prim_id = np.asarray(tri.prim_id)
    invert = np.asarray(mats.invert)
    two_sided = np.asarray(mats.two_sided)

    # Lane-align DMA rows: Mosaic HBM slices must be multiples of 128
    # floats, so pad the slot count to a multiple of 8 (8 * TRI_F = 128).
    # Padded slots carry row = -1 → tri_test rejects them.
    K_pad = -(-K // 8) * 8
    out = np.zeros((L, K_pad, TRI_F), np.float32)
    out[..., 12] = -1.0
    out[..., 14] = -1.0
    rows = np.maximum(leaf_prims, 0)
    valid = leaf_prims >= 0
    out[:, :K, 0:3] = v0[rows]
    out[:, :K, 3:6] = e1[rows]
    out[:, :K, 6:9] = e2[rows]
    out[:, :K, 9:12] = fn[rows]
    out[:, :K, 12] = np.where(valid, leaf_prims, -1).astype(np.float32)
    pid = np.maximum(prim_id[rows], 0)
    smooth = np.asarray(tri.smooth)
    out[:, :K, 13] = (mirror[rows].astype(np.int32)
                      + 2 * (invert[pid] & valid).astype(np.int32)
                      + 4 * (two_sided[pid] | ~valid).astype(np.int32)
                      + 8 * (smooth[rows] & valid).astype(np.int32)
                      ).astype(np.float32)
    out[:, :K, 14] = np.where(valid, prim_id[rows], -1).astype(np.float32)
    # Valid-count per leaf in slot 15 (chunked flush early-exit).  The
    # builder packs valid records as a prefix — assert it, since the
    # early-exit silently drops any record past the count.
    count = valid.sum(1)
    assert (valid == (np.arange(K)[None, :] < count[:, None])).all()
    out[..., 15] = count[:, None].astype(np.float32)
    out = out.reshape(L, K_pad * TRI_F)
    # Pad rows to a multiple of 8: the resident-mode flush fetches an
    # 8-aligned (8, W) window around each pending slot.
    L_pad = (-L) % 8
    if L_pad:
        pad = np.zeros((L_pad, K_pad * TRI_F), np.float32)
        pad[:, 12::TRI_F] = -1.0
        pad[:, 14::TRI_F] = -1.0
        out = np.concatenate([out, pad])
    return out


def pack_leaf_spheres(bvh: BVHArrays, sph, mats) -> np.ndarray:
    """[L, K*SPH_F] f32 leaf-sphere blocks, DMA-ready.

    Per-sphere layout (SPH_F floats):
      center(3), radius, row, invert, two_sided, prim_id
    Empty slots have row = prim = -1.  Only untransformed spheres belong
    here (build_sphere_bvh); the kernel test is the plain quadratic.
    """
    leaf_prims = np.asarray(bvh.leaf_prims)
    L, K = leaf_prims.shape
    center = np.asarray(sph.center, np.float32)
    radius = np.asarray(sph.radius, np.float32)
    prim_id = np.asarray(sph.prim_id)
    invert = np.asarray(mats.invert)
    two_sided = np.asarray(mats.two_sided)

    # Lane-align DMA rows: 16 * SPH_F = 128 floats.
    K_pad = -(-K // 16) * 16
    out = np.zeros((L, K_pad, SPH_F), np.float32)
    out[..., 4] = -1.0
    out[..., 7] = -1.0
    rows = np.maximum(leaf_prims, 0)
    valid = leaf_prims >= 0
    out[:, :K, 0:3] = center[rows]
    out[:, :K, 3] = radius[rows]
    out[:, :K, 4] = np.where(valid, leaf_prims, -1).astype(np.float32)
    pid = np.maximum(prim_id[rows], 0)
    out[:, :K, 5] = (invert[pid] & valid).astype(np.float32)
    out[:, :K, 6] = (two_sided[pid] | ~valid).astype(np.float32)
    out[:, :K, 7] = np.where(valid, prim_id[rows], -1).astype(np.float32)
    out = out.reshape(L, K_pad * SPH_F)
    L_pad = (-L) % 8
    if L_pad:
        pad = np.zeros((L_pad, K_pad * SPH_F), np.float32)
        pad[:, 4::SPH_F] = -1.0
        pad[:, 7::SPH_F] = -1.0
        out = np.concatenate([out, pad])
    return out


def pack_leaf_ellipsoids(bvh: BVHArrays, sph, mats) -> np.ndarray:
    """[L, K*SPT_F] f32 leaf-ellipsoid blocks (TRANSFORMED spheres).

    Per-record layout (SPT_F floats):
      w2o rows (12), o2w rows (12), center(3), radius, row, invert,
      two_sided, prim_id.  Empty slots have row = prim = -1.  The kernel
    leaf test runs the object-space quadratic with per-root world mapping
    (Sphere.cs:156-209 via kernel_body.sphere_pass semantics).
    """
    leaf_prims = np.asarray(bvh.leaf_prims)
    L, K = leaf_prims.shape
    w2o = np.asarray(sph.world_to_obj, np.float32)[:, :3, :].reshape(-1, 12)
    o2w = np.asarray(sph.obj_to_world, np.float32)[:, :3, :].reshape(-1, 12)
    center = np.asarray(sph.center, np.float32)
    radius = np.asarray(sph.radius, np.float32)
    prim_id = np.asarray(sph.prim_id)
    invert = np.asarray(mats.invert)
    two_sided = np.asarray(mats.two_sided)

    K_pad = -(-K // 4) * 4          # 4 * SPT_F = 128 floats per lane row
    out = np.zeros((L, K_pad, SPT_F), np.float32)
    out[..., 28] = -1.0
    out[..., 31] = -1.0
    rows = np.maximum(leaf_prims, 0)
    valid = leaf_prims >= 0
    out[:, :K, 0:12] = w2o[rows]
    out[:, :K, 12:24] = o2w[rows]
    out[:, :K, 24:27] = center[rows]
    out[:, :K, 27] = radius[rows]
    out[:, :K, 28] = np.where(valid, leaf_prims, -1).astype(np.float32)
    pid = np.maximum(prim_id[rows], 0)
    out[:, :K, 29] = (invert[pid] & valid).astype(np.float32)
    out[:, :K, 30] = (two_sided[pid] | ~valid).astype(np.float32)
    out[:, :K, 31] = np.where(valid, prim_id[rows], -1).astype(np.float32)
    out = out.reshape(L, K_pad * SPT_F)
    L_pad = (-L) % 8
    if L_pad:
        pad = np.zeros((L_pad, K_pad * SPT_F), np.float32)
        pad[:, 28::SPT_F] = -1.0
        pad[:, 31::SPT_F] = -1.0
        out = np.concatenate([out, pad])
    return out


def _traverse_kernel(nodes_ref, leaf_hbm, ox, oy, oz, dx, dy, dz,
                     sk_row, sk_px, sk_py, sk_pz, sk_leaving, sk_inside,
                     sk_scale, out_row, out_t, *rest,
                     n_nodes, K, eps_behind, eps_pos, leaf_kind="tri",
                     want_stats=False, walk_only=False, leaf_resident=True,
                     coplanar=True):
    # Detail outputs (round 5): the winner's full hit record is committed
    # IN-KERNEL per leaf-record test, so the dispatch layer never gathers
    # [R] rows from the primitive tables (XLA row gathers measured as the
    # dominant per-bounce "eval" cost at scale, scripts/prof_scale.py).
    (out_prim, out_px, out_py, out_pz, out_nx, out_ny, out_nz,
     out_ifl, out_u, out_v) = rest[:10]
    rest = rest[10:]
    if want_stats:
        out_stats = rest[0]
        rest = rest[1:]
    (leaf_vmem, best_t_ref, best_row_ref, best_d_ref, bits_ref,
     sems) = rest
    o_x = ox[:].reshape(LANES)
    o_y = oy[:].reshape(LANES)
    o_z = oz[:].reshape(LANES)
    d_x = dx[:].reshape(LANES)
    d_y = dy[:].reshape(LANES)
    d_z = dz[:].reshape(LANES)
    k_row = sk_row[:].reshape(LANES)
    k_px = sk_px[:].reshape(LANES)
    k_py = sk_py[:].reshape(LANES)
    k_pz = sk_pz[:].reshape(LANES)
    k_leaving = sk_leaving[:].reshape(LANES) != 0
    k_inside = sk_inside[:].reshape(LANES) != 0
    k_scale = sk_scale[:].reshape(LANES)

    big = jnp.float32(3.4e38)
    inv_x = jnp.where(d_x != 0, 1.0 / jnp.where(d_x == 0, 1.0, d_x), big)
    inv_y = jnp.where(d_y != 0, 1.0 / jnp.where(d_y == 0, 1.0, d_y), big)
    inv_z = jnp.where(d_z != 0, 1.0 / jnp.where(d_z == 0, 1.0, d_z), big)
    # Sign-aware "infinite" slabs: with inv = ±3.4e38 the products below
    # saturate in f32 only for astronomically distant boxes; the zero-dir
    # NaN case of (b - o) * inf cannot occur since inv is finite.

    best_t_ref[:] = jnp.full(LANES, jnp.inf, jnp.float32)
    best_row_ref[:] = jnp.full(LANES, NEG, jnp.float32)
    zeros_l = jnp.zeros(LANES, jnp.float32)
    for _k in range(10):
        best_d_ref[_k] = jnp.full(LANES, NEG, jnp.float32) if _k == 0 \
            else zeros_l

    row_iota = jax.lax.broadcasted_iota(jnp.int32, LANES, 0)
    row_iota1 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def tri_test(m):
        """Per-row packed triangles ((8, 1) reads via m(col)) vs all lanes
        — each sublane row tests ITS OWN pending leaf's record against its
        own 128-ray sub-beam.  Mirrors kernel_body.triangle_pass validity
        semantics exactly.  Returns the full candidate detail (FLAT
        normal; smooth scenes re-interpolate the winner's normal XLA-side
        from the committed u/v — dispatch.make_bvh_closest_fn)."""
        v0x, v0y, v0z = m(0), m(1), m(2)
        e1x, e1y, e1z = m(3), m(4), m(5)
        e2x, e2y, e2z = m(6), m(7), m(8)
        fnx, fny, fnz = m(9), m(10), m(11)
        row = m(12)
        flag_i = m(13).astype(jnp.int32)
        mirror = (flag_i & 1) != 0
        inv_f = (flag_i & 2) != 0
        two_s = (flag_i & 4) != 0
        prim = m(14)

        sx = d_y * e2z - d_z * e2y
        sy = d_z * e2x - d_x * e2z
        sz = d_x * e2y - d_y * e2x
        det = e1x * sx + e1y * sy + e1z * sz
        fx, fy, fz = o_x - v0x, o_y - v0y, o_z - v0z
        inv = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        u_n = inv * (fx * sx + fy * sy + fz * sz)
        ocx = fy * e1z - fz * e1y
        ocy = fz * e1x - fx * e1z
        ocz = fx * e1y - fy * e1x
        v_n = inv * (d_x * ocx + d_y * ocy + d_z * ocz)
        t_n = inv * (e2x * ocx + e2y * ocy + e2z * ocz)

        if coplanar:
            # Scalar-tier coplanar ray-in-plane case (Triangle.cs:161-171).
            on_plane = jnp.abs(fx * fnx + fy * fny + fz * fnz) <= eps_behind
            degen = (det == 0) & on_plane
            u = jnp.where(degen, e1x * fx + e1y * fy + e1z * fz, u_n)
            v = jnp.where(degen, e2x * fx + e2y * fy + e2z * fz, v_n)
            tt = jnp.where(degen, 0.0, t_n)
            inside_geo = degen | (inv < 0)
            ok_det = (degen | (tt >= -eps_behind)) & ((det != 0) | degen)
        else:
            # Production tier (config.FUSED_COPLANAR_BRANCH=False): the
            # reference's own AVX path has no coplanar branch
            # (Triangle.cs:107-125); matches the megakernel's static
            # default and saves ~1/4 of the flush's per-record ops.
            u, v, tt = u_n, v_n, t_n
            inside_geo = inv < 0
            ok_det = (tt >= -eps_behind) & (det != 0)

        uv_lim = jnp.where(mirror, v, u + v)
        ok = ((u >= 0) & (u <= 1) & (v >= 0) & (uv_lim <= 1)
              & ok_det & (row >= 0))
        inside = jnp.logical_xor(inside_geo, inv_f)
        ok = ok & (two_s | ~inside)

        # Skip-hit (Util.RayHitMatches) against the exact hit position.
        hx = v0x + e1x * u + e2x * v
        hy = v0y + e1y * u + e2y * v
        hz = v0z + e1z * u + e2z * v
        d2 = (hx - k_px) ** 2 + (hy - k_py) ** 2 + (hz - k_pz) ** 2
        pos_close = d2 <= (eps_pos * eps_pos) * k_scale
        parity = jnp.logical_xor(k_leaving, inside == k_inside)
        match = (k_row == row) & (k_row >= 0) & pos_close & parity
        ok = ok & ~match
        flip = jnp.where(inside_geo, -1.0, 1.0)
        smooth = (flag_i & 8) != 0
        ifl = (jnp.where(inside, 1.0, 0.0)
               + jnp.where(inside_geo, 2.0, 0.0)
               + jnp.where(smooth, 4.0, 0.0))
        detail = (prim, hx, hy, hz, fnx * flip, fny * flip, fnz * flip,
                  ifl, u, v)
        return ok, tt, row, detail

    # Normalized ray directions for the sphere tests: the dense path
    # re-normalizes (Ray.Transform, Ray.cs:43-50) and on TANGENT rays the
    # discriminant's sign flips with sub-ulp |d| deviations — measured
    # round 4 as the sphere-BVH's entire 0.09% bounce disagreement
    # (grazing hits on spheres adjacent to the previous bounce).
    if leaf_kind != "tri":
        dn_len = jnp.sqrt(jnp.maximum(
            d_x * d_x + d_y * d_y + d_z * d_z, 1e-30))
        n_x, n_y, n_z = d_x / dn_len, d_y / dn_len, d_z / dn_len

    def sph_test(m):
        """Per-row packed untransformed spheres ((8, 1) reads via m(col))
        vs all lanes: the quadratic of Sphere.DoRayTrace
        (Sphere.cs:175-209) on the RE-NORMALIZED direction (matching the
        dense jnp_ref.sphere_candidates), with both roots,
        two-sided/invert filtering and the skip-hit rule applied per
        root, preferring the near root (the reference's ordered candidate
        scan)."""
        cx, cy, cz, r = m(0), m(1), m(2), m(3)
        row = m(4)
        inv_f = m(5) != 0
        two_s = m(6) != 0
        prim = m(7)

        fx, fy, fz = o_x - cx, o_y - cy, o_z - cz
        b = -2.0 * (fx * n_x + fy * n_y + fz * n_z)
        cq = fx * fx + fy * fy + fz * fz - r * r
        disc = b * b - 4.0 * cq
        has = disc >= 0
        radix = jnp.sqrt(jnp.where(has, disc, 0.0))
        any_hit = has & (radix >= -b) & (row >= 0)
        both = radix < b
        t_near = (b - radix) * 0.5
        t_far = (b + radix) * 0.5
        inside_near = inv_f          # geometric False ^ invert
        inside_far = jnp.logical_not(inv_f)

        def skipm(t, inside):
            hx = o_x + n_x * t
            hy = o_y + n_y * t
            hz = o_z + n_z * t
            d2 = (hx - k_px) ** 2 + (hy - k_py) ** 2 + (hz - k_pz) ** 2
            pos_close = d2 <= (eps_pos * eps_pos) * k_scale
            parity = jnp.logical_xor(k_leaving, inside == k_inside)
            return (k_row == row) & (k_row >= 0) & pos_close & parity

        near_ok = (any_hit & both & (two_s | jnp.logical_not(inside_near))
                   & ~skipm(t_near, inside_near))
        far_ok = (any_hit & (two_s | jnp.logical_not(inside_far))
                  & ~skipm(t_far, inside_far))
        ok = near_ok | far_ok
        # Return t in the dense path's world metric d·(pos−o) = |d|·t_n̂
        # (t_near/t_far are distances along the RE-normalized direction):
        # the dispatch merge compares tiers' t directly (t_b <= t_best),
        # and a mixed convention can flip near-tie winner picks when |d|
        # drifts between the every-3rd-bounce renormalizations.
        t_pick = jnp.where(near_ok, t_near, t_far)
        tt = t_pick * dn_len
        # Hit detail (Sphere.GetHit, Sphere.cs:156-173): position along
        # the normalized direction, normal (pos - c)/r negated on the
        # geometric-inside (far) root.
        hx = o_x + n_x * t_pick
        hy = o_y + n_y * t_pick
        hz = o_z + n_z * t_pick
        inv_r = 1.0 / r
        gflip = jnp.where(near_ok, inv_r, -inv_r)
        # inside/geo flags as f32 arithmetic — Mosaic rejects selects
        # BETWEEN 1-bit vectors (selecting on an i1 condition is fine).
        in_n_f = jnp.where(inside_near, 1.0, 0.0)
        in_f_f = jnp.where(inside_far, 1.0, 0.0)
        ifl = (jnp.where(near_ok, in_n_f, in_f_f)
               + jnp.where(near_ok, 0.0, 2.0))  # far root = geo-inside
        detail = (prim, hx, hy, hz, (hx - cx) * gflip, (hy - cy) * gflip,
                  (hz - cz) * gflip, ifl, jnp.zeros_like(tt),
                  jnp.zeros_like(tt))
        return ok, tt, row, detail

    def spht_test(m):
        """Per-row packed TRANSFORMED spheres (ellipsoids): the full
        object-space quadratic of Sphere.DoRayTrace (Sphere.cs:156-209),
        mirroring kernel_body.sphere_pass — ray into object space with
        re-normalized direction (Ray.cs:43-50), both roots, per-root world
        position via obj_to_world, world-metric t = d·(pos_w - o),
        two-sided/invert and skip-hit filtering per root, near root
        preferred."""
        row = m(28)
        inv_f = m(29) != 0
        two_s = m(30) != 0
        prim = m(31)

        oox = m(0) * o_x + m(1) * o_y + m(2) * o_z + m(3)
        ooy = m(4) * o_x + m(5) * o_y + m(6) * o_z + m(7)
        ooz = m(8) * o_x + m(9) * o_y + m(10) * o_z + m(11)
        ddx = m(0) * d_x + m(1) * d_y + m(2) * d_z
        ddy = m(4) * d_x + m(5) * d_y + m(6) * d_z
        ddz = m(8) * d_x + m(9) * d_y + m(10) * d_z
        dlen = jax.lax.rsqrt(
            jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-30))
        ddx, ddy, ddz = ddx * dlen, ddy * dlen, ddz * dlen

        cx, cy, cz, rad = m(24), m(25), m(26), m(27)
        fx, fy, fz = oox - cx, ooy - cy, ooz - cz
        b = -2.0 * (fx * ddx + fy * ddy + fz * ddz)
        cq = fx * fx + fy * fy + fz * fz - rad * rad
        disc = b * b - 4.0 * cq
        has = disc >= 0
        radix = jnp.sqrt(jnp.where(has, disc, 0.0))
        any_hit = has & (radix >= -b) & (row >= 0)
        both = radix < b

        def eval_root(t_obj, valid, inv_b):
            px = oox + ddx * t_obj
            py = ooy + ddy * t_obj
            pz = ooz + ddz * t_obj
            wx = m(12) * px + m(13) * py + m(14) * pz + m(15)
            wy = m(16) * px + m(17) * py + m(18) * pz + m(19)
            wz = m(20) * px + m(21) * py + m(22) * pz + m(23)
            tw = d_x * (wx - o_x) + d_y * (wy - o_y) + d_z * (wz - o_z)
            inside = jnp.logical_not(inv_f) if inv_b else inv_f
            d2 = (wx - k_px) ** 2 + (wy - k_py) ** 2 + (wz - k_pz) ** 2
            pos_close = d2 <= (eps_pos * eps_pos) * k_scale
            parity = jnp.logical_xor(k_leaving, inside == k_inside)
            match = (k_row == row) & (k_row >= 0) & pos_close & parity
            valid = valid & (two_s | ~inside) & ~match
            # World normal (Sphere.GetHit, Sphere.cs:156-173):
            # MatrixToNormal = w2o^T applied to the object normal,
            # normalized, negated on the geometric-inside (far) root.
            inv_rad = 1.0 / rad
            qx = (px - cx) * inv_rad
            qy = (py - cy) * inv_rad
            qz = (pz - cz) * inv_rad
            nwx = m(0) * qx + m(4) * qy + m(8) * qz
            nwy = m(1) * qx + m(5) * qy + m(9) * qz
            nwz = m(2) * qx + m(6) * qy + m(10) * qz
            nrl = jax.lax.rsqrt(
                jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30))
            flip = -nrl if inv_b else nrl
            return tw, valid, (wx, wy, wz), \
                (nwx * flip, nwy * flip, nwz * flip), inside

        t_near, near_ok, pos_n, nrm_n, in_n = eval_root(
            (b - radix) * 0.5, any_hit & both, False)
        t_far, far_ok, pos_f, nrm_f, in_f = eval_root(
            (b + radix) * 0.5, any_hit, True)
        ok = near_ok | far_ok
        tt = jnp.where(near_ok, t_near, t_far)
        pk = lambda a, b2: jnp.where(near_ok, a, b2)
        # f32 flag arithmetic — no selects between i1 vectors (Mosaic).
        ifl = (pk(jnp.where(in_n, 1.0, 0.0), jnp.where(in_f, 1.0, 0.0))
               + pk(jnp.zeros_like(tt), jnp.full_like(tt, 2.0)))
        detail = (prim, pk(pos_n[0], pos_f[0]), pk(pos_n[1], pos_f[1]),
                  pk(pos_n[2], pos_f[2]), pk(nrm_n[0], nrm_f[0]),
                  pk(nrm_n[1], nrm_f[1]), pk(nrm_n[2], nrm_f[2]),
                  ifl, jnp.zeros_like(tt), jnp.zeros_like(tt))
        return ok, tt, row, detail

    rec_f = {"tri": TRI_F, "sph": SPH_F, "spht": SPT_F}[leaf_kind]
    leaf_test = {"tri": tri_test, "sph": sph_test,
                 "spht": spht_test}[leaf_kind]

    def start_dma(r, si):
        pltpu.make_async_copy(leaf_hbm.at[pl.ds(si, 1), :],
                              leaf_vmem.at[pl.ds(r, 1), :],
                              sems.at[r]).start()

    def flush(pends):
        """Stage the 8 pending leaves and run ONE batched leaf pass:
        sublane row r tests chain r's pending leaf (masked where none
        pends).

        Resident mode (the default whenever node+leaf tables fit VMEM):
        assemble each pending row with an aligned vector fetch + sublane
        roll from the resident leaf table — measured round 4, the DMA
        path's per-flush semaphore waits cost ~12.5 us (the flush fires
        right after the blocking chain's take, so its copy is still in
        flight), which dominated the whole traversal."""
        if leaf_resident:
            W = leaf_vmem.shape[1]
            riw = jax.lax.broadcasted_iota(jnp.int32, (CHAINS, W), 0)
            acc2 = jnp.zeros((CHAINS, W), jnp.float32)
            for r in range(CHAINS):
                si = jnp.maximum(pends[r], 0)
                w = leaf_hbm[pl.ds(pl.multiple_of(si & jnp.int32(-8), 8),
                                   8), :]
                w = pltpu.roll(w, (r - (si & 7)) & 7, axis=0)
                acc2 = jnp.where(riw == r, w, acc2)
            leaf_vmem[:] = acc2
        else:
            for r in range(CHAINS):
                @pl.when(pends[r] >= 0)
                def _w(r=r):
                    pltpu.make_async_copy(
                        leaf_hbm.at[pl.ds(0, 1), :],
                        leaf_vmem.at[pl.ds(r, 1), :], sems.at[r]).wait()
        # Row mask as i32 (Mosaic rejects selects on 1-bit vectors).
        mi = jnp.zeros((8, 1), jnp.int32)
        for r in range(CHAINS):
            mi = jnp.where(row_iota1 == r,
                           (pends[r] >= 0).astype(jnp.int32), mi)
        maskb = mi != 0

        def test_k(k):
            ok, tt, row, detail = leaf_test(
                lambda c, k=k: leaf_vmem[:, k * rec_f + c:k * rec_f + c + 1])
            better = ok & (tt < best_t_ref[:]) & maskb
            best_t_ref[:] = jnp.where(better, tt, best_t_ref[:])
            best_row_ref[:] = jnp.where(better, row, best_row_ref[:])
            for j in range(10):
                best_d_ref[j] = jnp.where(better, detail[j],
                                          best_d_ref[j])

        CH = 16
        if CHUNK_FLUSH and leaf_kind == "tri" and leaf_resident \
                and K > CH:
            # Chunked early-exit: every record's slot 15 carries its
            # leaf's valid count (pack_leaf_tris), so the max over the
            # pending rows — 8 static-index scalar loads from the
            # assembled scratch — bounds the flush; binned-SAH leaves
            # average ~67% of the cap, so trailing chunks are often all
            # dead.  Records past the count are a padding suffix
            # (asserted at pack time).
            cmax = jnp.float32(0.0)
            for r in range(CHAINS):
                cr = jnp.where(pends[r] >= 0, leaf_vmem[r, 15], 0.0)
                cmax = jnp.maximum(cmax, cr)
            for c0 in range(0, K, CH):
                @pl.when(jnp.float32(c0) < cmax)
                def _chunk(c0=c0):
                    for k in range(c0, min(c0 + CH, K)):
                        test_k(k)
        else:
            for k in range(K):
                test_k(k)

    p_last = jnp.int32(n_nodes - 1)
    N_STATS = 5  # iters, visits, leaf-takes, flushes, flush-fill

    def body(carry):
        ps = carry[:CHAINS]
        pends = carry[CHAINS:2 * CHAINS]
        stats = carry[2 * CHAINS:]

        # --- Phase 1+2: gather + batched slab test for each chain's
        # CURRENT node (p) and its SPECULATED successor (p+1).  Both
        # links are fetch data (not test results), so the scalar side can
        # advance up to TWO nodes per vector->scalar sync: the p+1 probe
        # is consulted whenever step 1 lands there (enter or leaf
        # escape); only a step-1 skip wastes the speculation.
        def probe(offset):
            acc = jnp.zeros(LANES, jnp.int32)
            for r in range(CHAINS):
                pe = jnp.minimum(ps[r] + offset, p_last)
                rw = pe >> 5
                j = pe & 31
                w = nodes_ref[pl.ds(pl.multiple_of(rw & jnp.int32(-8), 8),
                                    8), :]
                w = pltpu.roll(w, (128 - (j << 2)) & 127, axis=1)
                w = pltpu.roll(w, (r - (rw & 7)) & 7, axis=0)
                acc = jnp.where(row_iota == r, w, acc)

            def unpk(c):
                word = jax.lax.slice(acc, (0, c), (8, c + 1))  # (8,1) i32
                hi = jax.lax.bitcast_convert_type(
                    word & jnp.int32(-65536), jnp.float32)
                lo = jax.lax.bitcast_convert_type(word << 16, jnp.float32)
                return hi, lo

            bx0, bx1 = unpk(0)
            by0, by1 = unpk(1)
            bz0, bz1 = unpk(2)
            tx0 = (bx0 - o_x) * inv_x
            tx1 = (bx1 - o_x) * inv_x
            ty0 = (by0 - o_y) * inv_y
            ty1 = (by1 - o_y) * inv_y
            tz0 = (bz0 - o_z) * inv_z
            tz1 = (bz1 - o_z) * inv_z
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            hitv = ((near <= far) & (far >= -eps_behind)
                    & (near <= best_t_ref[:]))
            w3col = jax.lax.slice(acc, (0, 3), (8, 4))
            hitcol = jnp.max(hitv.astype(jnp.int32), axis=1,
                             keepdims=True)
            return w3col, hitcol

        w3a, hita = probe(0)
        w3b, hitb = probe(1)
        # ONE store, ONE vector->scalar sync per iteration: lanes 0-1 =
        # current node's (link, hit), lanes 2-3 = speculated successor's.
        li128 = jax.lax.broadcasted_iota(jnp.int32, LANES, 1)
        bits_ref[:] = jnp.where(
            li128 == 0, w3a,
            jnp.where(li128 == 1, hita,
                      jnp.where(li128 == 2, w3b,
                                jnp.where(li128 == 3, hitb, 0))))

        # --- Phase 3: per-chain scalar control ---------------------------
        nxt, pend2, blocked, slots = [], [], [], []
        for r in range(CHAINS):
            w3 = bits_ref[r, 0]
            hit_r = bits_ref[r, 1] > 0
            w3s = bits_ref[r, 2]
            hit_s = bits_ref[r, 3] > 0
            is_leaf = w3 < 0
            leaf_s = w3s < 0
            active = ps[r] < n_nodes
            if walk_only:  # timing attribution: no DMA, no flush, no leaf
                n1 = jnp.where(
                    active, jnp.where(is_leaf | hit_r, ps[r] + 1, w3),
                    ps[r])
                at2 = (n1 == ps[r] + 1) & (ps[r] + 1 < n_nodes)
                step2 = jnp.where(leaf_s | hit_s, ps[r] + 2, w3s)
                nxt.append(jnp.where(at2, step2, n1))
                pend2.append(pends[r])
                blocked.append(active & (ps[r] < 0))  # constant False
                slots.append(jnp.int32(-1))
                continue
            want_leaf = active & hit_r & is_leaf
            has_pend = pends[r] >= 0
            take = want_leaf & jnp.logical_not(has_pend)
            blk = want_leaf & has_pend
            slot = -w3 - 1

            if not leaf_resident:
                @pl.when(take)
                def _s(r=r, slot=slot):
                    start_dma(r, slot)

            p1 = jnp.where(take, slot, pends[r])
            step = jnp.where(is_leaf | hit_r, ps[r] + 1, w3)
            n1 = jnp.where(active & jnp.logical_not(blk), step, ps[r])

            # Step 2: the chain sits at the speculated node p+1 — consult
            # its pre-fetched (link, hit) and advance again when possible
            # (a leaf it cannot take — pending occupied — simply waits
            # there; the chain still made step-1 progress, so it is not
            # "blocked" for the flush condition).
            at2 = (n1 == ps[r] + 1) & (ps[r] + 1 < n_nodes)
            want2 = at2 & hit_s & leaf_s
            take2 = want2 & jnp.logical_not(p1 >= 0)
            slot2 = -w3s - 1
            if not leaf_resident:
                @pl.when(take2)
                def _s2a(r=r, slot2=slot2):
                    start_dma(r, slot2)
            p2 = jnp.where(take2, slot2, p1)
            step2 = jnp.where(leaf_s | hit_s, ps[r] + 2, w3s)
            adv2 = at2 & (jnp.logical_not(leaf_s)
                          | jnp.logical_not(hit_s) | take2)
            pend2.append(p2)
            nxt.append(jnp.where(adv2, step2, n1))
            blocked.append(blk)
            slots.append(slot)

        # --- Phase 4: flush when no chain can advance without it ---------
        can_go = False
        for r in range(CHAINS):
            can_go = can_go | ((ps[r] < n_nodes)
                               & jnp.logical_not(blocked[r]))
        do_flush = jnp.logical_not(can_go)

        @pl.when(do_flush)
        def _f():
            flush(pend2)

        # Post-flush, a blocked chain takes the leaf it was waiting on and
        # advances in the SAME iteration (saves one full stall iteration
        # per blocked chain per flush).  DMA mode starts its copy here.
        retake = [do_flush & blocked[r] for r in range(CHAINS)]
        if not leaf_resident and not walk_only:
            for r in range(CHAINS):
                @pl.when(retake[r])
                def _s2(r=r):
                    start_dma(r, slots[r])
        pend3 = tuple(
            jnp.where(do_flush,
                      jnp.where(retake[r], slots[r], jnp.int32(-1)),
                      pend2[r])
            for r in range(CHAINS))
        nxt = [jnp.where(retake[r], ps[r] + 1, nxt[r])
               for r in range(CHAINS)]
        if want_stats:
            n_vis = jnp.int32(0)
            n_take = jnp.int32(0)
            n_fill = jnp.int32(0)
            for r in range(CHAINS):
                n_vis = n_vis + ((ps[r] < n_nodes)
                                 & jnp.logical_not(blocked[r])
                                 ).astype(jnp.int32)
                n_take = n_take + (pend2[r] != pends[r]).astype(jnp.int32) \
                    + retake[r].astype(jnp.int32)
                n_fill = n_fill + (do_flush
                                   & (pend2[r] >= 0)).astype(jnp.int32)
            stats = (stats[0] + 1, stats[1] + n_vis, stats[2] + n_take,
                     stats[3] + do_flush.astype(jnp.int32),
                     stats[4] + n_fill)
        return tuple(nxt) + pend3 + stats

    def cond(carry):
        alive = False
        for r in range(CHAINS):
            alive = alive | (carry[r] < n_nodes)
        return alive

    init = tuple(jnp.int32(0) for _ in range(CHAINS)) \
        + tuple(jnp.int32(-1) for _ in range(CHAINS)) \
        + ((jnp.int32(0),) * N_STATS if want_stats else ())
    final = jax.lax.while_loop(cond, body, init)
    flush(final[CHAINS:2 * CHAINS])
    if want_stats:
        # Scalar stores to VMEM are rejected — build the counter row as a
        # vector via iota selects and store once (block shape (1024,) to
        # match the XLA layout of the ray-sized outputs).
        li = jax.lax.broadcasted_iota(jnp.int32, LANES, 1)
        ri = jax.lax.broadcasted_iota(jnp.int32, LANES, 0)
        vec = jnp.zeros(LANES, jnp.float32)
        for c in range(N_STATS):
            vec = jnp.where((ri == 0) & (li == c),
                            final[2 * CHAINS + c].astype(jnp.float32), vec)
        out_stats[:] = vec.reshape(-1)

    out_row[:] = best_row_ref[:].reshape(-1)
    out_t[:] = best_t_ref[:].reshape(-1)
    for j, ref in enumerate((out_prim, out_px, out_py, out_pz, out_nx,
                             out_ny, out_nz, out_ifl, out_u, out_v)):
        ref[:] = best_d_ref[j].reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "K", "interpret",
                                    "eps_behind", "eps_pos", "leaf_kind",
                                    "want_stats", "walk_only",
                                    "leaf_resident", "coplanar"))
def _traverse_call(nodes, leaf_tris, rays, skip_fields, *, n_nodes, K,
                   eps_behind, eps_pos, interpret=False, leaf_kind="tri",
                   want_stats=False, walk_only=False, leaf_resident=True,
                   coplanar=True):
    R = rays[0].shape[0]
    assert R % BLOCK == 0
    grid = (R // BLOCK,)
    ray_spec = pl.BlockSpec((BLOCK,), lambda i: (i,))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(
        0 for _ in a.shape))

    kernel = functools.partial(
        _traverse_kernel, n_nodes=n_nodes, K=K,
        eps_behind=float(eps_behind), eps_pos=float(eps_pos),
        leaf_kind=leaf_kind, want_stats=want_stats, walk_only=walk_only,
        leaf_resident=leaf_resident, coplanar=coplanar)
    # Outputs: row, t, then the 10 winner-detail planes (prim, pos3,
    # flat-normal3, inside-flags, u, v), then optional stats.
    f32r = jax.ShapeDtypeStruct((R,), jnp.float32)
    out_shape = [f32r] * 12
    out_specs = [ray_spec] * 12
    if want_stats:
        out_shape.append(f32r)
        out_specs.append(ray_spec)
    # The resident tables legitimately exceed the 16 MB default scoped-VMEM
    # limit at scale (the 1M-triangle leaf table alone is ~90 MB; v5e has
    # 128 MB per core) — size the limit to the tables + working set.
    table_bytes = nodes.size * 4 + (leaf_tris.size * 4 if leaf_resident
                                    else 0)
    vmem_limit = min(int(table_bytes + 16 * 2 ** 20), 126 * 2 ** 20)
    vmem_limit = max(vmem_limit, 32 * 2 ** 20)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        in_specs=[
            full(nodes),                           # node table: whole, VMEM
            # Leaf records: resident in VMEM when they fit (with the node
            # table), else HBM behind scalar-indexed async copies.
            full(leaf_tris) if leaf_resident
            else pl.BlockSpec(memory_space=pl.ANY),
        ] + [ray_spec] * 13,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((CHAINS, leaf_tris.shape[1]), jnp.float32),
            pltpu.VMEM(LANES, jnp.float32),
            pltpu.VMEM(LANES, jnp.float32),
            pltpu.VMEM((10,) + LANES, jnp.float32),
            pltpu.VMEM(LANES, jnp.int32),
            pltpu.SemaphoreType.DMA((CHAINS,)),
        ],
        interpret=interpret,
    )(nodes, leaf_tris, *rays, *skip_fields)
    return out


class PallasBVH:
    """Packed arrays + selection entry for the Pallas traversal."""

    leaf_kind = "tri"

    def __init__(self, bvh: BVHArrays, tri, mats, n_prims: int):
        self.leaf_tris = jnp.asarray(pack_leaf_tris(bvh, tri, mats))
        self.K = int(self.leaf_tris.shape[1]) // TRI_F  # incl. align pad
        self._init_common(bvh, np.asarray(tri.prim_id), n_prims)

    def _init_common(self, bvh: BVHArrays, prim_id, n_prims: int):
        self.nodes = jnp.asarray(pack_nodes4(bvh))
        self.root_min = jnp.asarray(np.asarray(bvh.bmin[0], np.float32))
        self.root_max = jnp.asarray(np.asarray(bvh.bmax[0], np.float32))
        self.n_nodes = int(bvh.n_nodes)
        # prim id → own-table row (for skip-hit row matching).
        inv = np.full(max(n_prims, 1), -1, np.int32)
        ok = prim_id >= 0
        inv[prim_id[ok]] = np.nonzero(ok)[0].astype(np.int32)
        self.prim_to_row = jnp.asarray(inv)
        # VMEM budget: the packed node table must fit on-core next to the
        # kernel's working set (v5e VMEM = 128 MB; leave room for the leaf
        # scratch and the ray planes).  The leaf table rides resident too
        # whenever it fits — the DMA path's per-flush semaphore waits
        # measured ~12.5 us each (round 4), dominating traversal.
        node_bytes = self.nodes.size * 4
        leaf_bytes = self.leaf_tris.size * 4
        self.leaf_resident = node_bytes + leaf_bytes <= 100 * 2 ** 20
        if node_bytes > 96 * 2 ** 20:
            raise ValueError(
                f"BVH node table {node_bytes/2**20:.0f} MB exceeds the VMEM "
                f"budget; raise leaf_size (nodes halve per doubling)")

    # Sort-key shape: bits per axis of origin Morton, and per-axis
    # direction bits beyond the sign.  Round-5 1M measurement
    # (docs/SCALE.md): the round-4 key (octant + 6-bit Morton) left each
    # 128-ray sub-beam visiting ~100 leaves at 1M tris — the union, not
    # the per-flush cost, bounded the walk.
    SORT_MORTON_BITS = 8
    SORT_DIR_BITS = 0   # extra direction magnitude bits per axis

    def _sort_key(self, ray_o, ray_d):
        """Coherence key: direction bin (high bits) + per-axis Morton code
        of the origin within the root AABB.

        Secondary bounce rays arrive in pixel order but scattered in space;
        sub-beams of 128 pixel-ordered rays then span much of the scene and
        the beam union degrades toward the full preorder walk.  Sorting by
        (direction bin, origin locality) re-forms tight beams. Parked dead
        lanes (origin 4e8) all share one key bucket and compact together.
        """
        mb = self.SORT_MORTON_BITS
        db = self.SORT_DIR_BITS
        root_min = self.root_min
        root_max = self.root_max
        ext = jnp.maximum(root_max - root_min, 1e-30)
        q = jnp.clip((ray_o - root_min) / ext, 0.0, 1.0)
        q = (q * ((1 << mb) - 1)).astype(jnp.int32)

        def spread(x):  # interleave: bit i -> bit 3i (standard 3D Morton)
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        morton = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
                  | (spread(q[:, 2]) << 2))
        dq = jnp.clip((ray_d * 0.5 + 0.5), 0.0, 1.0)
        dbin = jnp.clip((dq * (1 << (db + 1))).astype(jnp.int32),
                        0, (1 << (db + 1)) - 1)
        dirbin = (dbin[:, 0] + ((1 << (db + 1)) * dbin[:, 1])
                  + ((1 << (2 * (db + 1))) * dbin[:, 2]))
        return (dirbin << (3 * mb)) | morton

    def select(self, ray_o, ray_d, skip, eps_behind, eps_pos,
               interpret=False, sort: bool = False, want_stats=False,
               walk_only=False, want_detail=False, coplanar=None):
        # (leaf residency is decided per-instance in _init_common)
        """(best_row [R] i32 or -1, any [R] bool) — dispatch tri_select.

        ``want_detail=True`` additionally returns the winner's full hit
        detail committed in-kernel (round 5): a dict with ``prim`` (i32),
        ``pos`` [R, 3], ``nrm`` [R, 3] (FLAT normal for triangles),
        ``inside``/``inside_geo`` (bool) and ``u``/``v`` — so the
        dispatch layer builds the HitRecord with ZERO [R]-row gathers
        from the primitive tables (the measured dominant per-bounce eval
        cost, scripts/prof_scale.py).  Detail is stop-gradient geometry
        by construction.

        ``sort=True`` permutes rays into (octant, Morton) order before the
        kernel and inverts the permutation after — re-forming coherent
        beams for secondary bounces (measured ~full-preorder walks per
        block without it, scripts/beam_model.py).  The permutation runs on
        [R] component planes (never [R, 3] — lane-padded gathers made an
        earlier row-shaped version cost 4x the traversal savings)."""
        R = ray_o.shape[0]
        pad = (-R) % BLOCK
        # Padding lanes are PARKED rays (origin far outside the root box,
        # +x direction) — a zero direction would make the slab test enter
        # every node and the tail block walk the whole preorder.
        pzc = lambda a, v: jnp.pad(a, (0, pad), constant_values=v)
        pz = lambda a: pzc(a, 0.0)
        ox_, oy_, oz_ = (pzc(ray_o[:, k], 4e8) for k in range(3))
        rays = (ox_, oy_, oz_, pzc(ray_d[:, 0], 1.0), pz(ray_d[:, 1]),
                pz(ray_d[:, 2]))

        n = R + pad
        if skip is None:
            sk = (jnp.full((n,), NEG, jnp.float32),) + tuple(
                jnp.zeros((n,), jnp.float32) for _ in range(5)) + (
                jnp.ones((n,), jnp.float32),)
        else:
            srow = jnp.where(
                skip.prim >= 0,
                jnp.take(self.prim_to_row, jnp.maximum(skip.prim, 0)),
                -1)
            leaving = (jnp.sum(ray_d * skip.normal, axis=-1) > 0)
            scale = 1.0 + jnp.sum(skip.position ** 2, axis=-1)
            sk = (pzc(srow.astype(jnp.float32), NEG),
                  pz(skip.position[:, 0]), pz(skip.position[:, 1]),
                  pz(skip.position[:, 2]),
                  pz(leaving.astype(jnp.float32)),
                  pz(skip.inside.astype(jnp.float32)),
                  pzc(scale, 1.0))

        idx_s = None
        if sort:
            # One multi-operand sort carries every ray/skip plane with the
            # key: measured on v5e, lax.sort with 13 payloads costs barely
            # more than argsort alone, while take/scatter of each plane
            # costs as much as the whole sort — so the permutation never
            # goes through XLA gathers.
            key = pzc(self._sort_key(ray_o, ray_d),
                      jnp.iinfo(jnp.int32).max)
            idx = jnp.arange(n, dtype=jnp.int32)
            out = jax.lax.sort((key, idx) + rays + sk, num_keys=1)
            idx_s = out[1]
            rays, sk = out[2:8], out[8:]

        if coplanar is None:
            # Match the megakernel's static production default (the
            # reference AVX tier has no coplanar branch — config.py).
            from ..config import FUSED_COPLANAR_BRANCH
            coplanar = FUSED_COPLANAR_BRANCH
        out = _traverse_call(
            self.nodes, self.leaf_tris, rays, sk,
            n_nodes=self.n_nodes, K=self.K,
            eps_behind=float(eps_behind), eps_pos=float(eps_pos),
            interpret=interpret, leaf_kind=self.leaf_kind,
            want_stats=want_stats, walk_only=walk_only,
            leaf_resident=self.leaf_resident, coplanar=bool(coplanar))
        row, t = out[0], out[1]
        detail_planes = out[2:12]
        if idx_s is not None:
            # Un-permute by sorting back on the carried original index
            # (one multi-payload sort — see the forward-sort note above).
            back = jax.lax.sort((idx_s, row, t)
                                + (detail_planes if want_detail else ()),
                                num_keys=1)
            row, t = back[1], back[2]
            if want_detail:
                detail_planes = back[3:]
        row = row[:R].astype(jnp.int32)
        res = jnp.maximum(row, 0), row >= 0, t[:R]
        if want_detail:
            (dp, dpx, dpy, dpz, dnx, dny, dnz, difl, du, dv) = (
                p[:R] for p in detail_planes)
            ifl = difl.astype(jnp.int32)
            res = res + ({
                "prim": dp.astype(jnp.int32),
                "pos": jnp.stack([dpx, dpy, dpz], axis=1),
                "nrm": jnp.stack([dnx, dny, dnz], axis=1),
                "inside": (ifl & 1) != 0,
                "inside_geo": (ifl & 2) != 0,
                "smooth": (ifl & 4) != 0,
                "u": du, "v": dv,
            },)
        if want_stats:
            return res + (out[12].reshape(-1, BLOCK)[:, :8],)
        return res


class PallasEllipsoidBVH(PallasBVH):
    """Block-beam traversal over TRANSFORMED spheres (ellipsoids) — closes
    the last dense-only tier (VERDICT r3 #5): the reference bounds
    transformed spheres into its BVH through IBoundedObject with affine
    AABBs (Sphere.cs:220-232, AABB.cs:22-36); here the exact closed-form
    world box feeds the same skip-link build, and the leaf records carry
    the transform matrices for the in-kernel object-space quadratic."""

    leaf_kind = "spht"

    def __init__(self, bvh: BVHArrays, sph, mats, n_prims: int):
        self.leaf_tris = jnp.asarray(pack_leaf_ellipsoids(bvh, sph, mats))
        self.K = int(self.leaf_tris.shape[1]) // SPT_F  # incl. align pad
        self._init_common(bvh, np.asarray(sph.prim_id), n_prims)


class PallasSphereBVH(PallasBVH):
    """Block-beam traversal over UNTRANSFORMED spheres — the acceleration
    tier the reference gives every primitive type through IBoundedObject
    (Scene.cs:39-49, Sphere.cs:220-232).  Shares the packed-node walk with
    the triangle kernel; only the leaf test differs (plain-sphere
    quadratic with per-root filtering).  Transformed spheres (ellipsoids)
    stay on the dense path."""

    leaf_kind = "sph"

    def __init__(self, bvh: BVHArrays, sph, mats, n_prims: int):
        self.leaf_tris = jnp.asarray(pack_leaf_spheres(bvh, sph, mats))
        self.K = int(self.leaf_tris.shape[1]) // SPH_F  # incl. align pad
        self._init_common(bvh, np.asarray(sph.prim_id), n_prims)
