"""Pallas block-beam BVH traversal — the at-scale [NATIVE-TIER] closest hit.

Why a kernel: the XLA ``while_loop`` traversal (bvh/traverse.py) advances
every ray one node per iteration with per-lane gathers; measured on TPU v5e
it runs ~25,000x slower than the dense Pallas path (15k rays/sec at 2.9k
tris).  TPUs have no per-lane gather — data-dependent access must be
scalar-driven (pallas_guide.md: dynamic slices / scalar prefetch), so the
TPU-native design makes traversal decisions at *block* granularity:

* each grid program owns a block of 1024 rays, laid out (8, 128) on the VPU;
* the whole node table lives in VMEM packed [N, 8] f32 (bmin, bmax, skip,
  leaf-slot — ints stored as exact-below-2^24 floats), read with scalar
  dynamic indices;
* the block walks the skip-link preorder ONCE: a subtree is entered when
  ANY live lane's slab test enters the node's box (a "beam" traversal —
  the block visits the union of its rays' node sets, so coherent blocks
  approach per-ray traversal cost while the worst case is bounded by the
  preorder walk);
* leaf triangles are packed contiguously per leaf ([L, K*16] f32 rows in
  HBM), fetched by scalar-indexed async DMA into VMEM scratch — never
  gathered per lane — and tested against all 1024 lanes with the same
  Möller–Trumbore + invert/two-sided/skip-hit semantics as the dense
  selection (kernel_body.triangle_pass / Triangle.cs:148-224,
  Primitive.cs:46-75).

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

BLOCK = 1024           # rays per grid program, shaped (8, 128)
LANES = (8, 128)
TRI_F = 16             # packed floats per leaf triangle (see pack_leaf_tris)
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


def pack_leaf_tris(bvh: BVHArrays, tri, mats) -> np.ndarray:
    """[L, K*TRI_F] f32 leaf-triangle blocks, DMA-ready.

    Per-triangle layout (TRI_F floats):
      v0(3), e1(3), e2(3), fn(3) face normal, row, mirror, invert, two_sided
    Empty slots have row = -1.
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
    rows = np.maximum(leaf_prims, 0)
    valid = leaf_prims >= 0
    out[:, :K, 0:3] = v0[rows]
    out[:, :K, 3:6] = e1[rows]
    out[:, :K, 6:9] = e2[rows]
    out[:, :K, 9:12] = fn[rows]
    out[:, :K, 12] = np.where(valid, leaf_prims, -1).astype(np.float32)
    out[:, :K, 13] = mirror[rows].astype(np.float32)
    pid = np.maximum(prim_id[rows], 0)
    out[:, :K, 14] = (invert[pid] & valid).astype(np.float32)
    out[:, :K, 15] = (two_sided[pid] | ~valid).astype(np.float32)
    return out.reshape(L, K_pad * TRI_F)


def _traverse_kernel(nodes_ref, leaf_hbm, ox, oy, oz, dx, dy, dz,
                     sk_row, sk_px, sk_py, sk_pz, sk_leaving, sk_inside,
                     sk_scale, out_row, out_t,
                     leaf_vmem, best_t_ref, best_row_ref, sem,
                     *, n_nodes, K, eps_behind, eps_pos):
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

    def slab(bx0, by0, bz0, bx1, by1, bz1):
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
        return near, far

    def tri_test(m):
        """One packed triangle (scalar reads via m(col)) vs all lanes.

        Mirrors kernel_body.triangle_pass validity semantics exactly."""
        v0x, v0y, v0z = m(0), m(1), m(2)
        e1x, e1y, e1z = m(3), m(4), m(5)
        e2x, e2y, e2z = m(6), m(7), m(8)
        fnx, fny, fnz = m(9), m(10), m(11)
        row = m(12)
        mirror = m(13) != 0
        inv_f = m(14) != 0
        two_s = m(15) != 0

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

        on_plane = jnp.abs(fx * fnx + fy * fny + fz * fnz) <= eps_behind
        degen = (det == 0) & on_plane
        u = jnp.where(degen, e1x * fx + e1y * fy + e1z * fz, u_n)
        v = jnp.where(degen, e2x * fx + e2y * fy + e2z * fz, v_n)
        tt = jnp.where(degen, 0.0, t_n)
        inside_geo = degen | (inv < 0)

        uv_lim = jnp.where(mirror, v, u + v)
        ok = ((u >= 0) & (u <= 1) & (v >= 0) & (uv_lim <= 1)
              & (degen | (tt >= -eps_behind)) & ((det != 0) | degen)
              & (row >= 0))
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
        return ok, tt, row

    def body(p):
        m = lambda c: nodes_ref[p, c]
        near, far = slab(m(0), m(1), m(2), m(3), m(4), m(5))
        hit = (near <= far) & (far >= -eps_behind) & (near <= best_t_ref[:])
        anyhit = jnp.any(hit)
        skip_to = m(6)
        slot = m(7)
        is_leaf = slot >= 0

        @pl.when(anyhit & is_leaf)
        def _leaf():
            cp = pltpu.make_async_copy(
                leaf_hbm.at[pl.ds(slot.astype(jnp.int32), 1), :],
                leaf_vmem, sem)
            cp.start()
            cp.wait()
            for k in range(K):
                ok, tt, row = tri_test(
                    lambda c, k=k: leaf_vmem[0, k * TRI_F + c])
                better = ok & (tt < best_t_ref[:])
                best_t_ref[:] = jnp.where(better, tt, best_t_ref[:])
                best_row_ref[:] = jnp.where(better, row, best_row_ref[:])

        descend = anyhit & jnp.logical_not(is_leaf)
        return jnp.where(descend, (p + 1).astype(jnp.float32),
                         skip_to).astype(jnp.int32)

    jax.lax.while_loop(lambda p: p < n_nodes, body, jnp.int32(0))

    out_row[:] = best_row_ref[:].reshape(-1)
    out_t[:] = best_t_ref[:].reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "K", "interpret",
                                    "eps_behind", "eps_pos"))
def _traverse_call(nodes, leaf_tris, rays, skip_fields, *, n_nodes, K,
                   eps_behind, eps_pos, interpret=False):
    R = rays[0].shape[0]
    assert R % BLOCK == 0
    grid = (R // BLOCK,)
    ray_spec = pl.BlockSpec((BLOCK,), lambda i: (i,))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(
        0 for _ in a.shape))

    kernel = functools.partial(
        _traverse_kernel, n_nodes=n_nodes, K=K,
        eps_behind=float(eps_behind), eps_pos=float(eps_pos))
    out_row, out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            full(nodes),                           # node table: whole, VMEM
            pl.BlockSpec(memory_space=pl.ANY),     # leaf tris stay in HBM
        ] + [ray_spec] * 13,
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((R,), jnp.float32),
                   jax.ShapeDtypeStruct((R,), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((1, leaf_tris.shape[1]), jnp.float32),
            pltpu.VMEM(LANES, jnp.float32),
            pltpu.VMEM(LANES, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(nodes, leaf_tris, *rays, *skip_fields)
    return out_row, out_t


class PallasBVH:
    """Packed arrays + selection entry for the Pallas traversal."""

    def __init__(self, bvh: BVHArrays, tri, mats, n_prims: int):
        self.nodes = jnp.asarray(pack_nodes(bvh))
        self.leaf_tris = jnp.asarray(pack_leaf_tris(bvh, tri, mats))
        self.K = int(self.leaf_tris.shape[1]) // TRI_F  # incl. align pad
        self.n_nodes = int(bvh.n_nodes)
        # prim id → triangle-table row (for skip-hit row matching).
        prim_id = np.asarray(tri.prim_id)
        inv = np.full(max(n_prims, 1), -1, np.int32)
        ok = prim_id >= 0
        inv[prim_id[ok]] = np.nonzero(ok)[0].astype(np.int32)
        self.prim_to_row = jnp.asarray(inv)
        # VMEM budget: nodes must fit on-core (v5e ~16 MB).
        vmem_bytes = self.nodes.size * 4
        if vmem_bytes > 12 * 2 ** 20:
            raise ValueError(
                f"BVH node table {vmem_bytes/2**20:.0f} MB exceeds the VMEM "
                f"budget; raise leaf_size (nodes halve per doubling)")

    def _sort_key(self, ray_o, ray_d):
        """Coherence key: direction octant (high bits) + 6-bit-per-axis
        Morton code of the origin within the root AABB.

        Secondary bounce rays arrive in pixel order but scattered in space;
        blocks of 1024 pixel-ordered rays then span much of the scene and
        the beam union degrades toward the full preorder walk.  Sorting by
        (octant, origin locality) re-forms tight beams. Parked dead lanes
        (origin 4e8) all share one key bucket and compact together.
        """
        root_min = self.nodes[0, 0:3]
        root_max = self.nodes[0, 3:6]
        ext = jnp.maximum(root_max - root_min, 1e-30)
        q = jnp.clip((ray_o - root_min) / ext, 0.0, 1.0)
        q = (q * 63.0).astype(jnp.int32)  # 6 bits per axis

        def spread(x):  # interleave: bit i -> bit 3i (standard 3D Morton)
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        morton = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
                  | (spread(q[:, 2]) << 2))
        octant = ((ray_d[:, 0] >= 0).astype(jnp.int32)
                  + 2 * (ray_d[:, 1] >= 0).astype(jnp.int32)
                  + 4 * (ray_d[:, 2] >= 0).astype(jnp.int32))
        return (octant << 18) | morton

    def select(self, ray_o, ray_d, skip, eps_behind, eps_pos,
               interpret=False, sort: bool = False):
        """(best_row [R] i32 or -1, any [R] bool) — dispatch tri_select.

        ``sort=True`` permutes rays into (octant, Morton) order before the
        kernel and inverts the permutation after.  Algorithmically this
        re-forms coherent beams for secondary bounces, but measured on v5e
        the XLA argsort+gather round trips cost ~4x the traversal savings
        (2.86 -> 11.4 s/pass on 32k tris at 512^2), so it is OFF by
        default — kept for hardware where gathers are cheaper."""
        if sort:
            key = self._sort_key(ray_o, ray_d)
            perm = jnp.argsort(key)
            take = lambda a: jnp.take(a, perm, axis=0)
            skip_p = None if skip is None else jax.tree.map(take, skip)
            row_p, any_p = self.select(take(ray_o), take(ray_d), skip_p,
                                       eps_behind, eps_pos,
                                       interpret=interpret, sort=False)
            inv = jnp.argsort(perm)
            return jnp.take(row_p, inv), jnp.take(any_p, inv)
        R = ray_o.shape[0]
        pad = (-R) % BLOCK
        pz = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        o = pz(ray_o)
        d = pz(ray_d)
        rays = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])

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
            sk = (pz(srow.astype(jnp.float32)),
                  pz(skip.position[:, 0]), pz(skip.position[:, 1]),
                  pz(skip.position[:, 2]),
                  pz(leaving.astype(jnp.float32)),
                  pz(skip.inside.astype(jnp.float32)),
                  pz(scale))
        row, _t = _traverse_call(
            self.nodes, self.leaf_tris, rays, sk,
            n_nodes=self.n_nodes, K=self.K,
            eps_behind=float(eps_behind), eps_pos=float(eps_pos),
            interpret=interpret)
        row = row[:R].astype(jnp.int32)
        return jnp.maximum(row, 0), row >= 0
