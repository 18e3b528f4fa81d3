"""Debug/observability tooling — the reference's flagship feature set
(README.md:24-27): the DebugRaycaster overlay modes and the RayInspector
per-pixel bounce traces, rebuilt as host-side views over device buffers.

* :func:`primitive_id_map` — one-ray-per-pixel closest-hit view, primitive
  id → 7-color rotation (DebugRaycaster Primitives mode,
  DebugRaycaster.cs:193-199, 80-89).
* :func:`bvh_heatmap` — per-pixel count of BVH nodes whose AABB the ray
  hits, normalized to a white heat map (BoundingVolumes mode,
  DebugRaycaster.cs:200-212).
* :func:`trace_pixel` — N independent bounce traces through one pixel with
  BounceType tags + Fresnel ratios (RayInspector.RunTraces,
  Inspector/RayInspector.cs:139-155), replayed through the *same* integrator
  loop body at a fixed RNG key.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..intersect import closest_hit
from ..render import camera as cam_mod
from ..render.integrator import BounceType, trace
from ..scene.types import HostScene, freeze_scene, init_camera

# 7 distinct overlay colors (the reference rotates 7 hard-coded colors,
# DebugRaycaster.cs:80-89).
_ID_COLORS = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240]], dtype=np.uint8)


def _center_rays(scene: HostScene, camera_index: int):
    cam = init_camera(scene.cameras[camera_index], scene.width, scene.height)
    px, py = cam_mod.pixel_grid(scene.width, scene.height)
    # Pixel centers, no jitter/DoF (DebugRaycaster casts plain rays).
    return cam_mod.center_rays(cam, px, py)


def primitive_id_map(scene: HostScene, camera_index: int = 0) -> np.ndarray:
    """[H, W, 3] uint8 primitive-id false-color image; misses are black."""
    arrays = freeze_scene(scene)
    o, d = _center_rays(scene, camera_index)
    hit = jax.jit(closest_hit)(arrays, o, d, None)
    prim = np.asarray(hit.prim).reshape(scene.height, scene.width)
    img = _ID_COLORS[prim % len(_ID_COLORS)]
    img[prim < 0] = 0
    return img


def bvh_heatmap(scene: HostScene, camera_index: int = 0,
                bvh=None) -> np.ndarray:
    """[H, W, 3] uint8 white heat map of BVH-node AABB hits per pixel,
    normalized by the maximum (DebugRaycaster.cs:200-212, 246-249)."""
    from ..bvh.builder import build_bvh
    from ..bvh.traverse import count_node_hits

    arrays = freeze_scene(scene)
    if bvh is None:
        bvh = build_bvh(scene)
    o, d = _center_rays(scene, camera_index)
    counts = np.asarray(count_node_hits(bvh, o, d)).reshape(
        scene.height, scene.width)
    peak = max(counts.max(), 1)
    v = (counts / peak * 255).astype(np.uint8)
    return np.stack([v, v, v], axis=-1)


def selection_map(scene: HostScene, selection: str,
                  camera_index: int = 0, bvh=None) -> np.ndarray:
    """[H, W, 4] uint8 overlay of ONLY the selected primitive or BVH node —
    the DebugRaycaster Selection mode (DebugRaycaster.cs:21-78, 138-161:
    IIntersector adapters casting against a single primitive/object or a
    single bounding volume, ignoring the rest of the scene).

    ``selection``: "prim:<id>" (global primitive id; drawn in that id's
    rotation color) or "node:<index>" (preorder BVH node index; its AABB
    drawn white).  Alpha 255 where the ray hits the selection, 0 elsewhere.
    """
    kind, _, val = selection.partition(":")
    idx = int(val)
    o, d = _center_rays(scene, camera_index)
    h, w = scene.height, scene.width
    out = np.zeros((h, w, 4), np.uint8)

    if kind == "prim":
        arrays = freeze_scene(scene)
        # Retarget every other primitive row to padding (-1): closest_hit
        # then intersects ONLY the selected primitive — the reference's
        # single-primitive IIntersector (DebugRaycaster.cs:21-47).
        only = lambda tbl: tbl.replace(
            prim_id=jnp.where(tbl.prim_id == idx, tbl.prim_id, -1))
        arrays = arrays.replace(triangles=only(arrays.triangles),
                                spheres=only(arrays.spheres),
                                planes=only(arrays.planes))
        hit = jax.jit(closest_hit)(arrays, o, d, None)
        mask = np.asarray(hit.prim).reshape(h, w) == idx
        out[mask, :3] = _ID_COLORS[idx % len(_ID_COLORS)]
        out[mask, 3] = 255
    elif kind == "node":
        from ..bvh.builder import build_bvh
        from ..intersect.jnp_ref import aabb_slab

        if bvh is None:
            bvh = build_bvh(scene)
        if not 0 <= idx < bvh.n_nodes:
            raise ValueError(f"node {idx} out of range (0..{bvh.n_nodes-1})")
        near, far = aabb_slab(bvh.bmin[idx:idx + 1], bvh.bmax[idx:idx + 1],
                              o, d)
        mask = np.asarray((near <= far) & (far >= 0))[:, 0].reshape(h, w)
        out[mask] = 255
    else:
        raise ValueError(f"selection must be prim:<id> or node:<i>, "
                         f"got {selection!r}")
    return out


def trace_pixel(scene: HostScene, x: int, y: int, camera_index: int = 0,
                n_traces: int = 4, seed: int = 0) -> List[List[str]]:
    """Human-readable bounce listings for one pixel (the RayInspector view).

    Each trace uses its own RNG stream (jittered sub-pixel position + path
    randomness), like N clicks of the reference inspector.
    """
    arrays = freeze_scene(scene)
    cam = init_camera(scene.cameras[camera_index], scene.width, scene.height)
    px = jnp.full((n_traces,), x, jnp.int32)
    py = jnp.full((n_traces,), y, jnp.int32)
    key = jax.random.PRNGKey(seed)
    k_cam, k_path = jax.random.split(key)
    o, d = cam_mod.camera_rays(cam, px, py, k_cam)
    color, miss, rec = jax.jit(
        lambda a, o, d, k: trace(a, o, d, k, record=True))(
            arrays, o, d, k_path)

    btype = np.asarray(rec.btype)
    prim = np.asarray(rec.prim)
    t = np.asarray(rec.t)
    pos = np.asarray(rec.position)
    inside = np.asarray(rec.inside)
    fresnel = np.asarray(rec.fresnel)
    color = np.asarray(color)

    out: List[List[str]] = []
    for r in range(n_traces):
        lines = []
        for b in range(btype.shape[1]):
            bt = int(btype[r, b])
            if bt == BounceType.SKIPPED:
                break
            desc = BounceType.NAMES[bt]
            if prim[r, b] >= 0:
                p = pos[r, b]
                desc += (f" prim={int(prim[r, b])} t={t[r, b]:.5g}"
                         f" pos=({p[0]:.4g},{p[1]:.4g},{p[2]:.4g})"
                         f" inside={bool(inside[r, b])}")
            if np.isfinite(fresnel[r, b]):
                desc += f" fresnel={fresnel[r, b]:.4f}"
            lines.append(desc)
        c = color[r]
        lines.append(f"color=({c[0]:.5g},{c[1]:.5g},{c[2]:.5g})"
                     f" miss={bool(np.asarray(miss)[r])}")
        out.append(lines)
    return out
