"""Sharded render and optimization steps.

Replaces the reference's thread-pool orchestration (FullRaytracer.cs) with
SPMD over a device mesh: scene/BVH arrays replicated, pixels/rays sharded on
the ``rays`` axis, XLA inserting the collectives (loss/grad reductions ride
the ICI).  The film stays sharded by image rows; only display/IO gathers it.

The reference has no gradient path at all; the train step here optimizes the
material table against a target image — the "training" workload the
perf baseline measures (fwd+bwd rays/sec).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..diff import with_material_params
from ..intersect.dispatch import closest_hit
from ..render import camera as cam_mod
from ..render.film import Film
from ..render.integrator import trace
from ..render.replay import trace_replay
from ..scene.types import SceneArrays
from .mesh import ray_sharded, replicated


def place_scene(mesh: Mesh, scene: SceneArrays) -> SceneArrays:
    """Replicate the scene pytree on every device (SURVEY §2.5 strategy 2)."""
    return jax.device_put(scene, replicated(mesh))


def place_film(mesh: Mesh, film: Film) -> Film:
    """Shard the film by image rows over the rays axis."""
    rs = ray_sharded(mesh, 3)
    rs2 = ray_sharded(mesh, 2)
    return Film(color_sum=jax.device_put(film.color_sum, rs),
                samples=jax.device_put(film.samples, rs2),
                misses=jax.device_put(film.misses, rs2))


def make_sharded_render_pass(mesh: Mesh, closest_fn=closest_hit) -> Callable:
    """A jitted progressive pass with rays sharded over the mesh.

    Pixel index arrays are constrained to the rays axis; GSPMD propagates the
    sharding through camera-ray generation, the bounce loop and the film
    update, so each device traces its contiguous block of image rows.
    """
    rs1 = ray_sharded(mesh, 1)

    @jax.jit
    def render_pass(scene: SceneArrays, camera, film: Film, key) -> Film:
        h, w = film.shape
        px, py = cam_mod.pixel_grid(w, h)
        px = jax.lax.with_sharding_constraint(px, rs1)
        py = jax.lax.with_sharding_constraint(py, rs1)
        k_cam, k_path = jax.random.split(key)
        ray_o, ray_d = cam_mod.camera_rays(camera, px, py, k_cam)
        color, miss = trace(scene, ray_o, ray_d, k_path,
                            closest_fn=closest_fn)
        return film.add_full_frame(color, miss)

    return render_pass


def make_train_step(mesh: Optional[Mesh], optimizer: optax.GradientTransformation,
                    closest_fn=closest_hit, use_replay: bool = True) -> Callable:
    """A jitted material-optimization step: render → L2 image loss → grads →
    optax update.

    With a mesh, pixels/target are sharded over ``rays`` and the parameter
    gradients are all-reduced by XLA (replicated params + sharded loss);
    pass ``mesh=None`` for single-device.

    ``use_replay`` routes the loss through the path-replay estimator
    (:func:`..render.replay.trace_replay`): identical values and gradients
    to ``trace`` (tested bitwise), but the backward pass differentiates only
    the [R]-shaped replay instead of re-running selection per bounce —
    the 20x fwd+bwd win.  Set False to reverse-differentiate the full
    bounce loop (the slow oracle the replay is tested against).

    Returns ``step(params, scene, camera, target, opt_state, key)
    → (params, opt_state, loss)``.
    """
    rs1 = ray_sharded(mesh, 1) if mesh is not None else None
    trace_fn = trace_replay if use_replay else trace

    @jax.jit
    def step(params, scene: SceneArrays, camera, target, opt_state, key):
        h, w = target.shape[:2]

        def loss_fn(p):
            s = with_material_params(scene, p)
            px, py = cam_mod.pixel_grid(w, h)
            if rs1 is not None:
                px = jax.lax.with_sharding_constraint(px, rs1)
                py = jax.lax.with_sharding_constraint(py, rs1)
            k_cam, k_path = jax.random.split(key)
            ray_o, ray_d = cam_mod.camera_rays(camera, px, py, k_cam)
            color, miss = trace_fn(s, ray_o, ray_d, k_path,
                                   closest_fn=closest_fn)
            img = jnp.where(miss[:, None], 0.0, color).reshape(h, w, 3)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
