"""Differentiable-parameter views of the scene.

The reference has no notion of gradients; here material parameters
(emission, diffuse, specular, transmission color, IOR, shininess — the six
per-primitive fields of Primitive.cs:96-133) are first-class optimization
targets.  ``SceneArrays`` also carries bool/int leaves (two_sided, invert,
prim ids) which ``jax.grad`` rejects, so optimization code works against the
float-only sub-pytree these helpers expose.
"""

from __future__ import annotations

from ..scene.types import SceneArrays

MATERIAL_FIELDS = ("emission", "diffuse", "specular", "refraction",
                   "refractive_index", "shininess")


def get_material_params(scene: SceneArrays) -> dict:
    """Float-only material parameter pytree (a dict of [N,...] arrays)."""
    return {f: getattr(scene.materials, f) for f in MATERIAL_FIELDS}


def with_material_params(scene: SceneArrays, params: dict) -> SceneArrays:
    """Rebuild the scene with the given material parameters spliced in."""
    return scene.replace(materials=scene.materials.replace(**params))
