"""raytracercore_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CPU path tracer (Zaggy1024/RaytracerCore): progressive
unidirectional path tracing with per-primitive materials (emission, diffuse,
specular, transmission + IOR, shininess), exact Fresnel with total internal
reflection, triangle/mirrored-quad, sphere/ellipsoid and plane primitives,
BVH acceleration — rebuilt as a batched, differentiable wavefront over SoA
scene arrays, sharded across TPU meshes.

Layering (bottom-up):
  core/      batched math, RNG, color/tonemap
  scene/     text-format loader → SoA scene arrays
  intersect/ jnp + Pallas intersection kernels, closest-hit dispatch
  bvh/       host SAH builder + flattened-array traversal
  render/    wavefront integrator, film accumulation, progressive renderer
  parallel/  device meshes, shard_map'd render/grad steps
  tools/     debug raycaster, bounce traces, CLI, image IO
"""

__version__ = "0.1.0"

import jax as _jax

# Every matmul/einsum in this package is geometry (sphere/ellipsoid ray
# transforms) or an exact one-hot row gather — never a tolerance-friendly
# NN contraction.  The TPU default precision multiplies in bf16, which
# corrupts those at ~4e-3 relative (measured round 3: the root cause of
# the megakernel/integrator divergence).  Default the whole package to
# full-f32 matmuls; hot sites additionally pin precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import core, scene  # noqa: F401
