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

from . import core, scene  # noqa: F401
