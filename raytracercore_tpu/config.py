"""Central runtime configuration.

The reference's "config system" is compile-time defines scattered across
files (``#define BVH`` Scene.cs:1, ``HIT_STRUCT`` Hit.cs:1, SIMD feature
booleans Vec4D.cs:20-26 — SURVEY §5.6/§2.8).  Here every tunable lives in one
module so the thresholds that used to disagree (dense-kernel prim cap vs the
BVH auto switch) are defined once, next to the measurements that justify
them.
"""

from __future__ import annotations

# Dense selection implementation for the [rays × prims] closest-hit scan:
#   "pallas" — fused Pallas TPU kernel (native tier: full lane occupancy,
#              zero [rays × prims] HBM traffic); interpreted on CPU.
#   "rt"     — [rays, prims] jnp grids (portable XLA fallback, and the
#              oracle the Pallas kernels are equivalence-tested against).
SELECT_IMPL = "pallas"

# The fused Pallas kernels keep every primitive table row in VMEM and unroll
# the table loop, so they are capped.  Past the cap the dense path falls back
# to "rt" grids — but at that size brute force is the wrong algorithm anyway
# and the Renderer switches to the BVH (below).
PALLAS_MAX_PRIMS = 768

# The whole-path MEGAKERNEL unrolls the table loop x every bounce, so its
# scoped-VMEM footprint grows ~bounces x prims: measured on v5e, 22 prims
# at rec10 compiles comfortably but 322 prims at rec4 exceeds the 16 MB
# scoped-vmem limit by 41 MB (scripts/bvh_threshold_probe.py).  Scenes
# between this cap and PALLAS_MAX_PRIMS use the per-bounce fused select
# kernel instead (one bounce per launch — 1/bounces the scoped pressure).
FUSED_MAX_PRIMS = 64

# Megakernel triangle test: keep the scalar path's coplanar ray-in-plane
# branch (Triangle.cs:161-171)?  False matches the reference's own
# PRODUCTION tier — its AVX path (RayTraceAVXFaster, Triangle.cs:107-125,
# active whenever AVX2+FMA exist, i.e. on the benchmark machine) has no
# coplanar branch (NaN-scrubs 1/det and falls through) — and saves ~10%
# of megakernel ops (the kernel is issue-bound at the measured VPU rate,
# docs/ROOFLINE.md, so op count converts ~1:1 to time).  det == 0 is
# measure-zero under jittered camera rays; bench.py's on-hardware
# megakernel-vs-XLA equivalence check (the XLA integrator keeps exact
# scalar semantics) guards the fraction empirically — still 1.0000 with
# this False.  Set True to restore the scalar branch in-kernel.
FUSED_COPLANAR_BRANCH = False

# Renderer(accelerator="auto") switches triangles to the BVH above this
# count.  Set to the Pallas cap: below it the fused megakernel (whole bounce
# loop in VMEM) wins by a wide margin — the threshold is a capability
# boundary (past the cap the dense path falls off the Pallas tier to XLA
# [rays x prims] grids), not a perf crossover.  Measurement on TPU v5e:
# docs/bvh_threshold.md (scripts/bvh_threshold_probe.py).
BVH_AUTO_THRESHOLD = PALLAS_MAX_PRIMS
