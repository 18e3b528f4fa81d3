"""Progressive accumulation film.

The device-resident replacement for the reference's ``SampleSet[,]`` grid
(Raytracing/SampleSet.cs, FullRaytracer.cs:259-266): per-pixel color sum,
hit-sample count and miss count, living on device as a pytree — trivially
checkpointable and shard-able, unlike the reference's RAM-only state
(SURVEY §5.4).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.color import to_uint8, tonemap


class Film(struct.PyTreeNode):
    color_sum: jnp.ndarray  # [H, W, 3]
    samples: jnp.ndarray    # [H, W] float (counts)
    misses: jnp.ndarray     # [H, W]

    @classmethod
    def create(cls, height: int, width: int, dtype=jnp.float32):
        return cls(color_sum=jnp.zeros((height, width, 3), dtype),
                   samples=jnp.zeros((height, width), dtype),
                   misses=jnp.zeros((height, width), dtype))

    @property
    def shape(self):
        return self.samples.shape

    def add_full_frame(self, color, miss):
        """Accumulate one sample for every pixel (row-major flat [H*W, 3]).

        A miss sample contributes to ``misses`` only (the Placeholder path,
        FullRaytracer.cs:334-337); hits add color + sample count.
        """
        h, w = self.shape
        color = color.reshape(h, w, 3)
        miss = miss.reshape(h, w)
        hit = ~miss
        return Film(
            color_sum=self.color_sum + jnp.where(hit[..., None], color, 0.0),
            samples=self.samples + hit.astype(self.samples.dtype),
            misses=self.misses + miss.astype(self.misses.dtype),
        )

    def add_scatter(self, pix_linear, color, miss):
        """Accumulate samples at arbitrary pixel indices (tile/shard path)."""
        h, w = self.shape
        hit = ~miss
        cs = self.color_sum.reshape(h * w, 3).at[pix_linear].add(
            jnp.where(hit[:, None], color, 0.0))
        sm = self.samples.reshape(h * w).at[pix_linear].add(
            hit.astype(self.samples.dtype))
        ms = self.misses.reshape(h * w).at[pix_linear].add(
            miss.astype(self.misses.dtype))
        return Film(color_sum=cs.reshape(h, w, 3),
                    samples=sm.reshape(h, w), misses=ms.reshape(h, w))

    def merge(self, other: "Film") -> "Film":
        """Combine two accumulators (cross-device reduction)."""
        return Film(color_sum=self.color_sum + other.color_sum,
                    samples=self.samples + other.samples,
                    misses=self.misses + other.misses)

    def to_image(self, background_rgb, background_alpha, exposure=1.0):
        """Tonemapped [0,1] image + alpha (SampleSet.GetOutput semantics)."""
        return tonemap(self.color_sum, self.samples, self.misses,
                       background_rgb, background_alpha, exposure)

    def to_uint8(self, background_rgb, background_alpha, exposure=1.0):
        rgb, alpha = self.to_image(background_rgb, background_alpha, exposure)
        return to_uint8(rgb, alpha)
