"""Color helpers mirroring the reference ``DoubleColor`` semantics.

Colors are linear-RGB ``[..., 3]`` arrays, unclamped (DoubleColor.cs:6-7).
The ``Placeholder`` sentinel (-1,-1,-1) used by the reference to mean
"unset / miss" (DoubleColor.cs:19) is represented host-side as ``None`` and
device-side as an explicit miss flag — no sentinel colors ever reach the
device arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.601 luma weights, DoubleColor.GetLuminance (DoubleColor.cs:76-81).
_LUMA = (0.299, 0.587, 0.114)
LUM_R, LUM_G, LUM_B = _LUMA


def luminance(rgb):
    """Rec.601 luminance of an ``[..., 3]`` linear color."""
    return (
        _LUMA[0] * rgb[..., 0] + _LUMA[1] * rgb[..., 1] + _LUMA[2] * rgb[..., 2]
    )


def tonemap(color_sum, samples, misses, background_rgb, background_alpha,
            exposure=1.0):
    """Reproduce ``SampleSet.GetOutput`` (SampleSet.cs:61-113) in batch.

    Args:
      color_sum: [H, W, 3] accumulated linear color of hit samples.
      samples:   [H, W] count of hit samples.
      misses:    [H, W] count of miss samples.
      background_rgb: [3] background color, background_alpha: scalar.
      exposure: scalar multiplier applied before compositing.

    Returns:
      (rgb [H, W, 3] in [0,1] after gamma, alpha [H, W]).
    """
    samples = samples.astype(color_sum.dtype)
    misses = misses.astype(color_sum.dtype)
    total = samples + misses

    # Pixels with zero hit samples show the raw background (SampleSet.cs:63-64).
    no_samples = samples == 0

    color_mult = exposure / jnp.maximum(samples, 1.0)
    rgb = color_sum * color_mult[..., None]

    back_alpha_amt = jnp.where(total > 0, misses / jnp.maximum(total, 1.0), 0.0)
    back_amt = back_alpha_amt * background_alpha

    rgb = rgb + (background_rgb - rgb) * back_amt[..., None]
    alpha = 1.0 + (background_alpha - 1.0) * back_alpha_amt

    rgb = jnp.where(
        no_samples[..., None], background_rgb * exposure, rgb
    )
    alpha = jnp.where(no_samples, background_alpha, alpha)

    gamma = 1.0 / 2.2
    rgb = jnp.power(jnp.clip(rgb, 0.0, None), gamma)
    return jnp.clip(rgb, 0.0, 1.0), jnp.clip(alpha, 0.0, 1.0)


def to_uint8(rgb, alpha=None):
    """Pack tonemapped [0,1] floats to uint8, truncating like the reference
    ``(int)(x * 255)`` (SampleSet.cs:47-53)."""
    out = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
    if alpha is None:
        return out
    a = jnp.clip(alpha * 255.0, 0, 255).astype(jnp.uint8)
    return jnp.concatenate([out, a[..., None]], axis=-1)
