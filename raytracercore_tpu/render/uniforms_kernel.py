"""On-core uniforms generation for the train path.

:func:`..render.integrator.prepare_uniforms` draws 5 uniforms per ray per
bounce with XLA threefry and preprocesses them into 7 channels; measured on
v5e at 700² rec10 (27M draws) that costs ~8.6 ms of the train step — a
quarter of the whole fwd+bwd budget — and switching XLA's generator to
"rbg" barely moves it (docs/TRAIN_STEP.md).  The draws are embarrassingly
parallel VPU work, so this module generates them *on core* with the
hardware PRNG (``pltpu.prng_seed`` / ``prng_random_bits``) and applies the
channel transforms in the same kernel: one output-only Pallas pass, no
input streaming, ~0.5 ms for the full [B, 7, R] tensor.

Stream semantics: the channel DISTRIBUTIONS are identical to
``prepare_uniforms`` (bits → [0,1) via the same ``>> 8`` / 2⁻²⁴ mapping
jax.random.uniform uses; same clip/log/trig transforms), but the bit
stream is the TPU hardware PRNG's, not threefry's — a different (equally
deterministic) sequence for the same key.  The TRAIN path only samples
from these distributions (record and replay consume the SAME tensor), so
the estimator is unchanged; the forward render path keeps
``prepare_uniforms`` so fixed-RNG fixtures and goldens are untouched.
:func:`..render.replay.trace_replay` routes here only on TPU.

Reference semantics carried by the transforms: Raytracer.cs:51-56 (shine
cone), 177 (branch variate), 215-216 (diffuse cone) — see
``prepare_uniforms``'s channel table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BM = 64  # sublane rows per grid step (fewer grid steps → less per-step
         # pipeline overhead; output block = n_bounces·7 × BM × LANES)
TWO_PI = 6.283185307179586
INV_PI = 0.3183098861837907


def _bits_to_unit(bits):
    """int32 random bits → f32 in [0, 1): the top 24 bits, exactly
    representable (Mosaic has no u32→f32 cast; arithmetic-shift + mask on
    i32 selects the same 24 bits)."""
    return ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * \
        jnp.float32(1.0 / (1 << 24))


def _acos01(x):
    """acos on [0, 1] — Mosaic has no acos primitive.  Hastings
    approximation (Abramowitz & Stegun 4.4.45): ``acos(x) =
    sqrt(1-x)·P7(x)``, |err| ≤ 2e-8 — below f32 resolution of the
    channel, so the sampled distribution is unchanged."""
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * x + jnp.float32(c)
    return jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p


def _make_kernel(n_bounces: int):
    def kernel(seed_ref, out_ref):
        i = pl.program_id(0)
        # Per-(key, block) stream: grid steps must not repeat bits.  The
        # hardware seed takes at most 2 words, so the block index is mixed
        # into the second word (odd multiplier → distinct per block).
        pltpu.prng_seed(seed_ref[0, 0],
                        seed_ref[0, 1] ^ (i * jnp.int32(-1640531527)))
        for b in range(n_bounces):
            # One PRNG call per bounce (5 separate (BM, LANES) calls
            # measured ~1.7 ms slower across the tensor).
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((5 * BM, LANES)), jnp.int32)
            ub = _bits_to_unit(bits).reshape(5, BM, LANES)
            u = [ub[ch] for ch in range(5)]
            t1 = u[1] * TWO_PI
            t2 = u[4] * TWO_PI
            out_ref[b * 7 + 0] = jnp.log(jnp.clip(u[0], 1e-20, 1.0))
            out_ref[b * 7 + 1] = jnp.cos(t1)
            out_ref[b * 7 + 2] = jnp.sin(t1)
            out_ref[b * 7 + 3] = u[2]
            out_ref[b * 7 + 4] = 2.0 * INV_PI * _acos01(
                jnp.clip(u[3], 0.0, 1.0))
            out_ref[b * 7 + 5] = jnp.cos(t2)
            out_ref[b * 7 + 6] = jnp.sin(t2)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "bounces", "interpret"))
def prepare_uniforms_kernel(key, n: int, bounces: int, interpret=False):
    """Drop-in for ``prepare_uniforms(key, n, bounces)`` → [bounces, 7, n]
    f32, generated on-core (see module doc for stream semantics)."""
    seed = jax.random.key_data(key).reshape(-1)[:2].astype(jnp.int32)
    block = BM * LANES
    n_pad = -(-n // block) * block
    out = pl.pallas_call(
        _make_kernel(bounces),
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((bounces * 7, BM, LANES),
                               lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (bounces * 7, n_pad // LANES, LANES), jnp.float32),
        interpret=interpret,
    )(seed.reshape(1, 2))
    return out.reshape(bounces, 7, n_pad)[:, :, :n]
