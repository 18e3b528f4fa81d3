"""Measured VPU issue ceiling for the megakernel's op mix (VERDICT r4 #4).

docs/ROOFLINE.md argued the ≥0.35-of-FMA-peak target is unreachable for
this op mix (branch-sum execution, non-FMA select slots, transcendentals)
— but the "~60-70% of attainable issue" figure was a paper model.  This
microbenchmark MEASURES what one v5e core actually sustains on
register-resident (8, 128) f32 planes for:

  * pure FMA chains            (the marketing-roofline numerator)
  * pure compare+select chains (the non-FMA slot cost)
  * transcendental chains      (exp; the shininess pow)
  * THE MEGAKERNEL MIX         — op-class fractions counted from
    intersect/kernel_body.py + render/fused.py's flop model
    (docs/ROOFLINE.md:21-31): per ray-bounce ~3.6 kflop of which
    ~52% mul/add/fma-class, ~40% compare/select/min/max/abs,
    ~5% divide/rsqrt-class, ~3% exp/transcendental.

Each chain is ILP-8 (8 independent register streams) so the measurement
is issue-limited, not latency-limited.  The kernel reports ops/sec; the
mix row is the honest per-chip ceiling for this workload, and bench.py's
``vs_issue_measured`` divides the megakernel's model flops/sec by it.

Usage: python scripts/vpu_issue_bench.py [--iters 4096] [--blocks 512]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096,
                    help="while_loop trips per grid program")
    ap.add_argument("--unroll", type=int, default=8,
                    help="op-group repetitions per trip")
    ap.add_argument("--streams", type=int, default=8,
                    help="independent register chains (ILP)")
    ap.add_argument("--blocks", type=int, default=512,
                    help="grid programs (each owns one (8,128) tile set)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    SHAPE = (8, 128)
    LANE_SLOTS = SHAPE[0] * SHAPE[1]

    def make_kernel(mix, iters, unroll, NS):
        """mix: list of (op_name, count_per_group). 8 independent streams
        per group rep; each op touches all 1024 lane slots."""

        def kernel(x_ref, o_ref):
            x = x_ref[...]
            a = [x * jnp.float32(1.0 + 0.01 * i) for i in range(NS)]
            b = [x * jnp.float32(0.99 - 0.01 * i) + jnp.float32(0.01)
                 for i in range(NS)]
            c = [x * jnp.float32(0.5 + 0.05 * i) for i in range(NS)]

            def body(k, carry):
                a = list(carry)
                for _ in range(unroll):
                    for op, cnt in mix:
                        for j in range(cnt):
                            s = j % NS
                            if op == "fma":
                                a[s] = a[s] * b[s] + c[s]
                            elif op == "add":
                                a[s] = a[s] + b[s]
                            elif op == "mul":
                                a[s] = a[s] * b[s]
                            elif op == "cmpsel":
                                # one compare + one select (2 slots)
                                a[s] = jnp.where(a[s] > b[s],
                                                 a[s] - b[s], a[s])
                            elif op == "max":
                                a[s] = jnp.maximum(a[s], b[s] - a[s])
                            elif op == "recip":
                                a[s] = 1.0 / (a[s] * a[s] + 1.5)
                            elif op == "rsqrt":
                                a[s] = jax.lax.rsqrt(a[s] * a[s] + 1.5)
                            elif op == "exp":
                                a[s] = jnp.exp(a[s] * jnp.float32(-0.25))
                            else:
                                raise ValueError(op)
                return tuple(a)

            out = jax.lax.fori_loop(0, iters, body, tuple(a))
            acc = out[0]
            for v in out[1:]:
                acc = acc + v
            o_ref[...] = acc

        return kernel

    def run(mix, name, flops_per_op):
        kern = make_kernel(mix, args.iters, args.unroll, args.streams)
        x = jnp.linspace(0.1, 0.9, 8 * 128 * args.blocks,
                         dtype=jnp.float32).reshape(args.blocks * 8, 128)
        f = pl.pallas_call(
            kern,
            grid=(args.blocks,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((args.blocks * 8, 128),
                                           jnp.float32),
        )
        jf = jax.jit(f)
        float(jnp.sum(jf(x)))  # compile+warm
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(jf(x)))
            best = min(best, time.perf_counter() - t0)
        group_ops = sum(cnt for _, cnt in mix)
        ops = (args.blocks * args.iters * args.unroll * group_ops
               * LANE_SLOTS)
        flops = (args.blocks * args.iters * args.unroll * LANE_SLOTS
                 * sum(cnt * flops_per_op.get(op, 1)
                       for op, cnt in mix))
        res = {"mix": name, "ms": round(best * 1e3, 2),
               "Tops": round(ops / best / 1e12, 3),
               "Tflops_fma_convention": round(flops / best / 1e12, 3)}
        print(res, file=sys.stderr, flush=True)
        return res

    # FMA convention: fma = 2 flops, everything else 1 (matching the
    # 7.7 Tflop/s marketing denominator in docs/ROOFLINE.md).
    FMA_FLOPS = {"fma": 2}

    results = []
    results.append(run([("fma", 8)], "pure_fma", FMA_FLOPS))
    results.append(run([("cmpsel", 8)], "pure_cmpsel", FMA_FLOPS))
    results.append(run([("max", 8)], "pure_max", FMA_FLOPS))
    results.append(run([("recip", 8)], "pure_recip", FMA_FLOPS))
    results.append(run([("exp", 8)], "pure_exp", FMA_FLOPS))
    # The megakernel mix: fractions from the docs/ROOFLINE.md flop model
    # (~52% mul/add/fma, ~40% cmp/select/min/max, ~5% div/rsqrt, ~3% exp)
    # expressed over a 40-op group.
    mega_mix = [("fma", 11), ("mul", 5), ("add", 5),
                ("cmpsel", 10), ("max", 6), ("recip", 2), ("exp", 1)]
    results.append(run(mega_mix, "megakernel_mix", FMA_FLOPS))

    print(json.dumps({"device": str(jax.devices()[0]),
                      "iters": args.iters, "unroll": args.unroll,
                      "blocks": args.blocks, "results": results}))


if __name__ == "__main__":
    main()
