"""Benchmark: bounce.txt Cornell box at the reference's headline config.

Reference baseline (BASELINE.md): 6.240 samples/px/sec on bounce.txt at
700x700, recursion 10, on the author's multi-core AVX2 x86 (status bar in
Screenshots/app.png; metric computed by FullRaytracer.cs:346-357).

Primary metric: forward samples/px/sec at the same config on one TPU chip;
vs_baseline is the ratio to 6.240.  Extra fields report path/ray throughput
and the fwd+bwd (render + material-gradient) step rate.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PX_SEC = 6.240
SIZE = 700
RECURSION = 10
PASSES = 6


def main():
    import optax

    from raytracercore_tpu.diff import get_material_params
    from raytracercore_tpu.parallel.shard import make_train_step
    from raytracercore_tpu.render.film import Film
    from raytracercore_tpu.intersect.pallas_select import closest_hit_fused
    from raytracercore_tpu.render.renderer import render_passes
    from raytracercore_tpu.scene import loader
    from raytracercore_tpu.scene.types import freeze_scene, init_camera

    scene = loader.from_file("/root/reference/Scenes/bounce.txt")
    scene.width = scene.height = SIZE
    scene.recursion = RECURSION
    arrays = freeze_scene(scene)
    camera = init_camera(scene.cameras[0], SIZE, SIZE)
    film = Film.create(SIZE, SIZE)
    key = jax.random.PRNGKey(0)

    # Forward rendering uses the fused Pallas closest-hit (what Renderer
    # selects on TPU); the train step keeps the differentiable dispatch.
    closest = closest_hit_fused if jax.default_backend() == "tpu" else None

    def render_n(f, start, n):
        kw = {} if closest is None else {"closest_fn": closest}
        return render_passes(arrays, camera, f, key, jnp.int32(start),
                             n=n, **kw)

    def sync(x):
        """True device sync: fetch a scalar to host (block_until_ready is
        not a reliable fence on the axon remote platform)."""
        return float(jnp.sum(x))

    # --- forward ---------------------------------------------------------
    log("bench: compiling forward pass...")
    film = render_n(film, 0, PASSES)                       # compile
    sync(film.samples)
    log("bench: forward compiled, timing...")
    t0 = time.perf_counter()
    film = render_n(film, PASSES, PASSES)
    film = render_n(film, 2 * PASSES, PASSES)
    sync(film.samples)
    dt_fwd = (time.perf_counter() - t0) / (2 * PASSES)
    log(f"bench: forward {1.0 / dt_fwd:.3f} samples/px/sec")

    pixels = SIZE * SIZE
    spp_sec = 1.0 / dt_fwd              # one sample/px per pass
    paths_sec = pixels / dt_fwd
    # Ray segments: every path runs ≤ recursion+1 wavefront steps; report
    # the wavefront-step count (what the chip actually executes).
    rays_sec_fwd = pixels * (RECURSION + 1) / dt_fwd

    # --- forward+backward (material-gradient train step) -----------------
    optimizer = optax.adam(1e-2)
    params = get_material_params(arrays)
    opt_state = optimizer.init(params)
    target = jnp.zeros((SIZE, SIZE, 3), arrays.materials.emission.dtype)
    step = make_train_step(None, optimizer)
    log("bench: compiling fwd+bwd train step...")
    try:
        params, opt_state, loss = step(params, arrays, camera, target,
                                       opt_state, key)      # compile
        float(loss)
        log("bench: train step compiled, timing...")
        n_bwd = 2
        t0 = time.perf_counter()
        for i in range(n_bwd):
            params, opt_state, loss = step(params, arrays, camera, target,
                                           opt_state,
                                           jax.random.fold_in(key, i))
        float(loss)
        dt_fb = (time.perf_counter() - t0) / n_bwd
    except Exception as e:  # noqa: BLE001 — still report forward numbers
        log(f"bench: fwd+bwd failed: {e}")
        dt_fb = float("inf")
    rays_sec_fb = pixels * (RECURSION + 1) / dt_fb

    print(json.dumps({
        "metric": "samples/px/sec fwd, bounce.txt 700x700 rec10",
        "value": round(spp_sec, 4),
        "unit": "samples/px/sec",
        "vs_baseline": round(spp_sec / BASELINE_SAMPLES_PX_SEC, 3),
        "extra": {
            "paths_per_sec_fwd": round(paths_sec, 1),
            "wavefront_rays_per_sec_fwd": round(rays_sec_fwd, 1),
            "fwdbwd_steps_per_sec": round(1.0 / dt_fb, 4) if dt_fb > 0
            else 0,
            "wavefront_rays_per_sec_fwdbwd": round(rays_sec_fb, 1),
            "device": str(jax.devices()[0]),
            "baseline_samples_px_sec": BASELINE_SAMPLES_PX_SEC,
        },
    }))


if __name__ == "__main__":
    main()
