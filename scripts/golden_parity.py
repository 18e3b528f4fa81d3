"""Golden-image parity vs the reference renderer's published renders.

Renders the two shipped scenes on the current JAX backend and compares
statistically against the reference's own output images
(BASELINE.md correctness gate: "forward renders allclose to RaytracerCore's
reference images on bounce.txt and die.txt"):

* ``/root/reference/Screenshots/bounce-with-lens.png`` — bounce.txt,
  camera 0, 1200x1200 (the scene file says 700x700; the screenshot was
  rendered at 1200 — we match the screenshot).
* ``/root/reference/Screenshots/die.png`` — die.txt, camera 0, 1280x960
  (matches the scene header ``size 1280 960``, die.txt:1).

Matched-RNG bitwise comparison is impossible (the reference uses seedless
``new Random()`` per thread, Raytracer.cs:41-48), so the comparison is
statistical on the tone-mapped output: per-16x16-tile means of
alpha-premultiplied RGB, plus a global MSE. Misses are transparent in both
(background alpha 0 in both scenes), so premultiplied RGB compares hit
colors and coverage together.

Writes our renders to docs/parity/ and a markdown report to docs/PARITY.md.

Usage: python scripts/golden_parity.py [--spp 256]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def tile_means(img: np.ndarray, tile: int = 16) -> np.ndarray:
    h, w, c = img.shape
    h2, w2 = h // tile * tile, w // tile * tile
    v = img[:h2, :w2].reshape(h2 // tile, tile, w2 // tile, tile, c)
    return v.mean(axis=(1, 3))


def compare(ours_rgba: np.ndarray, ref_rgba: np.ndarray, name: str) -> dict:
    ours = ours_rgba.astype(np.float64) / 255.0
    ref = ref_rgba.astype(np.float64) / 255.0
    ours_p = ours[..., :3] * ours[..., 3:4]
    ref_p = ref[..., :3] * ref[..., 3:4]

    mse = float(((ours_p - ref_p) ** 2).mean())
    tm_ours, tm_ref = tile_means(ours_p), tile_means(ref_p)
    tile_err = np.abs(tm_ours - tm_ref).mean(axis=-1)
    alpha_mae = float(np.abs(ours[..., 3] - ref[..., 3]).mean())
    worst = np.unravel_index(tile_err.argmax(), tile_err.shape)
    out = {
        "name": name,
        "mse_premul": mse,
        "psnr_db": 10 * np.log10(1.0 / max(mse, 1e-12)),
        "tile16_mean_abs_err_mean": float(tile_err.mean()),
        "tile16_mean_abs_err_p99": float(np.percentile(tile_err, 99)),
        "tile16_mean_abs_err_max": float(tile_err.max()),
        "alpha_mae": alpha_mae,
        "worst_tile_px": (int(worst[1]) * 16, int(worst[0]) * 16),
    }
    return out


def render(scene_path: str, width: int, height: int, spp: int,
           camera_index: int = 0, seed: int = 0):
    from raytracercore_tpu.render.renderer import Renderer
    from raytracercore_tpu.scene import loader

    scene = loader.from_file(scene_path)
    scene.width, scene.height = width, height
    r = Renderer(scene, camera_index=camera_index, compensated=True,
                 seed=seed)
    t0 = time.perf_counter()
    r.run(spp, status_every=32)
    dt = time.perf_counter() - t0
    print(f"{scene_path}: {spp} spp at {width}x{height} in {dt:.1f}s "
          f"({r.status()['samples_per_px_per_sec']:.2f} spp/sec)",
          file=sys.stderr)
    return r.image()


# Parity gate: reference-MSE must stay within GATE_K x the self-noise
# floor (two independent-seed renders of OUR estimator at the same spp).
# Round-3 measurement at 256 spp (docs/PARITY.md): bounce ratio 1.56, die
# 0.54 (closer to the reference than to our own reseeded render).  Gates
# set at ~2x the measured ratios so regressions fail the script without
# flaking on seed luck.
GATE_K = {"bounce": 3.0, "die": 1.5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--no-gate", action="store_true",
                    help="report only; skip the ratio assertion")
    args = ap.parse_args()

    from raytracercore_tpu.tools.png import write_png

    jobs = [
        ("bounce", "/root/reference/Scenes/bounce.txt",
         "/root/reference/Screenshots/bounce-with-lens.png", 1200, 1200),
        ("die", "/root/reference/Scenes/die.txt",
         "/root/reference/Screenshots/die.png", 1280, 960),
    ]
    results = []
    failures = []
    for name, scene_path, ref_path, w, h in jobs:
        from PIL import Image
        ref = np.asarray(Image.open(ref_path).convert("RGBA"))
        ours = render(scene_path, w, h, args.spp, seed=0)
        ours_b = render(scene_path, w, h, args.spp, seed=1)
        write_png(f"docs/parity/{name}_tpu_{args.spp}spp.png", ours)
        res = compare(ours, ref, name)
        floor = compare(ours, ours_b, name + "-self")
        res["spp_ours"] = args.spp
        res["noise_floor_mse"] = floor["mse_premul"]
        res["mse_over_floor"] = res["mse_premul"] / max(
            floor["mse_premul"], 1e-12)
        res["worst_tile_self_err"] = floor["tile16_mean_abs_err_max"]
        results.append(res)
        print(res)
        if not args.no_gate and res["mse_over_floor"] > GATE_K[name]:
            failures.append(
                f"{name}: MSE {res['mse_premul']:.5f} is "
                f"{res['mse_over_floor']:.1f}x the seed-noise floor "
                f"{res['noise_floor_mse']:.5f} (gate {GATE_K[name]}x)")

    with open("docs/PARITY.md", "w") as f:
        f.write("# Golden-image parity vs the reference\n\n")
        f.write("Comparison of tone-mapped output against the reference's "
                "published renders (alpha-premultiplied RGB in [0,1]; "
                "statistical, since the reference's RNG is seedless — "
                "Raytracer.cs:41-48). Generated by "
                "`scripts/golden_parity.py`.\n\n")
        f.write("| scene | ours (spp) | MSE | noise floor | MSE/floor "
                "| PSNR (dB) | tile16 MAE mean | tile16 MAE p99 "
                "| tile16 MAE max | worst tile @px | alpha MAE |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['name']} | {r['spp_ours']} "
                    f"| {r['mse_premul']:.5f} "
                    f"| {r['noise_floor_mse']:.5f} "
                    f"| {r['mse_over_floor']:.2f} "
                    f"| {r['psnr_db']:.1f} "
                    f"| {r['tile16_mean_abs_err_mean']:.4f} "
                    f"| {r['tile16_mean_abs_err_p99']:.4f} "
                    f"| {r['tile16_mean_abs_err_max']:.4f} "
                    f"| {r['worst_tile_px']} "
                    f"| {r['alpha_mae']:.4f} |\n")
        f.write(
            "\nThe noise floor is the MSE between two renders of OUR "
            "estimator at the same spp with different seeds; the gate "
            f"asserts MSE ≤ k×floor (k = {GATE_K}, ~2x margin over the "
            "measured ratios), so parity regressions fail the script "
            "rather than drifting silently.  The worst-tile pixel "
            "coordinates attribute the residual (bounce: the glass-lens "
            "caustic region; see the paragraph below if updated).\n\n"
            "Rendered goldens: `docs/parity/*.png`. Reference images: "
            "`/root/reference/Screenshots/bounce-with-lens.png` "
            "(bounce.txt camera 0 at 1200x1200), `die.png` (die.txt "
            "camera 0 at 1280x960).\n")

    if failures:
        for msg in failures:
            print("PARITY GATE FAILED:", msg, file=sys.stderr)
        sys.exit(1)
    print("parity gate: OK" if not args.no_gate else "gate skipped",
          file=sys.stderr)


if __name__ == "__main__":
    main()
