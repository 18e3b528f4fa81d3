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


GAMMA = 2.2

# Exposure the reference screenshot was SAVED at (the GUI bakes the live
# exposure slider into saved PNGs: SampleSet.GetOutput multiplies exposure
# before the 1/2.2 gamma, SampleSet.cs:61-107; slider default 1.0,
# MainWindow.cs:40).  Measured round 5 (scripts/parity_rootcause.py): the
# bounce screenshot is a UNIFORM 1.50x linear everywhere (fitting one
# scalar on the non-lens region collapses the through-lens ratio to
# 0.996 and the lens MAE below two-seed self-noise), while die fits 1.00.
# The bounce screenshot provably came from an edited scene file (it is
# 1200x1200; bounce.txt says `size 700 700` with `#size 1200 1200`
# commented, bounce.txt:1-2) — exposure 1.5 is part of the same artifact.
REF_EXPOSURE = {"bounce": 1.5, "die": 1.0}
# Radiometric gate: the per-scene least-squares exposure fitted on the
# well-sampled region must stay within this relative band of REF_EXPOSURE
# — a true energy drift in the estimator moves the fit, independent of
# sampling noise.
EXPOSURE_TOL = 0.04


def fit_exposure(ours_p: np.ndarray, ref_p: np.ndarray) -> float:
    """Single linear-space scale s (ref ~ s * ours) over well-sampled,
    unsaturated pixels of the premultiplied tone images.

    Ratio-of-sums, NOT least squares: with our render the noisy side, a
    LS fit s = Σab/Σa² is attenuation-biased low by the sampling noise in
    the denominator (measured ~7% at 256 spp); Σb/Σa is unbiased under
    zero-mean noise in a."""
    ours_lin = ours_p ** GAMMA
    ref_lin = ref_p ** GAMMA
    lum = lambda x: x[..., 0] * .299 + x[..., 1] * .587 + x[..., 2] * .114
    lo, lr = lum(ours_lin), lum(ref_lin)
    mask = (lr > 0.02) & (lr < 0.5) & (lo > 0.005)
    return float(lr[mask].sum() / max(lo[mask].sum(), 1e-12))


def compare(ours_rgba: np.ndarray, ref_rgba: np.ndarray, name: str,
            ref_exposure: float = 1.0, scale_ref: bool = False) -> dict:
    ours = ours_rgba.astype(np.float64) / 255.0
    ref = ref_rgba.astype(np.float64) / 255.0
    ours_p = ours[..., :3] * ours[..., 3:4]
    ref_p = ref[..., :3] * ref[..., 3:4]
    fitted = fit_exposure(ours_p, ref_p)
    if ref_exposure != 1.0:
        # Apply the measured artifact exposure to OUR render before
        # comparing (linear multiply = tone-space multiply by s^(1/2.2),
        # clipped at 1.0 to match the reference PNG's own saturation).
        # scale_ref=True additionally scales the "reference" side — used
        # for the self-noise floor, where both images are our renders and
        # the floor must live in the same scaled space as the gate metric.
        ours_p = np.clip(ours_p * ref_exposure ** (1 / GAMMA), 0.0, 1.0)
        if scale_ref:
            ref_p = np.clip(ref_p * ref_exposure ** (1 / GAMMA), 0.0, 1.0)

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
        "fitted_exposure": fitted,
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
# With the measured REF_EXPOSURE correction applied (round 5), both
# scenes sit BELOW their self-noise floor at 256 spp (bounce 0.53, die
# 0.54 — the reference image is converged, so comparing against it has
# LESS variance than comparing two of our own noisy seeds).  Gates at
# ~2.2x the measured ratios so regressions fail without flaking on seeds.
GATE_K = {"bounce": 1.2, "die": 1.2}


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
        exposure = REF_EXPOSURE[name]
        res = compare(ours, ref, name, ref_exposure=exposure)
        floor = compare(ours, ours_b, name + "-self",
                        ref_exposure=exposure, scale_ref=True)
        res["spp_ours"] = args.spp
        res["ref_exposure"] = exposure
        res["noise_floor_mse"] = floor["mse_premul"]
        res["mse_over_floor"] = res["mse_premul"] / max(
            floor["mse_premul"], 1e-12)
        res["worst_tile_self_err"] = floor["tile16_mean_abs_err_max"]
        results.append(res)
        print(res)
        if args.no_gate:
            continue
        if res["mse_over_floor"] > GATE_K[name]:
            failures.append(
                f"{name}: MSE {res['mse_premul']:.5f} is "
                f"{res['mse_over_floor']:.1f}x the seed-noise floor "
                f"{res['noise_floor_mse']:.5f} (gate {GATE_K[name]}x)")
        # Radiometric gate: the fitted global exposure is the sharp test
        # for estimator energy drift (round 5 root-cause,
        # scripts/parity_rootcause.py) — it is insensitive to sampling
        # noise, so it catches a uniform brightness bug the MSE/floor
        # ratio would bury under seed variance.
        rel = abs(res["fitted_exposure"] / exposure - 1.0)
        if rel > EXPOSURE_TOL:
            failures.append(
                f"{name}: fitted exposure {res['fitted_exposure']:.4f} "
                f"deviates {rel * 100:.1f}% from the measured artifact "
                f"exposure {exposure} (tol {EXPOSURE_TOL * 100:.0f}%)")

    with open("docs/PARITY.md", "w") as f:
        f.write("# Golden-image parity vs the reference\n\n")
        f.write("Comparison of tone-mapped output against the reference's "
                "published renders (alpha-premultiplied RGB in [0,1]; "
                "statistical, since the reference's RNG is seedless — "
                "Raytracer.cs:41-48). Generated by "
                "`scripts/golden_parity.py`.\n\n")
        f.write("| scene | ours (spp) | ref exposure | fitted exposure "
                "| MSE | noise floor | MSE/floor "
                "| PSNR (dB) | tile16 MAE mean | tile16 MAE p99 "
                "| tile16 MAE max | worst tile @px | alpha MAE |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['name']} | {r['spp_ours']} "
                    f"| {r['ref_exposure']} "
                    f"| {r['fitted_exposure']:.4f} "
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
            "\nThe comparison applies the measured per-scene artifact "
            f"exposure (REF_EXPOSURE = {REF_EXPOSURE}) to our render "
            "before comparing — see 'Round-5 root cause' below.  The "
            "noise floor is the MSE between two renders of OUR estimator "
            "at the same spp with different seeds; the gate asserts "
            f"MSE ≤ k×floor (k = {GATE_K}) AND that the fitted global "
            f"exposure stays within {EXPOSURE_TOL * 100:.0f}% of the "
            "measured artifact exposure (the sharp radiometric assertion "
            "— a uniform energy bug moves the fit regardless of sampling "
            "noise), so parity regressions fail the script rather than "
            "drifting silently.\n\n"
            "Rendered goldens: `docs/parity/*.png`. Reference images: "
            "`/root/reference/Screenshots/bounce-with-lens.png` "
            "(bounce.txt camera 0 at 1200x1200), `die.png` (die.txt "
            "camera 0 at 1280x960).\n\n"
            "## Round-5 root cause: the residual was the screenshot's "
            "exposure, not our estimator\n\n"
            "Round 4 measured the bounce worst tile as a stable ~18% "
            "deficit and framed it as localized to the through-lens "
            "region.  Round 5 re-examined the full ratio map "
            "(`scripts/parity_rootcause.py`): our render is a UNIFORM "
            "0.82x of the screenshot in tone space across the whole room "
            "— walls, floor, cutout and lens alike — which is a single "
            "linear-space scale of 0.82^2.2 ≈ 0.65, while die fits "
            "1.00.  Fitting one scalar exposure on the NON-LENS region "
            "gives s = 1.502 linear ≈ the GUI slider's 1.5 step "
            "(SampleSet.cs:61-107 bakes the slider into saved PNGs; "
            "default 1.0, MainWindow.cs:40); applying it collapses the "
            "lens-region ratio from 1.496 to 0.996 and the lens MAE to "
            "0.059, BELOW the 0.068 two-seed self-noise at 256 spp.  The "
            "recursion-20 hypothesis was tested and refuted (rec20/rec10 "
            "brightens only 1.04x non-lens / 1.03x lens, nowhere near "
            "1.5).  The bounce screenshot provably came from an edited "
            "scene file (it is 1200², bounce.txt says `size 700 700`), "
            "so a non-default slider at save time is part of the same "
            "artifact.  Conclusion: no radiometric gap — transmission "
            "paths included, our estimator matches the reference within "
            "sampling noise once the artifact exposure is accounted "
            "for.  The fitted-exposure gate above keeps this honest "
            "round-over-round.\n")

    if failures:
        for msg in failures:
            print("PARITY GATE FAILED:", msg, file=sys.stderr)
        sys.exit(1)
    print("parity gate: OK" if not args.no_gate else "gate skipped",
          file=sys.stderr)


if __name__ == "__main__":
    main()
