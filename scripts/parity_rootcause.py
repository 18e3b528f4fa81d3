"""Root-cause the bounce parity residual (VERDICT r4 #1).

Round 4 measured the worst tile as a stable ~18% deficit and framed it as
"localized to the through-lens region".  Re-examining the full ratio map
shows that framing was wrong: OUR 256-spp render is ~0.82x the reference
screenshot in tone-mapped space EVERYWHERE in the room (walls, floor,
cutout, lens alike; only the saturated light box reads ~1.0), while die
sits at ratio ~1.00 in every well-sampled region.  A uniform tone-space
ratio of 0.82 is a uniform LINEAR-space ratio of 0.82^2.2 ~ 0.65 — i.e. a
single global radiometric scale on one scene only.

Two mechanisms can produce that on the reference side (the screenshot was
provably made with a scene file differing from the shipped one — it is
1200x1200 while bounce.txt says `size 700 700` with `#size 1200 1200`
left commented above it, bounce.txt:1-2):

  (a) the GUI exposure slider (MainWindow.cs:40 defaults 1.0, live
      re-tonemap; the saved PNG bakes whatever it was set to —
      SampleSet.GetOutput multiplies exposure before gamma,
      SampleSet.cs:61-107), or
  (b) the screenshot was rendered at `recursion 20` (bounce.txt:4 — the
      very next line overrides it to 10): in bounce.txt paths terminate
      ONLY by hitting the light box or the recursion cap (every other
      material has zero emission and nonzero total luminance), so deeper
      recursion strictly brightens the whole room.

This script measures both:

  1. renders bounce at recursion 10 and recursion 20 with OUR renderer and
     reports the per-region linear brightening factor (tests (b) and, by
     uniformity, calibrates what a recursion change looks like);
  2. fits a single linear-space exposure on the NON-LENS region of the
     rec-10 render vs the reference screenshot and reports the lens-region
     residual before/after the fit (tests (a): if one scalar collapses the
     lens tile too, the residual is a global artifact scale, not a
     transmission-path radiometric bug).

Usage: python scripts/parity_rootcause.py [--spp 256] [--size 1200]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

GAMMA = 2.2

# Lens bounding box in 1200x1200 camera-0 pixels (from the round-4 worst
# tile and the ratio map: the through-lens disc spans roughly x 590-780,
# y 430-620).  Scaled by size/1200 at other resolutions.
LENS_BOX = (590, 430, 780, 620)


def premul_lin(rgba8: np.ndarray) -> np.ndarray:
    """uint8 RGBA -> alpha-premultiplied LINEAR rgb (inverts the 1/2.2
    output gamma both renderers apply; SampleSet.cs:104-107)."""
    x = rgba8.astype(np.float64) / 255.0
    return (x[..., :3] ** GAMMA) * x[..., 3:4]


def lum(rgb: np.ndarray) -> np.ndarray:
    return rgb[..., 0] * .299 + rgb[..., 1] * .587 + rgb[..., 2] * .114


def region_masks(shape, size):
    h, w = shape[:2]
    s = size / 1200.0
    x0, y0, x1, y1 = [int(round(v * s)) for v in LENS_BOX]
    lens = np.zeros((h, w), bool)
    lens[y0:y1, x0:x1] = True
    return lens


def scale_fit(ours_lin, ref_lin, mask):
    """Least-squares single scale s minimizing |s*ours - ref|^2 on mask."""
    a = ours_lin[mask]
    b = ref_lin[mask]
    return float((a * b).sum() / np.maximum((a * a).sum(), 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--size", type=int, default=1200)
    args = ap.parse_args()

    from PIL import Image

    from scripts.golden_parity import render as _render
    from raytracercore_tpu.scene import loader
    from raytracercore_tpu.render.renderer import Renderer

    def render_rec(recursion, seed=0):
        scene = loader.from_file("/root/reference/Scenes/bounce.txt")
        scene.width = scene.height = args.size
        scene.recursion = recursion
        r = Renderer(scene, camera_index=0, compensated=True, seed=seed)
        r.run(args.spp, status_every=64)
        return r.image()

    ref8 = np.asarray(Image.open(
        "/root/reference/Screenshots/bounce-with-lens.png").convert("RGBA"))
    if args.size != 1200:
        ref8 = np.asarray(Image.fromarray(ref8).resize(
            (args.size, args.size), Image.BILINEAR))
    ref = premul_lin(ref8)

    print(f"rendering rec10 and rec20 at {args.size}^2 {args.spp}spp...",
          file=sys.stderr, flush=True)
    img10 = premul_lin(render_rec(10))
    img20 = premul_lin(render_rec(20))
    img10b = premul_lin(render_rec(10, seed=1))

    l10, l20, lref = lum(img10), lum(img20), lum(ref)
    lens = region_masks(l10.shape, args.size)
    # well-sampled, unsaturated interior pixels
    good = (lref > 0.02) & (lref < 0.60) & (l10 > 0.005)
    nonlens = good & ~lens
    inlens = good & lens

    # --- (b) recursion hypothesis: our own rec20/rec10 factor ---------
    s_rec_global = scale_fit(img10, img20, good[..., None].repeat(3, -1)
                             if False else good)
    # per-region linear factors (mean-ratio of luminance)
    f_nonlens = float(l20[nonlens].sum() / l10[nonlens].sum())
    f_lens = float(l20[inlens].sum() / l10[inlens].sum())
    print(f"[recursion] rec20/rec10 linear factor: "
          f"non-lens {f_nonlens:.4f}, lens {f_lens:.4f}")

    # --- (a) exposure hypothesis: fit scale on NON-LENS, test on lens -
    def report(tag, ours_lin):
        lo = lum(ours_lin)
        s = float(lref[nonlens].sum() / lo[nonlens].sum())
        r_non = lref[nonlens].sum() / (s * lo[nonlens]).sum()
        r_lens_raw = float(lref[inlens].sum() / lo[inlens].sum())
        r_lens_fit = float(lref[inlens].sum() / (s * lo[inlens]).sum())
        # residual MAE maps in tone space after applying s then re-gamma
        ours_fit8 = np.clip(s * ours_lin, 0, None) ** (1 / GAMMA)
        ref_t = np.clip(ref, 0, None) ** (1 / GAMMA)
        mae_lens = float(np.abs(ours_fit8 - ref_t)[inlens].mean())
        mae_non = float(np.abs(ours_fit8 - ref_t)[nonlens].mean())
        raw_mae_lens = float(
            np.abs(np.clip(ours_lin, 0, None) ** (1 / GAMMA) - ref_t)
            [inlens].mean())
        print(f"[{tag}] fitted exposure (non-lens): s = {s:.4f} "
              f"(tone-space {s ** (1 / GAMMA):.4f})")
        print(f"[{tag}] lens-region ref/ours ratio: raw {r_lens_raw:.4f} "
              f"-> after non-lens fit {r_lens_fit:.4f}")
        print(f"[{tag}] tone-space MAE: lens raw {raw_mae_lens:.4f} -> "
              f"fitted {mae_lens:.4f}; non-lens fitted {mae_non:.4f}")
        return s, r_lens_fit, mae_lens

    s10, rl10, mae10 = report("rec10 vs ref", img10)
    s20, rl20, mae20 = report("rec20 vs ref", img20)

    # self-noise at the same spp for context
    lb = lum(img10b)
    self_mae_lens = float(np.abs(
        np.clip(img10, 0, None) ** (1 / GAMMA)
        - np.clip(img10b, 0, None) ** (1 / GAMMA))[inlens].mean())
    print(f"[noise] lens-region tone-space self-MAE (two seeds, rec10): "
          f"{self_mae_lens:.4f}")

    print({
        "rec20_over_rec10_nonlens": round(f_nonlens, 4),
        "rec20_over_rec10_lens": round(f_lens, 4),
        "fit_rec10": {"s": round(s10, 4), "lens_ratio_after": round(rl10, 4),
                      "lens_mae_after": round(mae10, 4)},
        "fit_rec20": {"s": round(s20, 4), "lens_ratio_after": round(rl20, 4),
                      "lens_mae_after": round(mae20, 4)},
        "lens_self_noise_mae": round(self_mae_lens, 4),
    })


if __name__ == "__main__":
    main()
