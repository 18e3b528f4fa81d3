"""Measure the bounce parity worst tile at high spp (VERDICT r3 #9).

Round-4 run (without exposure correction) measured the worst tile
plateauing at MAE ~0.14 from 256 to 2048 spp, refuting the "caustic
noise" story.  Round 5 root-caused that plateau as the screenshot's own
baked-in exposure 1.5 (scripts/parity_rootcause.py, docs/PARITY.md); this
script now applies the measured REF_EXPOSURE before comparing, so the
worst-tile MAE should fall toward the self-noise level as spp grows.

Usage: python scripts/parity_worst_tile.py [--spp 2048]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.golden_parity import GAMMA, REF_EXPOSURE, render  # noqa: E402


def tile_mae(ours_rgba, ref_rgba, px, tile=16,
             exposure=REF_EXPOSURE["bounce"]):
    ours = ours_rgba.astype(np.float64) / 255.0
    ref = ref_rgba.astype(np.float64) / 255.0
    ours_p = ours[..., :3] * ours[..., 3:4]
    ours_p = np.clip(ours_p * exposure ** (1 / GAMMA), 0.0, 1.0)
    ref_p = ref[..., :3] * ref[..., 3:4]
    x, y = px
    a = ours_p[y:y + tile, x:x + tile]
    b = ref_p[y:y + tile, x:x + tile]
    return float(np.abs(a.mean(axis=(0, 1)) - b.mean(axis=(0, 1))).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=2048)
    ap.add_argument("--px", type=int, nargs=2, default=(672, 528))
    args = ap.parse_args()

    from PIL import Image

    ref = np.asarray(Image.open(
        "/root/reference/Screenshots/bounce-with-lens.png").convert("RGBA"))

    results = []
    for spp in (256, args.spp):
        rgba = render("/root/reference/Scenes/bounce.txt", 1200, 1200, spp)
        mae = tile_mae(rgba, ref, tuple(args.px))
        results.append((spp, mae))
        print(f"spp={spp}: worst-tile({args.px}) MAE = {mae:.4f}",
              flush=True)
    print({"worst_tile_px": list(args.px),
           "mae_by_spp": {str(s): round(m, 5) for s, m in results}})


if __name__ == "__main__":
    main()
