"""Measure the bounce parity worst tile at high spp (VERDICT r3 #9).

docs/PARITY.md attributes bounce's 1.56x noise-floor ratio to 256-spp
caustic noise in the glass-lens tile at px (672, 528).  This script turns
that argument into a measurement: render bounce.txt at 1200x1200 with a
high sample count and report the worst tile's MAE vs the reference
screenshot as spp grows — if the residual is sampling noise, the tile MAE
must fall toward the converged level; if it were estimator bias it would
plateau at the 256-spp value.

Usage: python scripts/parity_worst_tile.py [--spp 2048]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.golden_parity import render  # noqa: E402


def tile_mae(ours_rgba, ref_rgba, px, tile=16):
    ours = ours_rgba.astype(np.float64) / 255.0
    ref = ref_rgba.astype(np.float64) / 255.0
    ours_p = ours[..., :3] * ours[..., 3:4]
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
