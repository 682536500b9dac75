"""Offline PSNR/SSIM/LPIPS evaluator over paired render/GT directories.

Reference parity: submodules/RaDe-GS/metric.py (renders/ vs gt/ per-method
evaluation writing results.json + per_view.json) — the standard 3DGS
evaluation protocol used to score streams.

Usage:
    python metrics.py --renders <dir> --gt <dir> [--lpips-weights path]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--renders", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--lpips-weights", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp

    from igs_tpu.train.losses import psnr as psnr_fn, ssim as ssim_fn
    from igs_tpu.train.lpips import make_lpips

    lpips_fn, lpips_ok = make_lpips(args.lpips_weights or None)

    names = sorted(
        f for f in os.listdir(args.renders)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    per_view = {"psnr": {}, "ssim": {}, "lpips": {}}
    for name in names:
        r = np.asarray(Image.open(os.path.join(args.renders, name)))[..., :3]
        g = np.asarray(Image.open(os.path.join(args.gt, name)))[..., :3]
        r = jnp.asarray(r / 255.0, jnp.float32).transpose(2, 0, 1)[None]
        g = jnp.asarray(g / 255.0, jnp.float32).transpose(2, 0, 1)[None]
        per_view["psnr"][name] = float(psnr_fn(r, g))
        s, _ = ssim_fn(r, g)
        per_view["ssim"][name] = float(s)
        if lpips_ok:
            per_view["lpips"][name] = float(lpips_fn(2 * r - 1, 2 * g - 1)[0])

    results = {
        "PSNR": float(np.mean(list(per_view["psnr"].values()))),
        "SSIM": float(np.mean(list(per_view["ssim"].values()))),
    }
    if lpips_ok:
        results["LPIPS"] = float(np.mean(list(per_view["lpips"].values())))
    print(json.dumps(results, indent=2))
    out = args.out or os.path.join(args.renders, "..", "metric_results.json")
    with open(out, "w") as f:
        json.dump({"results": results, "per_view": per_view}, f, indent=2)


if __name__ == "__main__":
    main()
