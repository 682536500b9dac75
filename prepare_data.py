"""Data-prep toolbox — the script/ directory equivalents.

Reference parity (SURVEY.md §2.2 script/ tools):
  * ``cameras``  — colmap sparse → cameras.json (my_copy_cams / scene/)
  * ``aabb``     — points3D percentile bbox → bbox.json (compute_aabb.py)
  * ``subsample``— 512² image resize into images_512/ (subsample.py, with a
                   process pool like the reference's mp.Pool(5))
  * ``pairs``    — key/candidate pair json generation
                   (generate_test_pair.ipynb / generate_train_pair.ipynb)
  * ``points``   — points3D.bin → points3D.npz for the frame-0 trainer

Usage examples:
    python prepare_data.py cameras --sparse scene/colmap_0/sparse/0 \
        --out scene/colmap_0/3dgs_rade/cameras.json
    python prepare_data.py aabb --sparse scene/colmap_0/sparse/0 \
        --scene-name sear_steak --out data_root/bbox.json
    python prepare_data.py subsample --src scene/colmap_0/images \
        --dst scene/colmap_0/images_512 --size 512
    python prepare_data.py pairs --scene-name sear_steak --frames 300 \
        --interval 5 --out sear_steak_total_300_interval_5.json
"""

from __future__ import annotations

import argparse
import json
import os


def cmd_cameras(args):
    from igs_tpu.data.colmap import colmap_to_cameras_json

    cams = colmap_to_cameras_json(args.sparse, downscale=args.downscale)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(cams, f)
    print(f"wrote {len(cams)} cameras → {args.out}")


def cmd_aabb(args):
    from igs_tpu.data.colmap import compute_aabb, read_points3d_bin

    xyz, _ = read_points3d_bin(os.path.join(args.sparse, "points3D.bin"))
    bbox = compute_aabb(xyz, padding=args.padding)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing[args.scene_name] = bbox
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"{args.scene_name}: bbox {bbox}")


def cmd_points(args):
    import numpy as np

    from igs_tpu.data.colmap import read_points3d_bin

    xyz, rgb = read_points3d_bin(os.path.join(args.sparse, "points3D.bin"))
    np.savez(args.out, xyz=xyz.astype(np.float32), rgb=rgb)
    print(f"wrote {len(xyz)} points → {args.out}")


def _resize_one(job):
    src, dst, size = job
    from PIL import Image

    img = Image.open(src).convert("RGB")
    img = img.resize((size, size), Image.BILINEAR)
    img.save(dst)


def cmd_subsample(args):
    import multiprocessing as mp

    os.makedirs(args.dst, exist_ok=True)
    jobs = [
        (os.path.join(args.src, f), os.path.join(args.dst, f), args.size)
        for f in sorted(os.listdir(args.src))
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    ]
    with mp.Pool(args.workers) as pool:
        pool.map(_resize_one, jobs)
    print(f"resized {len(jobs)} images → {args.dst}")


def cmd_pairs(args):
    """Every interval-th frame is a key frame; each item pairs the key
    frame with the next candidate frame (generate_test_pair.ipynb)."""
    items = []
    for f in range(args.start, args.frames - 1):
        key = (f // args.interval) * args.interval
        items.append({
            "scene_name": args.scene_name,
            "cur_frame": f"colmap_{key}",
            "next_frame": f"colmap_{f + 1}",
            "keyframe": 1 if f % args.interval == 0 else 0,
        })
    split = {"train": items, "val": items}
    with open(args.out, "w") as f:
        json.dump(split, f, indent=1)
    print(f"wrote {len(items)} pairs → {args.out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("cameras")
    c.add_argument("--sparse", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--downscale", type=int, default=1)
    c.set_defaults(fn=cmd_cameras)

    a = sub.add_parser("aabb")
    a.add_argument("--sparse", required=True)
    a.add_argument("--scene-name", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--padding", type=float, default=0.1)
    a.set_defaults(fn=cmd_aabb)

    p = sub.add_parser("points")
    p.add_argument("--sparse", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_points)

    s = sub.add_parser("subsample")
    s.add_argument("--src", required=True)
    s.add_argument("--dst", required=True)
    s.add_argument("--size", type=int, default=512)
    s.add_argument("--workers", type=int, default=5)
    s.set_defaults(fn=cmd_subsample)

    g = sub.add_parser("pairs")
    g.add_argument("--scene-name", required=True)
    g.add_argument("--frames", type=int, required=True)
    g.add_argument("--interval", type=int, default=5)
    g.add_argument("--start", type=int, default=0)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_pairs)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
