#!/usr/bin/env python3
"""NSVF-format dataset → transforms.json (reference scripts/nsvf2nerf.py):
NSVF scenes ship per-image pose .txt files (4×4 c2w), an intrinsics.txt
and an images folder; this emits our transforms.json with the same
camera-centroid normalization as colmap2nerf."""

import argparse
import json
import math
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scene", help="NSVF scene dir (pose/, rgb/, intrinsics.txt)")
    p.add_argument("--aabb_scale", type=int, default=4)
    p.add_argument("--out", default="transforms.json")
    args = p.parse_args()
    scene = Path(args.scene)

    # intrinsics.txt comes in two layouts: a 4×4 matrix, or the ragged
    # NSVF form "f cx cy 0 / 0 0 0 / 0 / 1 / H W" — parse by tokens
    # (np.loadtxt rejects ragged rows)
    lines = [l.split() for l in (scene / "intrinsics.txt").read_text().splitlines()
             if l.strip()]
    first = [float(v) for v in lines[0]]
    if len(lines) >= 4 and len(lines[0]) == 4 and len(lines[1]) == 4 \
            and len(lines[3]) == 4:
        m = np.array([[float(v) for v in row[:4]] for row in lines[:4]])
        fl_x, fl_y = m[0, 0], m[1, 1]
        cx, cy = m[0, 2], m[1, 2]
    else:
        fl_x = fl_y = first[0]
        cx = first[1] if len(first) > 1 else None
        cy = first[2] if len(first) > 2 else None

    poses = sorted((scene / "pose").glob("*.txt"))
    images = sorted((scene / "rgb").glob("*"))
    frames = []
    for pose_f, img_f in zip(poses, images):
        c2w = np.loadtxt(pose_f).reshape(4, 4)
        # NSVF uses OpenCV convention (y down, z forward) — convert to
        # the NeRF convention (y up, z back) like the reference
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        frames.append({
            "file_path": str(Path("rgb") / img_f.name),
            "transform_matrix": c2w.tolist(),
        })

    # centroid normalization
    poses_np = np.array([np.array(fr["transform_matrix"]) for fr in frames])
    center = poses_np[:, :3, 3].mean(0)
    poses_np[:, :3, 3] -= center
    avglen = np.linalg.norm(poses_np[:, :3, 3], axis=-1).mean()
    poses_np[:, :3, 3] *= 4.0 / max(avglen, 1e-9)
    for fr, pose in zip(frames, poses_np):
        fr["transform_matrix"] = pose.tolist()

    from PIL import Image

    with Image.open(scene / "rgb" / images[0].name) as im:
        w, h = im.size

    out = {
        "fl_x": float(fl_x), "fl_y": float(fl_y),
        "cx": float(cx if cx is not None else w / 2),
        "cy": float(cy if cy is not None else h / 2),
        "w": w, "h": h,
        "camera_angle_x": 2 * math.atan(w / (2 * fl_x)),
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    with open(scene / args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {scene/args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
