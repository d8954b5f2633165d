#!/usr/bin/env python3
"""Record3D capture → transforms.json (reference scripts/record3d2nerf.py):
parses the metadata json (per-frame poses as quaternions + intrinsics)
written by the Record3D iOS app and emits transforms.json."""

import argparse
import json
import math
from pathlib import Path

import numpy as np


def quat2mat(q):
    x, y, z, w = q  # Record3D stores xyzw
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scene", help="Record3D export dir (metadata + rgb frames)")
    p.add_argument("--rotate", action="store_true", help="portrait capture")
    p.add_argument("--subsample", type=int, default=1)
    p.add_argument("--aabb_scale", type=int, default=16)
    args = p.parse_args()
    scene = Path(args.scene)

    meta_path = next(iter(sorted(scene.glob("metadata*"))), None)
    if meta_path is None:
        raise SystemExit("no metadata file found")
    meta = json.loads(meta_path.read_text())

    K = np.array(meta["K"]).reshape(3, 3).T
    fl_x, fl_y, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    w = int(meta.get("w", cx * 2))
    h = int(meta.get("h", cy * 2))

    frames = []
    for i, pose in enumerate(meta["poses"]):
        if i % args.subsample:
            continue
        q, t = pose[:4], pose[4:7]
        c2w = np.eye(4)
        c2w[:3, :3] = quat2mat(q)
        c2w[:3, 3] = t
        # camera convention: Record3D is OpenGL-style already (y up)
        img = scene / "rgb" / f"{i}.jpg"
        if not img.exists():
            img = scene / f"{i}.jpg"
        frames.append({
            "file_path": str(img.relative_to(scene)),
            "transform_matrix": c2w[:3].tolist() + [[0, 0, 0, 1]],
        })

    poses_np = np.array([np.array(fr["transform_matrix"]) for fr in frames])
    center = poses_np[:, :3, 3].mean(0)
    poses_np[:, :3, 3] -= center
    avglen = np.linalg.norm(poses_np[:, :3, 3], axis=-1).mean()
    poses_np[:, :3, 3] *= 4.0 / max(avglen, 1e-9)
    for fr, pose in zip(frames, poses_np):
        fr["transform_matrix"] = pose.tolist()

    out = {
        "fl_x": float(fl_x), "fl_y": float(fl_y), "cx": float(cx), "cy": float(cy),
        "w": w, "h": h,
        "camera_angle_x": 2 * math.atan(w / (2 * fl_x)),
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    (scene / "transforms.json").write_text(json.dumps(out, indent=2))
    print(f"wrote {scene/'transforms.json'} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
