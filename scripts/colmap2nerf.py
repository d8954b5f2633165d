#!/usr/bin/env python3
"""COLMAP → transforms.json converter.

Counterpart of the reference scripts/colmap2nerf.py (465 LoC): parses
COLMAP text exports (cameras.txt, images.txt), computes the
camera-centroid scene normalization (centroid → origin, avg camera
distance → 4/aabb units), sharpness scores, and writes the
transforms.json schema consumed by io/nerf_loader.py. COLMAP/ffmpeg
invocation helpers are included but gated on the binaries existing
(this environment has no COLMAP; point --text at an existing export).
"""

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="convert a COLMAP export to transforms.json")
    p.add_argument("--video_in", default="", help="video to extract frames from (needs ffmpeg)")
    p.add_argument("--video_fps", default=2.0, type=float)
    p.add_argument("--run_colmap", action="store_true", help="run colmap (needs binary)")
    p.add_argument("--images", default="images", help="image folder")
    p.add_argument("--text", default="colmap_text", help="colmap text export folder")
    p.add_argument("--aabb_scale", default=16, type=int, choices=[1, 2, 4, 8, 16, 32, 64, 128])
    p.add_argument("--keep_colmap_coords", action="store_true")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--skip_early", default=0, type=int)
    return p.parse_args()


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def sharpness(image_path) -> float:
    """Variance of Laplacian (reference uses the same measure)."""
    try:
        import cv2

        img = cv2.imread(str(image_path))
        if img is None:
            return 100.0
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return float(cv2.Laplacian(gray, cv2.CV_64F).var())
    except Exception:
        return 100.0


def run_ffmpeg(args):
    if not shutil.which("ffmpeg"):
        sys.exit("ffmpeg not found")
    os.makedirs(args.images, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-i", args.video_in, "-qscale:v", "1", "-qmin", "1",
         "-vf", f"fps={args.video_fps}", f"{args.images}/%04d.jpg"],
        check=True,
    )


def run_colmap(args):
    if not shutil.which("colmap"):
        sys.exit("colmap not found; run COLMAP elsewhere and pass --text")
    db = "colmap.db"
    subprocess.run(["colmap", "feature_extractor", "--database_path", db,
                    "--image_path", args.images,
                    "--ImageReader.camera_model", "OPENCV",
                    "--ImageReader.single_camera", "1"], check=True)
    subprocess.run(["colmap", "exhaustive_matcher", "--database_path", db], check=True)
    os.makedirs("colmap_sparse", exist_ok=True)
    subprocess.run(["colmap", "mapper", "--database_path", db,
                    "--image_path", args.images, "--output_path", "colmap_sparse"], check=True)
    os.makedirs(args.text, exist_ok=True)
    subprocess.run(["colmap", "model_converter", "--input_path", "colmap_sparse/0",
                    "--output_path", args.text, "--output_type", "TXT"], check=True)


def main():
    args = parse_args()
    if args.video_in:
        run_ffmpeg(args)
    if args.run_colmap:
        run_colmap(args)

    text = Path(args.text)
    cameras = {}
    with open(text / "cameras.txt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            els = line.split()
            cam = {"w": float(els[2]), "h": float(els[3])}
            model = els[1]
            cam["fl_x"] = float(els[4])
            cam["fl_y"] = float(els[4])
            cam["cx"] = cam["w"] / 2
            cam["cy"] = cam["h"] / 2
            cam["k1"] = cam["k2"] = cam["p1"] = cam["p2"] = 0.0
            if model == "SIMPLE_PINHOLE":
                cam["cx"], cam["cy"] = float(els[5]), float(els[6])
            elif model == "PINHOLE":
                cam["fl_y"], cam["cx"], cam["cy"] = float(els[5]), float(els[6]), float(els[7])
            elif model == "SIMPLE_RADIAL":
                cam["cx"], cam["cy"], cam["k1"] = float(els[5]), float(els[6]), float(els[7])
            elif model == "RADIAL":
                cam["cx"], cam["cy"], cam["k1"], cam["k2"] = map(float, els[5:9])
            elif model == "OPENCV":
                cam["fl_y"], cam["cx"], cam["cy"] = float(els[5]), float(els[6]), float(els[7])
                cam["k1"], cam["k2"], cam["p1"], cam["p2"] = map(float, els[8:12])
            else:
                print(f"warning: unhandled camera model {model}", file=sys.stderr)
            cameras[int(els[0])] = cam

    cam0 = next(iter(cameras.values()))
    angle_x = 2 * math.atan(cam0["w"] / (2 * cam0["fl_x"]))
    angle_y = 2 * math.atan(cam0["h"] / (2 * cam0["fl_y"]))

    frames = []
    with open(text / "images.txt") as f:
        lines = [l for l in f if not l.startswith("#")]
    for i in range(0, len(lines), 2):  # alternating pose/points lines
        els = lines[i].split()
        if len(els) < 10:
            continue
        if (i // 2) < args.skip_early:
            continue
        qvec = np.array(list(map(float, els[1:5])))
        tvec = np.array(list(map(float, els[5:8])))
        name = "_".join(els[9:])
        # reference uses qvec2rotmat(-qvec); q and -q encode the same
        # rotation, so this is identical
        R = qvec2rotmat(qvec)
        t = tvec.reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0)
        c2w = np.linalg.inv(w2c)
        if not args.keep_colmap_coords:
            c2w[0:3, 2] *= -1  # flip the y and z axis
            c2w[0:3, 1] *= -1
            c2w = c2w[[1, 0, 2, 3], :]
            c2w[2, :] *= -1  # world coordinate flip
        frames.append({
            "file_path": str(Path(args.images) / name),
            "sharpness": sharpness(Path(args.images) / name),
            "transform_matrix": c2w.tolist(),
        })

    if not args.keep_colmap_coords:
        # scene normalization: centroid → origin, avg distance → 4 units
        # (reference colmap2nerf.py:179+)
        poses = np.array([np.array(fr["transform_matrix"]) for fr in frames])
        center = poses[:, 0:3, 3].mean(0)
        poses[:, 0:3, 3] -= center
        avglen = np.linalg.norm(poses[:, 0:3, 3], axis=-1).mean()
        poses[:, 0:3, 3] *= 4.0 / max(avglen, 1e-9)
        for fr, p in zip(frames, poses):
            fr["transform_matrix"] = p.tolist()

    out = {
        "camera_angle_x": angle_x,
        "camera_angle_y": angle_y,
        "fl_x": cam0["fl_x"],
        "fl_y": cam0["fl_y"],
        "k1": cam0["k1"], "k2": cam0["k2"], "p1": cam0["p1"], "p2": cam0["p2"],
        "cx": cam0["cx"], "cy": cam0["cy"],
        "w": cam0["w"], "h": cam0["h"],
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    main()
