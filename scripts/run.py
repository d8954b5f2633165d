#!/usr/bin/env python3
"""Canonical training/eval driver — the TPU framework's equivalent of
the reference scripts/run.py (train loop via testbed.frame(), PSNR/SSIM
eval on --test_transforms with the reference protocol: black background,
spp 8, min transmittance 1e-4, sRGB, snap-to-pixel-centers —
run.py:257-317; defaults n_steps=35000, run.py:198)."""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import pyngp as ngp  # noqa: E402
from instant_ngp_tpu.metrics import mse_to_psnr, ssim  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="Train/eval neural graphics primitives on TPU")
    p.add_argument("--scene", "--training_data", default="", help="scene path (dir/json/obj/exr/nvdb)")
    p.add_argument("--mode", default="", help="(deprecated; inferred from scene)")
    p.add_argument("--network", default="", help="network config json")
    p.add_argument("--load_snapshot", default="", help="load snapshot before training")
    p.add_argument("--save_snapshot", default="", help="save snapshot after training")
    p.add_argument("--n_steps", type=int, default=-1, help="training steps (default 35000)")
    p.add_argument("--batch_size", type=int, default=1 << 18)
    p.add_argument("--nerf_compatibility", action="store_true",
                   help="match original-NeRF params (sRGB blending, no "
                        "cone stepping, fixed background) for synthetic-"
                        "scene PSNR comparisons")
    p.add_argument("--test_transforms", default="", help="transforms.json for PSNR eval")
    p.add_argument("--screenshot_transforms", default="", help="render screenshots from transforms")
    p.add_argument("--screenshot_frames", nargs="*", help="which frames to screenshot")
    p.add_argument("--screenshot_dir", default="", help="output dir for screenshots")
    p.add_argument("--screenshot_spp", type=int, default=16)
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--save_mesh", default="", help="marching-cubes mesh output path")
    p.add_argument("--marching_cubes_res", type=int, default=256)
    p.add_argument("--optimize_mesh_steps", type=int, default=0,
                   help="vertex-position optimization steps before export")
    # camera-path video rendering (reference run.py --video_* flags;
    # no ffmpeg in this environment, so frames are written as PNGs —
    # the same sequence the reference pipes into ffmpeg)
    p.add_argument("--video_camera_path", default="",
                   help="camera path json (saved by CameraPath.save)")
    p.add_argument("--video_n_seconds", type=float, default=1.0)
    p.add_argument("--video_fps", type=int, default=30)
    p.add_argument("--video_spp", type=int, default=2)
    p.add_argument("--video_output", default="video_frames",
                   help="output directory for the PNG frame sequence")
    p.add_argument("--near_distance", type=float, default=-1)
    p.add_argument("--exposure", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=1337)
    # RFL training schedule (reference scripts/run.py:225-242)
    p.add_argument("--train_mode", default="nerf",
                   choices=["nerf", "rfl", "rflrelax"],
                   help="NeRF / Radiance Field Loss / relaxed RFL")
    p.add_argument("--rfl_warmup_steps", type=int, default=1000,
                   help="steps of NeRF mode before switching to RFL")
    p.add_argument("--rflrelax_begin_step", type=int, default=10000)
    p.add_argument("--rflrelax_end_step", type=int, default=25000)
    return p.parse_args()


def main():
    args = parse_args()
    testbed = ngp.Testbed()
    testbed.seed = args.seed
    testbed.training_batch_size = args.batch_size

    if args.network:
        testbed.reload_network_from_file(args.network)
    if args.scene:
        testbed.load_training_data(args.scene)
    if args.load_snapshot:
        testbed.load_snapshot(args.load_snapshot)

    if args.nerf_compatibility and testbed.mode == ngp.TestbedMode.NERF:
        # reference run.py:164-189: sRGB-space blending is our LDR
        # default already; disable exponential cone stepping and the
        # random background, force plain NeRF mode
        print("NeRF compatibility mode enabled")
        import dataclasses as _dc

        task = testbed.task
        task.cone_angle = 0.0
        task.march_cfg = _dc.replace(task.march_cfg, cone_angle=0.0)
        task.random_bg_color = False
        task.train_mode = "nerf"

    n_steps = args.n_steps
    if n_steps < 0:
        n_steps = 35000

    if n_steps > 0:
        print(f"training {n_steps} steps...")
        t0 = time.time()
        last_print = 0
        while testbed.training_step < n_steps:
            # mode schedule (reference run.py:225-242): warm up in NeRF
            # mode; RflRelax only "surface-ifies" mid-training, with a
            # NeRF fine-tune at the end
            if args.train_mode == "rflrelax":
                in_window = args.rflrelax_begin_step <= testbed.training_step < args.rflrelax_end_step
                testbed.task.train_mode = "rflrelax" if in_window else "nerf"
            elif args.train_mode == "rfl":
                warm = testbed.training_step <= args.rfl_warmup_steps
                testbed.task.train_mode = "nerf" if warm else "rfl"
            testbed.frame()
            if testbed.training_step - last_print >= 100:
                last_print = testbed.training_step
                el = time.time() - t0
                print(
                    f"iteration={testbed.training_step} loss={testbed.loss:.6f} "
                    f"({testbed.training_step/el:.1f} steps/s)",
                    flush=True,
                )
        print(f"trained in {time.time()-t0:.1f}s final loss={testbed.loss:.6f}")

    if args.save_snapshot:
        testbed.save_snapshot(args.save_snapshot)
        print(f"saved snapshot {args.save_snapshot}")

    if args.save_mesh:
        from instant_ngp_tpu.geometry.marching_cubes import extract_mesh

        verts, faces, colors = extract_mesh(testbed.task, res=args.marching_cubes_res)
        if args.optimize_mesh_steps > 0 and len(verts):
            from instant_ngp_tpu.geometry.marching_cubes import optimise_mesh

            verts = optimise_mesh(
                testbed.task, verts, faces, n_steps=args.optimize_mesh_steps
            )
        from instant_ngp_tpu.geometry.mesh_io import save_obj, save_ply

        if args.save_mesh.endswith(".ply"):
            save_ply(args.save_mesh, verts, faces, colors)
        else:
            save_obj(args.save_mesh, verts, faces, colors)
        print(f"saved mesh {args.save_mesh} ({len(verts)} verts, {len(faces)} faces)")

    if args.test_transforms:
        print(f"evaluating {args.test_transforms}")
        with open(args.test_transforms) as f:
            test = json.load(f)
        from instant_ngp_tpu.io.nerf_loader import load_nerf
        from instant_ngp_tpu.common import srgb_to_linear, linear_to_srgb

        test_ds = load_nerf(args.test_transforms)
        task = testbed.task
        # reference protocol (run.py:257-317): black background, spp 8,
        # min transmittance 1e-4, sRGB, snap-to-pixel-centers
        task.min_transmittance = 1e-4
        from instant_ngp_tpu.metrics import flip as flip_metric

        psnrs, ssims, flips = [], [], []
        for i in range(test_ds.n_images):
            w, h = test_ds.resolution
            frame = task.render(
                w, h, test_ds.xforms_start[i],
                focal_length=tuple(test_ds.focal_lengths[i]),
                principal_point=tuple(test_ds.principal_points[i]),
                spp=8, background=(0, 0, 0, 0),
            )
            img = test_ds.images[i].astype(np.float32)
            if not test_ds.is_hdr:
                img = img / 255.0
                lin = np.asarray(srgb_to_linear(img[..., :3])) * img[..., 3:4]
                gt = np.asarray(linear_to_srgb(lin))
            else:
                gt = np.asarray(linear_to_srgb(img[..., :3] ))
            pred = np.clip(frame[..., :3], 0, 1)
            mse = float(np.mean((pred - gt) ** 2))
            psnrs.append(mse_to_psnr(mse))
            ssims.append(ssim(gt, pred))
            flips.append(flip_metric(gt, pred))
            print(f"  view {i}: psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.3f} "
                  f"flip={flips[-1]:.4f}", flush=True)
        print(f"PSNR={np.mean(psnrs):.2f} [min={np.min(psnrs):.2f} max={np.max(psnrs):.2f}] "
              f"SSIM={np.mean(ssims):.3f} FLIP={np.mean(flips):.4f}")

    if args.video_camera_path:
        from instant_ngp_tpu.io.image import save_image
        from instant_ngp_tpu.render.camera_path import (
            CameraPath,
            render_video_frames,
        )

        path = CameraPath.load(args.video_camera_path)
        n_frames = max(int(args.video_n_seconds * args.video_fps), 1)
        w = args.width or 1920
        h = args.height or 1080
        os.makedirs(args.video_output, exist_ok=True)
        frames = render_video_frames(
            testbed.task, path, n_frames, w, h, spp=args.video_spp
        )
        for i, frame in enumerate(frames):
            out = Path(args.video_output) / f"{i:05d}.png"
            save_image(out, frame[..., :3])
        print(f"wrote {len(frames)} video frames to {args.video_output}/ "
              f"(encode with: ffmpeg -framerate {args.video_fps} -i %05d.png out.mp4)")

    if args.screenshot_transforms:
        os.makedirs(args.screenshot_dir or ".", exist_ok=True)
        shot_ds_path = args.screenshot_transforms
        from instant_ngp_tpu.io.image import save_image
        from instant_ngp_tpu.io.nerf_loader import load_nerf

        shot_ds = load_nerf(shot_ds_path)
        frames = (
            [int(f) for f in args.screenshot_frames]
            if args.screenshot_frames
            else range(shot_ds.n_images)
        )
        for i in frames:
            w = args.width or shot_ds.resolution[0]
            h = args.height or shot_ds.resolution[1]
            frame = testbed.task.render(
                w, h, shot_ds.xforms_start[i],
                focal_length=tuple(shot_ds.focal_lengths[i] * np.array([w, h]) / shot_ds.resolution),
                principal_point=tuple(shot_ds.principal_points[i]),
            )
            out = Path(args.screenshot_dir or ".") / f"{i:04d}.png"
            save_image(out, frame[..., :3])
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
