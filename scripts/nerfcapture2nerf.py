#!/usr/bin/env python3
"""NeRFCapture app stream/dump → transforms.json (reference
scripts/nerfcapture2nerf.py). Offline mode: converts a NeRFCapture
dataset dump (transforms.json already close to our schema, images +
depth) — mostly a path/key normalization pass. The live CycloneDDS
streaming mode of the reference requires the capture SDK and is gated."""

import argparse
import json
import shutil
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scene", help="NeRFCapture dump directory")
    p.add_argument("--aabb_scale", type=int, default=16)
    p.add_argument("--depth", action="store_true", help="keep depth maps")
    args = p.parse_args()
    scene = Path(args.scene)
    src = json.loads((scene / "transforms.json").read_text())

    out = dict(src)
    out["aabb_scale"] = args.aabb_scale
    frames = []
    for fr in src.get("frames", []):
        fr = dict(fr)
        fp = fr["file_path"]
        if not Path(scene / fp).suffix:
            fr["file_path"] = fp + ".png"
        if not args.depth:
            fr.pop("depth_path", None)
        frames.append(fr)
    out["frames"] = frames
    (scene / "transforms.json").write_text(json.dumps(out, indent=2))
    print(f"normalized {len(frames)} frames in {scene/'transforms.json'}")


if __name__ == "__main__":
    main()
