#!/usr/bin/env python3
"""Apply binary masks to dataset images (reference scripts/mask_images.py):
pixels where the mask is black become the transparent 'ignore' color
(0x00FF00FF magenta tag the loader maps to negative RGBA)."""

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("images", help="image folder")
    p.add_argument("masks", help="mask folder (same file names)")
    p.add_argument("--out", default="", help="output folder (default: in place)")
    args = p.parse_args()
    img_dir, mask_dir = Path(args.images), Path(args.masks)
    out_dir = Path(args.out) if args.out else img_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for img_path in sorted(img_dir.iterdir()):
        mask_path = mask_dir / img_path.name
        if not mask_path.exists() or img_path.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = np.asarray(Image.open(img_path).convert("RGBA")).copy()
        mask = np.asarray(Image.open(mask_path).convert("L"))
        ignore = mask < 128
        img[ignore] = (255, 0, 255, 0)  # the loader's masked-away tag
        Image.fromarray(img).save(out_dir / (img_path.stem + ".png"))
        n += 1
    print(f"masked {n} images → {out_dir}")


if __name__ == "__main__":
    main()
