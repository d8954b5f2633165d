#!/usr/bin/env python3
"""Convert images to/from the raw `.bin` gigapixel format
(int32 h,w header + fp16 RGBA — reference scripts/convert_image.py and
testbed_image.cu:393-457)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from instant_ngp_tpu.io.image import load_image, save_image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args()
    img, is_hdr = load_image(args.input)
    save_image(args.output, img)
    print(f"wrote {args.output} ({img.shape[1]}x{img.shape[0]}, hdr={is_hdr})")


if __name__ == "__main__":
    main()
