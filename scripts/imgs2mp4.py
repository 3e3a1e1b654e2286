#!/usr/bin/env python
"""PNG sequence -> mp4 (reference scripts/imgs2mp4.py:8-32)."""

import argparse
import os
from glob import glob


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--suffix", default="*.png")
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args()

    import cv2 as cv
    paths = sorted(glob(os.path.join(args.data_dir, args.suffix)))
    assert paths, f"no {args.suffix} under {args.data_dir}"
    imgs = [cv.imread(p) for p in paths]
    h, w, _ = imgs[-1].shape
    out = cv.VideoWriter(os.path.join(args.data_dir, "output.mp4"),
                         cv.VideoWriter_fourcc(*"mp4v"), args.fps, (w, h), True)
    for img in imgs:
        out.write(img)
    out.release()


if __name__ == "__main__":
    main()
