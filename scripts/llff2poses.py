#!/usr/bin/env python
"""LLFF poses_bounds.npy (17-col) -> cams_meta.npy (27-col).

Reference scripts/llff2poses.py:6-35. LLFF stores [down right back] axes in
a 3x5 [R|t|hwf] block; columns are re-permuted to the NeRF/OpenGL
[right up back] convention (swap first two columns, negate the new second),
intrinsics come from the hwf column with the principal point at the image
center, distortion is zero (LLFF images are pre-undistorted).
"""

import argparse
import os

import numpy as np


def llff_to_cams_meta(poses_bounds: np.ndarray) -> np.ndarray:
    poses_bounds = poses_bounds.reshape(-1, 17)
    poses_hwf = poses_bounds[:, :15].reshape(-1, 3, 5)
    poses = poses_hwf[:, :3, :4]
    hwf = poses_hwf[:, :3, 4]  # (height, width, focal)
    poses = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], axis=2)
    bounds = poses_bounds[:, 15:17]
    n = len(poses)
    intri = np.zeros([n, 3, 3])
    intri[:, 2, 2] = 1.0
    intri[:, 0, 0] = hwf[:, 2]
    intri[:, 1, 1] = hwf[:, 2]
    intri[:, 0, 2] = hwf[:, 1] * 0.5
    intri[:, 1, 2] = hwf[:, 0] * 0.5
    data = np.concatenate([
        poses.reshape(n, -1),
        intri.reshape(n, -1),
        np.zeros([n, 4]),
        bounds.reshape(n, -1),
    ], axis=-1)
    return np.ascontiguousarray(data.astype(np.float64))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    args = ap.parse_args()
    pb = np.load(os.path.join(args.data_dir, "poses_bounds.npy"))
    np.save(os.path.join(args.data_dir, "cams_meta.npy"), llff_to_cams_meta(pb))


if __name__ == "__main__":
    main()
