#!/usr/bin/env python
"""Template documenting the cams_meta.npy layout for custom captures
(reference scripts/convert_custom_poses.py:7-51).

Each row (float64, 27 columns):
  [ 0:12]  c2w pose, 3x4 row-major, OpenGL convention: the camera looks down
           its -z axis, +y is up;
  [12:21]  3x3 intrinsics (fx, fy, cx, cy in pixels of the FULL-res image);
  [21:25]  OpenCV radial-tangential distortion [k1, k2, p1, p2]
           (zeros if images are pre-undistorted);
  [25:27]  per-camera near/far along the view axis.
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=".")
    args = ap.parse_args()

    n_cams = 10
    poses = np.zeros([n_cams, 3, 4])
    poses[:, :3, :3] = np.eye(3)
    poses[:, :3, 3] = 0.0

    intri = np.zeros([n_cams, 3, 3])
    intri[:, 0, 0] = intri[:, 1, 1] = 256.0     # fx, fy
    intri[:, 0, 2] = intri[:, 1, 2] = 256.0     # cx, cy
    intri[:, 2, 2] = 1.0

    distortion = np.zeros([n_cams, 4])          # [k1, k2, p1, p2]
    bounds = np.tile(np.array([1.0, 100.0]), (n_cams, 1))

    data = np.concatenate([
        poses.reshape(n_cams, 12), intri.reshape(n_cams, 9),
        distortion, bounds], -1)
    np.save(os.path.join(args.data_dir, "cams_meta.npy"),
            np.ascontiguousarray(data.astype(np.float64)))
    print(data.shape)


if __name__ == "__main__":
    main()
