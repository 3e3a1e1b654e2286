"""Tests for the legacy LLFF pose pipeline (scripts/poses/)."""

import os
import sys

import numpy as np
import pytest

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, _SCRIPTS)

from poses import pose_utils  # noqa: E402


def _random_poses(rng, n):
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        poses[i, :, :3] = q
        poses[i, :, 3] = rng.standard_normal(3) * 2
        poses[i, :, 4] = (480, 640, 500.0)
    return poses


def test_save_poses_and_load_data_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, p = 5, 200
    poses = _random_poses(rng, n)
    # points in front of every camera: centroid + jitter near origin-ish
    pts = rng.standard_normal((p, 3))
    vis = (rng.random((p, n)) < 0.7).astype(np.uint8)
    vis[0] = 1  # every camera sees at least one point

    base = str(tmp_path)
    os.makedirs(os.path.join(base, "images"))
    from PIL import Image
    for i in range(n):
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(base, "images", f"img{i:03d}.png"))

    pose_utils.save_poses(base, poses, pts, vis)
    arr = np.load(os.path.join(base, "poses_bounds.npy"))
    assert arr.shape == (n, 17)
    # bounds ordered and finite
    assert np.all(arr[:, 15] <= arr[:, 16])
    assert np.isfinite(arr).all()
    # depth percentiles match a direct computation for camera 0
    m = vis[:, 0] == 1
    z = (pts[m] - poses[0, :, 3]) @ (-poses[0, :, 2])
    np.testing.assert_allclose(arr[0, 15], np.percentile(z, 0.1))
    np.testing.assert_allclose(arr[0, 16], np.percentile(z, 99.9))
    assert os.path.exists(os.path.join(base, "sparse_cloud.ply"))
    assert os.path.exists(os.path.join(base, "visibility.npy"))

    got_poses, bds = pose_utils.load_data(base, load_imgs=False)
    np.testing.assert_allclose(got_poses[:, :, :4], poses[:, :, :4])
    # hwf fixed to the on-disk 48x64 resolution
    np.testing.assert_allclose(got_poses[:, 0, 4], 48)
    np.testing.assert_allclose(got_poses[:, 1, 4], 64)
    np.testing.assert_allclose(bds, arr[:, 15:])


def test_minify_builds_pyramid(tmp_path):
    rng = np.random.default_rng(1)
    base = str(tmp_path)
    os.makedirs(os.path.join(base, "images"))
    from PIL import Image
    for i in range(2):
        Image.fromarray(
            (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(base, "images", f"im{i}.png"))
    pose_utils.minify(base, factors=[2])
    files = sorted(os.listdir(os.path.join(base, "images_2")))
    assert len(files) == 2
    from f2nerf_tpu.utils.io import read_image
    img = read_image(os.path.join(base, "images_2", files[0]))
    assert img.shape[:2] == (32, 48)


def test_colmap_axis_conversion_matches_reference_formula():
    """COLMAP (right, down, fwd) -> OpenGL (right, up, back): negating the
    y/z columns of R^T must equal diag(1,-1,-1) post-multiplication
    (pose_utils.py:54-55 in the reference)."""
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    r_w2c = q if np.linalg.det(q) > 0 else -q
    ours = r_w2c.T * np.array([1.0, -1.0, -1.0])
    expected = r_w2c.T @ np.diag([1.0, -1.0, -1.0])
    np.testing.assert_allclose(ours, expected)
