"""Dataset ingestion, byte-compatible with the reference formats.

Loads (reference Dataset.cpp:16-125):
  * cams_meta.npy — [n, 27] float64 rows: 12 c2w pose + 9 intrinsics +
    4 distortion (k1, k2, p1, p2) + 2 (near, far);
  * image_list.txt — one image path per line (created by scripts/run.py);
  * split.npy — optional uint8 bitmask (1 train / 2 test / 4 val); fallback:
    every 8th image is test (Dataset.cpp:92-110);
  * poses_render.npy — optional novel-view path.

Pipeline-side semantics:
  * intrinsics divided by `factor` (Dataset.cpp:44);
  * scene normalized: camera centroid -> origin, max radius -> 1
    (Dataset.cpp:127-146); render poses normalized the same way;
  * bounds relaxed by bounds_factor then clamped to [1e-2, 1e9]
    (Dataset.cpp:73-76); global near = bounds.min().

Images are kept on device as uint8 [n, H, W, 3] (4x less HBM than f32) and
converted to [0, 1] floats at gather time inside the jitted train step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera


class Dataset:
    def __init__(self, data_path: str, cfg: dict, load_images: bool = True):
        self.data_path = data_path
        factor = float(cfg.get("factor", 1.0))
        self.factor = factor
        bounds_factor = cfg.get("bounds_factor", [1.0, 1.0])

        cams = np.load(os.path.join(data_path, "cams_meta.npy"))
        assert cams.ndim == 2 and cams.shape[1] == 27, cams.shape
        cams = cams.astype(np.float32)
        self.n_images = cams.shape[0]
        poses = cams[:, :12].reshape(-1, 3, 4).copy()
        intri = cams[:, 12:21].reshape(-1, 3, 3).copy()
        intri[:, :2, :] /= factor
        dist = cams[:, 21:25].copy()
        bounds = cams[:, 25:27].copy()

        poses, bounds, self.center, self.radius = camera.normalize_scene(poses, bounds)
        self.poses = poses
        self.w2c = camera.invert_pose(poses)
        self.intri = intri
        self.dist = dist

        render_path = os.path.join(data_path, "poses_render.npy")
        if os.path.exists(render_path):
            rp = np.load(render_path).astype(np.float32).reshape(-1, 3, 4).copy()
            rp[:, :3, 3] = (rp[:, :3, 3] - self.center) / self.radius
            self.render_poses = rp
        else:
            self.render_poses = None

        bounds = np.stack([bounds[:, 0] * bounds_factor[0],
                           bounds[:, 1] * bounds_factor[1]], axis=-1)
        self.bounds = np.clip(bounds, 1e-2, 1e9).astype(np.float32)
        self.near = float(self.bounds.min())

        split_path = os.path.join(data_path, "split.npy")
        if os.path.exists(split_path):
            sp = np.load(split_path).astype(np.uint8)
            assert sp.shape[0] == self.n_images
            self.train_set = np.nonzero(sp & 1)[0].astype(np.int32)
            self.test_set = np.nonzero(sp & 2)[0].astype(np.int32)
            self.val_set = np.nonzero(sp & 4)[0].astype(np.int32)
        else:
            idx = np.arange(self.n_images)
            self.test_set = idx[idx % 8 == 0].astype(np.int32)
            self.train_set = idx[idx % 8 != 0].astype(np.int32)
            self.val_set = np.zeros((0,), np.int32)

        self.images = None
        self.height = self.width = 0
        if load_images:
            self._load_images()

    def _load_images(self):
        from PIL import Image
        list_path = os.path.join(self.data_path, "image_list.txt")
        if os.path.exists(list_path):
            with open(list_path) as f:
                paths = [line.strip() for line in f if line.strip()]
        else:  # read-only dataset dir: glob directly
            paths = glob_images(self.data_path, self.factor)
        assert len(paths) >= self.n_images, (len(paths), self.n_images)
        imgs = []
        for p in paths[: self.n_images]:
            imgs.append(np.asarray(Image.open(p).convert("RGB"), np.uint8))
        self.images = np.stack(imgs, axis=0)
        self.height, self.width = self.images.shape[1:3]

    # ------------------------------------------------------------- device side

    def device_arrays(self, n_shards: int = 1,
                      process_rows: slice | None = None) -> dict:
        """Arrays consumed by the jitted train/render steps.

        Camera metadata is tiny and replicated; the (large) training-image
        pool is laid out as [n_train (padded to n_shards), H, W, 3] uint8 so
        a data-parallel mesh shards it along cameras — each device keeps
        1/n_shards of the pixels and samples rays only from its own cameras
        (padding repeats leading cameras; with shards << cameras the
        duplicate-sampling bias is negligible).

        ``process_rows`` (multi-host/DCN): keep only this process's slice of
        the camera rows, as HOST numpy — the caller assembles the global
        sharded array via `parallel.data_parallel.shard_data_multihost`, so
        no host ever materializes or uploads the full pool (SURVEY.md §2.3).
        """
        ids = self.train_set
        if n_shards > 1 and len(ids) % n_shards:
            pad = n_shards - len(ids) % n_shards
            ids = np.concatenate([ids, ids[:pad]])
        if process_rows is not None:
            # everything stays HOST numpy: device-committed arrays can't be
            # device_put to a global sharding across processes —
            # shard_data_multihost owns all device placement
            out = dict(poses=self.poses, intri=self.intri, dist=self.dist,
                       bounds=self.bounds)
            ids = ids[process_rows]
            out["train_ids"] = np.asarray(ids, np.int32)
            if self.images is not None:
                out["train_images"] = self.images[ids]
            return out
        out = dict(
            poses=jnp.asarray(self.poses),
            intri=jnp.asarray(self.intri),
            dist=jnp.asarray(self.dist),
            bounds=jnp.asarray(self.bounds),
        )
        out["train_ids"] = jnp.asarray(ids.astype(np.int32))
        if self.images is not None:
            out["train_images"] = jnp.asarray(self.images[ids])
        return out

    @property
    def train_arrays(self):
        """Train-camera subsets for octree construction (c2w, w2c, intri,
        bounds — PersSampler pulls these, Dataset.cpp:113-118)."""
        t = self.train_set
        return self.poses[t], self.w2c[t], self.intri[t], self.bounds[t]


def sample_rays(data: dict, key: jax.Array, n_rays: int, height: int, width: int):
    """Random train rays (RandRaysData, Dataset.cpp:275-298): random
    (train image, pixel) pairs -> (rays_o, rays_d, bounds, gt, img_idx).
    Runs inside jit; under shard_map, `train_images`/`train_ids` are the
    local camera shard and img_idx stays a global image id (the appearance
    embedding index)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_train = data["train_ids"].shape[0]
    cam_pick = jax.random.randint(k1, (n_rays,), 0, n_train)
    img_idx = data["train_ids"][cam_pick]
    i = jax.random.randint(k2, (n_rays,), 0, height).astype(jnp.float32) + 0.5
    j = jax.random.randint(k3, (n_rays,), 0, width).astype(jnp.float32) + 0.5
    gt = data["train_images"][cam_pick, (i - 0.5).astype(jnp.int32),
                              (j - 0.5).astype(jnp.int32)].astype(jnp.float32) / 255.0
    rays_o, rays_d = camera.pixel_to_ray(
        data["poses"][img_idx], data["intri"][img_idx], data["dist"][img_idx], i, j)
    bounds = data["bounds"][img_idx]
    return rays_o, rays_d, bounds, gt, img_idx.astype(jnp.int32)


def sample_rays_single_image(data: dict, key: jax.Array, n_rays: int,
                             height: int, width: int):
    """ray_sample_mode=single_image (RandRaysDataOfCamera,
    Dataset.cpp:251-267): all rays of a batch come from one random train
    camera. Runs inside jit."""
    k0, k1, k2, k3 = jax.random.split(key, 4)
    n_train = data["train_ids"].shape[0]
    pick = jax.random.randint(k0, (), 0, n_train)
    cam_pick = jnp.full((n_rays,), pick)
    img_idx = data["train_ids"][cam_pick]
    i = jax.random.randint(k2, (n_rays,), 0, height).astype(jnp.float32) + 0.5
    j = jax.random.randint(k3, (n_rays,), 0, width).astype(jnp.float32) + 0.5
    gt = data["train_images"][cam_pick, (i - 0.5).astype(jnp.int32),
                              (j - 0.5).astype(jnp.int32)].astype(jnp.float32) / 255.0
    rays_o, rays_d = camera.pixel_to_ray(
        data["poses"][img_idx], data["intri"][img_idx], data["dist"][img_idx], i, j)
    bounds = data["bounds"][img_idx]
    return rays_o, rays_d, bounds, gt, img_idx.astype(jnp.int32)


def rays_interpolate(data: dict, idx_0: int, idx_1: int, alpha: float,
                     height: int, width: int, reso_level: int = 1):
    """Full-image rays from a pose slerped between two cameras
    (RaysInterpolate, Dataset.cpp:237-243)."""
    pose = camera.pose_interpolate(np.asarray(data["poses"][idx_0]),
                                   np.asarray(data["poses"][idx_1]), alpha)
    return pose_rays(data, jnp.asarray(pose), height, width, reso_level)


def rand_rays_whole_space(data: dict, key, n_rays: int, height: int, width: int,
                          window_size: int = 10):
    """Random rays from a pose blended between three nearby train cameras
    (RandRaysWholeSpace, Dataset.cpp:245-255). Host-side pose synthesis +
    jittable ray gen."""
    import numpy as _np
    rng = _np.random.RandomState(int(jax.random.randint(key, (), 0, 1 << 31)))
    n_images = data["poses"].shape[0]
    base = rng.randint(0, max(n_images - window_size, 1))
    a, b, c = (base + rng.randint(0, window_size, 3)) % n_images
    wa, wb, wc = rng.rand(3) + 1e-7
    poses = _np.asarray(data["poses"])
    pose = camera.pose_interpolate(poses[a], poses[b], wb / (wb + wa))
    pose = camera.pose_interpolate(pose, poses[c], wc / (wa + wb + wc))
    k1, k2 = jax.random.split(key)
    i = jax.random.randint(k1, (n_rays,), 0, height).astype(jnp.float32) + 0.5
    j = jax.random.randint(k2, (n_rays,), 0, width).astype(jnp.float32) + 0.5
    rays_o, rays_d = camera.pixel_to_ray(
        jnp.asarray(pose), data["intri"][0], data["dist"][0], i, j)
    return rays_o, rays_d


def camera_rays(data: dict, cam_idx: int, height: int, width: int,
                reso_level: int = 1):
    """Full-image ray grid (RaysOfCamera, Dataset.cpp:177-196).
    Host-callable; returns numpy-backed jnp arrays [H*W, ...]."""
    h = height // reso_level
    w = width // reso_level
    i = jnp.linspace(0.0, height - 1.0, h) + 0.5
    j = jnp.linspace(0.0, width - 1.0, w) + 0.5
    ii, jj = jnp.meshgrid(i, j, indexing="ij")
    pose = data["poses"][cam_idx]
    rays_o, rays_d = camera.pixel_to_ray(
        pose, data["intri"][cam_idx], data["dist"][cam_idx],
        ii.reshape(-1), jj.reshape(-1))
    return rays_o, rays_d


def pose_rays(data: dict, pose: jnp.ndarray, height: int, width: int,
              reso_level: int = 1):
    """Rays from an arbitrary pose with camera-0 intrinsics
    (RaysFromPose, Dataset.cpp:198-218)."""
    h = height // reso_level
    w = width // reso_level
    i = jnp.linspace(0.0, height - 1.0, h) + 0.5
    j = jnp.linspace(0.0, width - 1.0, w) + 0.5
    ii, jj = jnp.meshgrid(i, j, indexing="ij")
    rays_o, rays_d = camera.pixel_to_ray(
        pose, data["intri"][0], data["dist"][0],
        ii.reshape(-1), jj.reshape(-1))
    return rays_o, rays_d


def glob_images(data_path: str, factor: float) -> list[str]:
    """Image paths under images_{factor}/ (scripts/run.py:18-34 semantics)."""
    import glob
    suffixes = ["*.jpg", "*.png", "*.JPG", "*.jpeg"]
    image_list = []
    if 0.999 < factor < 1.001:
        for suf in suffixes:
            image_list += glob.glob(os.path.join(data_path, "images", suf))
            image_list += glob.glob(os.path.join(data_path, "images_1", suf))
    else:
        f_int = int(round(factor))
        for suf in suffixes:
            image_list += glob.glob(os.path.join(data_path, f"images_{f_int}", suf))
    assert image_list, f"No image found under {data_path}"
    image_list.sort()
    return image_list


def make_image_list(data_path: str, factor: float) -> str | None:
    """Create image_list.txt (scripts/run.py:18-34); returns None when the
    dataset dir is read-only (loader then falls back to glob_images)."""
    image_list = glob_images(data_path, factor)
    out = os.path.join(data_path, "image_list.txt")
    try:
        with open(out, "w") as f:
            f.write("\n".join(image_list) + "\n")
    except OSError:
        return None
    return out
