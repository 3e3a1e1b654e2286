#!/usr/bin/env python
"""COLMAP sparse reconstruction -> cams_meta.npy (27-col).

Fresh implementation of the reference workflow (scripts/colmap2poses.py):
  * read the sparse model (cameras/images/points3D, .bin or .txt) with the
    compact reader below (no vendored pycolmap needed);
  * w2c from (qvec, tvec), invert to c2w, convert COLMAP's
    (right, down, forward) to NeRF's (right, up, back) by negating the y/z
    columns; poses sorted by image name;
  * shared intrinsics from camera 0 (SIMPLE_PINHOLE / PINHOLE /
    SIMPLE_RADIAL / RADIAL / OPENCV supported, [k1, k2, p1, p2] exported);
  * per-image near/far = (1st pct * 0.5, 99th pct * 5) of the depths of the
    3D points visible in that image.

Usage: python scripts/colmap2poses.py --data_dir <scene> [--sparse_dir sparse/0]
"""

import argparse
import os
import struct
import sys

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_IDS = {name: i for i, (name, _) in CAMERA_MODELS.items()}


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


# ------------------------------------------------------------ binary readers

def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_bin(path):
    cams = {}
    with open(path, "rb") as f:
        n = _read(f, "<Q")[0]
        for _ in range(n):
            cid, model, w, h = _read(f, "<iiQQ")
            n_params = CAMERA_MODELS[model][1]
            params = _read(f, "<" + "d" * n_params)
            cams[cid] = dict(model=CAMERA_MODELS[model][0], width=w, height=h,
                             params=np.array(params))
    return cams


def read_images_bin(path):
    images = {}
    with open(path, "rb") as f:
        n = _read(f, "<Q")[0]
        for _ in range(n):
            iid = _read(f, "<I")[0]
            qvec = np.array(_read(f, "<dddd"))
            tvec = np.array(_read(f, "<ddd"))
            cam_id = _read(f, "<I")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            n_pts = _read(f, "<Q")[0]
            data = np.frombuffer(f.read(24 * n_pts), dtype=np.float64)
            p3d_ids = data.reshape(-1, 3)[:, 2].copy().view(np.int64) \
                if n_pts else np.zeros(0, np.int64)
            # xys are float64 pairs + int64 id per point; reparse exactly:
            rec = np.frombuffer(data.tobytes(), dtype=[("x", "<f8"), ("y", "<f8"), ("id", "<i8")]) \
                if n_pts else np.zeros(0, dtype=[("x", "<f8"), ("y", "<f8"), ("id", "<i8")])
            images[iid] = dict(qvec=qvec, tvec=tvec, camera_id=cam_id,
                               name=name.decode(), point3d_ids=rec["id"])
    return images


def read_points3d_bin(path):
    with open(path, "rb") as f:
        n = _read(f, "<Q")[0]
        ids = np.zeros(n, np.int64)
        xyz = np.zeros((n, 3), np.float64)
        for i in range(n):
            ids[i] = _read(f, "<Q")[0]
            xyz[i] = _read(f, "<ddd")
            f.read(3)  # rgb
            f.read(8)  # error
            track_len = _read(f, "<Q")[0]
            f.read(8 * track_len)
    return ids, xyz


def read_cameras_txt(path):
    cams = {}
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        cams[int(parts[0])] = dict(
            model=parts[1], width=int(parts[2]), height=int(parts[3]),
            params=np.array([float(x) for x in parts[4:]]))
    return cams


def read_images_txt(path):
    images = {}
    lines = [l for l in open(path) if not l.startswith("#") and l.strip()]
    for meta, pts in zip(lines[0::2], lines[1::2]):
        p = meta.split()
        iid = int(p[0])
        toks = pts.split()
        p3d = np.array([int(x) for x in toks[2::3]], np.int64) if toks else \
            np.zeros(0, np.int64)
        images[iid] = dict(
            qvec=np.array([float(x) for x in p[1:5]]),
            tvec=np.array([float(x) for x in p[5:8]]),
            camera_id=int(p[8]), name=p[9], point3d_ids=p3d)
    return images


def read_points3d_txt(path):
    ids, xyz = [], []
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        p = line.split()
        ids.append(int(p[0]))
        xyz.append([float(p[1]), float(p[2]), float(p[3])])
    return np.asarray(ids, np.int64), np.asarray(xyz, np.float64)


def load_sparse(sparse_dir):
    if os.path.exists(os.path.join(sparse_dir, "cameras.bin")):
        cams = read_cameras_bin(os.path.join(sparse_dir, "cameras.bin"))
        images = read_images_bin(os.path.join(sparse_dir, "images.bin"))
        pids, pxyz = read_points3d_bin(os.path.join(sparse_dir, "points3D.bin"))
    else:
        cams = read_cameras_txt(os.path.join(sparse_dir, "cameras.txt"))
        images = read_images_txt(os.path.join(sparse_dir, "images.txt"))
        pids, pxyz = read_points3d_txt(os.path.join(sparse_dir, "points3D.txt"))
    return cams, images, pids, pxyz


# ---------------------------------------------------------------- conversion

def intrinsics_and_distortion(cam):
    p = cam["params"]
    model = cam["model"]
    k = np.eye(3)
    dist = np.zeros(4)
    if model == "SIMPLE_PINHOLE":
        k[0, 0] = k[1, 1] = p[0]
        k[0, 2], k[1, 2] = p[1], p[2]
    elif model == "PINHOLE":
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = p[:4]
    elif model == "SIMPLE_RADIAL":
        k[0, 0] = k[1, 1] = p[0]
        k[0, 2], k[1, 2] = p[1], p[2]
        dist[0] = p[3]
    elif model == "RADIAL":
        k[0, 0] = k[1, 1] = p[0]
        k[0, 2], k[1, 2] = p[1], p[2]
        dist[0], dist[1] = p[3], p[4]
    elif model == "OPENCV":
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = p[:4]
        dist[:] = p[4:8]
    else:
        raise NotImplementedError(f"camera model {model}")
    return k, dist


def colmap_to_cams_meta(sparse_dir):
    cams, images, pids, pxyz = load_sparse(sparse_dir)
    order = sorted(images, key=lambda i: images[i]["name"])
    n = len(order)
    id_to_xyz = dict(zip(pids.tolist(), pxyz))

    poses = np.zeros((n, 3, 4))
    bounds = np.zeros((n, 2))
    intri = np.zeros((n, 3, 3))
    dists = np.zeros((n, 4))
    for i, iid in enumerate(order):
        im = images[iid]
        r = qvec2rotmat(im["qvec"])
        w2c = np.eye(4)
        w2c[:3, :3] = r
        w2c[:3, 3] = im["tvec"]
        c2w = np.linalg.inv(w2c)[:3]
        # COLMAP (right, down, fwd) -> NeRF (right, up, back)
        c2w = c2w @ np.diag([1.0, -1.0, -1.0, 1.0])
        poses[i] = c2w

        k, dist = intrinsics_and_distortion(cams[im["camera_id"]])
        intri[i], dists[i] = k, dist

        pts = np.array([id_to_xyz[p] for p in im["point3d_ids"]
                        if p >= 0 and p in id_to_xyz])
        if len(pts):
            z = (w2c[2, :3] * pts).sum(-1) + w2c[2, 3]  # +z is forward in COLMAP
            depth = z
            near, far = np.percentile(depth, 1.0), np.percentile(depth, 99.0)
            bounds[i] = near * 0.5, far * 5.0
        else:
            bounds[i] = 0.1, 100.0

    data = np.concatenate([poses.reshape(n, -1), intri.reshape(n, -1),
                           dists, bounds], axis=-1)
    return np.ascontiguousarray(data.astype(np.float64))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--sparse_dir", default=None,
                    help="default <data_dir>/sparse/0")
    args = ap.parse_args()
    sparse = args.sparse_dir or os.path.join(args.data_dir, "sparse", "0")
    data = colmap_to_cams_meta(sparse)
    np.save(os.path.join(args.data_dir, "cams_meta.npy"), data)
    print(f"wrote {data.shape} cams_meta.npy")


if __name__ == "__main__":
    main()
