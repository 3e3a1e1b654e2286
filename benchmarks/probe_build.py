#!/usr/bin/env python
"""Timestamped breakdown of octree construction on fox (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    import numpy as np
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.data import dataset as ds
    from f2nerf_tpu.sampler import octree as oc
    from f2nerf_tpu.sampler import warp as wp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", sys.argv[1:])
    t = time.time()
    dset = ds.Dataset(data, cfg["dataset"])
    log(f"dataset load: {time.time() - t:.1f}s imgs={dset.images.shape}")

    c2w, w2c, intri, bounds = dset.train_arrays
    pcfg = cfg["pts_sampler"]

    t = time.time()
    rays_o, rays_d = oc._proxy_rays(c2w, intri)
    log(f"proxy rays: {time.time() - t:.1f}s {rays_d.shape}")

    t = time.time()
    visi_fn = oc._make_visi_fn(rays_o, rays_d, bounds, chunk=64)
    out = visi_fn(np.zeros((64, 3), np.float32), np.full((64,), 1.0, np.float32))
    log(f"visi_fn first call (compile+run): {time.time() - t:.1f}s")
    t = time.time()
    out = visi_fn(np.zeros((200, 3), np.float32), np.full((200,), 1.0, np.float32))
    log(f"visi_fn 200 nodes: {time.time() - t:.1f}s")

    t = time.time()
    rng = np.random.default_rng(0)
    w2xz, d_s = wp.virtual_cams(c2w, intri[0], np.zeros(3), rng)
    log(f"one virtual_cams: {time.time() - t:.3f}s")

    t = time.time()
    L = 32
    w_all = np.tile(w2xz[None].astype(np.float32), (L, 1, 1, 1))
    weights = wp.finish_trans_batch(
        w_all, centers=np.zeros((L, 3), np.float32),
        sides=np.full((L,), 0.5, np.float32), seed=1)
    log(f"finish_trans_batch L=32 (compile+run): {time.time() - t:.1f}s")
    t = time.time()
    weights = wp.finish_trans_batch(
        w_all, centers=np.zeros((L, 3), np.float32),
        sides=np.full((L,), 0.5, np.float32), seed=2)
    log(f"finish_trans_batch L=32 warm: {time.time() - t:.1f}s")

    t = time.time()
    tree = oc.build_octree(c2w, w2c, intri, bounds, pcfg, seed=2022)
    log(f"full build_octree: {time.time() - t:.1f}s n_nodes={tree.n_nodes} "
        f"n_trans={tree.n_trans} edges={tree.edge_t.shape[0]}")


if __name__ == "__main__":
    main()
