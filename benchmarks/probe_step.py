#!/usr/bin/env python
"""Instrumented single-step probe on the real TPU: times octree build, each
compile, and steady-state steps per bucket. Prints timestamped lines."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    import jax
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", sys.argv[1:])
    log(f"devices: {jax.devices()}")
    t = time.time()
    tr = Trainer(cfg, "/tmp/probe_exp", data, seed=2022)
    log(f"Trainer init (octree build + data load): {time.time() - t:.1f}s "
        f"n_nodes={tr.tree_host.n_nodes} n_trans={tr.n_volumes}")

    for i in range(30):
        t = time.time()
        m = tr.train_one(sync=True)
        dt = time.time() - t
        log(f"iter {i}: {dt:6.3f}s n_rays={m['n_rays']} "
            f"psnr={m['psnr']:.2f} sampled={m['n_sampled']:.0f} "
            f"meaningful={m['n_meaningful']:.0f} "
            f"caps_key={list(tr._step_cache.keys())[-1]}")
    # steady state: freeze controller, time a pipelined wall
    tr.freeze_controller()
    m = tr.train_one()
    n_rays = m["n_rays"]
    t = time.time()
    K = 20
    for _ in range(K):
        tr.train_one(sync=False)
    tr.train_one()
    wall = time.time() - t
    log(f"steady: {wall / (K + 1):.3f}s/iter at {n_rays} rays "
        f"-> {(K + 1) * n_rays / wall:.0f} rays/s")


if __name__ == "__main__":
    main()
