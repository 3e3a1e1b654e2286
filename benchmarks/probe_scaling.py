#!/usr/bin/env python
"""Batch-size scaling probe on fox (TPU): per-phase cost at several ray
counts, to locate fixed per-iteration overheads (while_loop serialization,
compaction, dispatch) vs per-ray work. Run alone on the tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def timed(fn, *args, warm=1, rep=3):
    import jax
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / rep, out


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer, render_statics, make_train_step
    from f2nerf_tpu.sampler import device as dv
    from f2nerf_tpu.data.dataset import sample_rays
    from f2nerf_tpu.train import schedules

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", sys.argv[1:])
    t = time.time()
    tr = Trainer(cfg, "/tmp/probe_exp3", data, seed=2022)
    ckpt = os.path.join(repo, "exp", "ngp_fox", "r2long", "checkpoints", "latest")
    if os.path.exists(ckpt):
        tr.load_checkpoint(ckpt)
        log(f"loaded checkpoint iter={tr.iter_step} "
            f"ema_sampled={tr.ema_sampled:.0f} ema_meaningful={tr.ema_meaningful:.1f}")
    log(f"init: {time.time() - t:.1f}s")
    sample_l = float(cfg["pts_sampler"]["sample_l"])
    sbd = bool(cfg["pts_sampler"]["scale_by_dis"])
    fineness = jnp.asarray(schedules.ray_march_fineness(
        tr.iter_step, cfg["train"]))

    for R in (2048, 8192, 16384):
        key = jax.random.PRNGKey(11)
        rays_o, rays_d, _, gt, img_idx = sample_rays(
            tr.data, key, R, tr.dataset.height, tr.dataset.width)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        near = jnp.full((R,), float(cfg["pts_sampler"]["near"]))
        far = jnp.full((R,), 1e8)

        f_trav = jax.jit(lambda *a: dv.traverse(*a, max_hits=64))
        dt, hits = timed(f_trav, tr.tree, rays_o, rays_d, near, far)
        hit_idx, hit_near, hit_far, n_hits, _ = hits
        log(f"R={R:6d} traverse {dt * 1e3:7.1f} ms "
            f"({dt / R * 1e9:6.0f} ns/ray, hits/ray="
            f"{float(jnp.sum(n_hits)) / R:.1f})")

        max_s = 512
        jit1 = jnp.ones((R, max_s))
        f_par = jax.jit(partial(dv.ray_march_parallel, scale_by_dis=sbd,
                                max_s=max_s, sample_l=sample_l))
        dt, outp = timed(f_par, tr.tree, rays_o, rays_d, hit_idx, hit_near,
                         hit_far, n_hits, jit1, fineness)
        n_s = outp[3]
        log(f"R={R:6d} march    {dt * 1e3:7.1f} ms "
            f"({float(jnp.sum(n_s)) / R:.1f} samples/ray)")

        # full train step at this pinned bucket
        step_fn, st = tr._get_step(R)
        runtime = dict(
            lr=jnp.asarray(1e-2), fineness=fineness,
            grad_progress=jnp.asarray(1.0), var_loss_weight=jnp.asarray(0.0))
        k = jax.random.PRNGKey(5)

        def one(params, opt_state, tree):
            return step_fn(params, opt_state, tree, tr.consts, tr.data,
                           k, runtime, R, None)

        t0 = time.time()
        p, o, trd, aux = one(tr.params, tr.opt_state, tr.tree)
        jax.block_until_ready(aux["loss"])
        log(f"R={R:6d} step compile+1: {time.time() - t0:.1f}s "
            f"caps=({st.cap1},{st.cap2})")
        t0 = time.time()
        rep = 5
        for _ in range(rep):
            p, o, trd, aux = one(p, o, trd)
        jax.block_until_ready(aux["loss"])
        dt = (time.time() - t0) / rep
        log(f"R={R:6d} step     {dt * 1e3:7.1f} ms -> {R / dt:8.0f} rays/s "
            f"sampled/ray={float(aux['stats']['n_sampled']) / R:.1f} "
            f"meaningful/ray={float(aux['stats']['n_meaningful']) / R:.1f}")
        tr.params, tr.opt_state, tr.tree = p, o, trd


if __name__ == "__main__":
    main()
