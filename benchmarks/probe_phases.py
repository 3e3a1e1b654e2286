#!/usr/bin/env python
"""Phase-level TPU probe on fox: compares lockstep vs parallel marching at
identical state and times each render phase. Run alone (one TPU process)."""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(90, repeat=True, file=sys.stderr)

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
    from f2nerf_tpu.train.trainer import Trainer, render_statics
    from f2nerf_tpu.render.renderer import render, _field_query
    from f2nerf_tpu.sampler import device as dv
    from f2nerf_tpu.data.dataset import sample_rays

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", sys.argv[1:])
    t = time.time()
    tr = Trainer(cfg, "/tmp/probe_exp2", data, seed=2022)
    log(f"Trainer init: {time.time() - t:.1f}s n_trans={tr.n_volumes}")

    R = 2048
    max_s = 512
    key = jax.random.PRNGKey(7)
    rays_o, rays_d, _, gt, img_idx = sample_rays(
        tr.data, key, R, tr.dataset.height, tr.dataset.width)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((R,), 0.01)
    far = jnp.full((R,), 1e8)

    # --- traverse
    f_trav = jax.jit(lambda *a: dv.traverse(*a, max_hits=64))
    dt, hits = timed(f_trav, tr.tree, rays_o, rays_d, near, far)
    hit_idx, hit_near, hit_far, n_hits, trunc = hits
    log(f"traverse: {dt * 1e3:.1f} ms  oct_hits/ray={float(jnp.sum(n_hits)) / R:.1f} trunc={int(jnp.sum(trunc))}")

    fineness = jnp.asarray(16.0)
    sample_l = float(cfg["pts_sampler"]["sample_l"])
    sbd = bool(cfg["pts_sampler"]["scale_by_dis"])

    # --- march lockstep
    noise = jnp.ones((R + max_s + 16,)) * fineness
    f_seq = jax.jit(partial(dv.ray_march, scale_by_dis=sbd, max_s=max_s,
                            sample_l=sample_l))
    dt, outs = timed(f_seq, tr.tree, rays_o, rays_d, hit_idx, hit_near,
                     hit_far, n_hits, noise)
    t_seq, dt_seq, node_seq, ns_seq, _ = outs
    log(f"march lockstep: {dt * 1e3:.1f} ms  sampled/ray={float(jnp.sum(ns_seq)) / R:.1f}")

    # --- march parallel
    jit1 = jnp.ones((R, max_s))
    f_par = jax.jit(partial(dv.ray_march_parallel, scale_by_dis=sbd,
                            max_s=max_s, sample_l=sample_l))
    dt, outp = timed(f_par, tr.tree, rays_o, rays_d, hit_idx, hit_near,
                     hit_far, n_hits, jit1, fineness)
    t_par, dt_par, node_par, ns_par, _ = outp
    log(f"march parallel: {dt * 1e3:.1f} ms  sampled/ray={float(jnp.sum(ns_par)) / R:.1f}")

    # --- density stats on each sample set at init params
    def density_stats(out_t, out_node, n_s, tag):
        pos = jnp.arange(max_s)[None, :]
        ok = pos < n_s[:, None]
        node = jnp.where(ok, out_node, 0)
        tvals = jnp.where(ok, out_t, 0.0)
        trans_i = jnp.maximum(tr.tree.trans_idx[node.reshape(-1)], 0)
        xyz = (rays_o[:, None, :] + rays_d[:, None, :] * tvals[..., None])
        warp = dv.apply_warp(tr.tree, trans_i, xyz.reshape(-1, 3))
        pts01 = (warp + 1.0) * 0.5
        feat = _field_query(tr.params, tr.consts, pts01, trans_i,
                            render_statics(cfg, R, tr.dataset.near, False,
                                           max_s, 1024, 1024))
        from f2nerf_tpu.ops.activations import density_activation
        sig = density_activation(feat[:, 0])
        sig = jnp.where(ok.reshape(-1), sig, 0.0)
        okf = ok.reshape(-1)
        n_ok = jnp.sum(okf)
        warp_absmax = jnp.where(okf[:, None], jnp.abs(warp), 0.0).max()
        q = jnp.percentile(jnp.where(okf, sig, 0.0), jnp.asarray([50.0, 90.0, 99.0, 100.0]))
        # per-sample warp dt and transmittance
        dt_used = dt_seq if tag == "seq" else dt_par
        sec = sig.reshape(R, max_s) * jnp.where(ok, dt_used, 0.0)
        csum = jnp.cumsum(sec, axis=1)
        keep = (jnp.exp(-(csum - sec)) > 1e-4) & ok
        log(f"[{tag}] sigma q50/90/99/max={[float(x) for x in q]} "
            f"warp_absmax={float(warp_absmax):.2f} "
            f"sec_mean={float(jnp.sum(sec) / jnp.maximum(n_ok, 1)):.4f} "
            f"meaningful/ray={float(jnp.sum(keep)) / R:.1f}")

    density_stats(t_seq, node_seq, ns_seq, "seq")
    density_stats(t_par, node_par, ns_par, "par")

    # --- full render fwd (train statics, parallel) + grad step phases
    st = render_statics(cfg, R, tr.dataset.near, train=True,
                        max_s=max_s, cap1=262144, cap2=262144)

    @jax.jit
    def fwd(params, key):
        res, _ = render(params, tr.consts, tr.tree, rays_o, rays_d, img_idx,
                        key, fineness, jnp.asarray(1.0), st)
        return res["colors"].sum()

    dt, _ = timed(fwd, tr.params, key)
    log(f"render fwd (cap1=cap2=262144): {dt * 1e3:.1f} ms")

    @jax.jit
    def bwd(params, key):
        return jax.grad(lambda p: fwd(p, key))(params)["feat_pool"].sum()

    dt, _ = timed(bwd, tr.params, key)
    log(f"render fwd+bwd: {dt * 1e3:.1f} ms")

    # --- field query alone at cap2 samples
    pts01 = jax.random.uniform(key, (262144, 3))
    vol = jnp.zeros((262144,), jnp.int32)

    @jax.jit
    def fq(params):
        return _field_query(params, tr.consts, pts01, vol, st).sum()

    dt, _ = timed(fq, tr.params)
    log(f"field fwd 262144: {dt * 1e3:.1f} ms")

    @jax.jit
    def fqb(params):
        return jax.grad(lambda p: fq(p))(params)["feat_pool"].sum()

    dt, _ = timed(fqb, tr.params)
    log(f"field fwd+bwd 262144: {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
