#!/usr/bin/env python
"""Sample-economy dissection at a trained checkpoint (VERDICT r3 #4).

Loads a real checkpoint, renders train-mode batches, and decomposes
meaningful samples per ray (the early-stop keep set, trans > 1e-4 —
Renderer.cpp:126-148) into:

  * pre-surface free space (trans > 0.99: the field is empty there but the
    sample is still "meaningful" by the reference's criterion),
  * the surface shell (1e-4 < trans <= 0.99, where weights concentrate),
  * per-sample warp step sizes (dt distribution) and leaf occupancy.

This answers WHERE the ~100 meaningful/ray live. The reference's steady
state reaches ~20/ray on fox (ExpRunner.cpp:86 controller), which requires
free-space leaves to be culled so rays produce almost no pre-surface
samples. If most of our meaningful samples sit at trans > 0.99 in LIVE
leaves, culling (PersSampler.cu:475-535 semantics) is the lever; if they
sit in the shell, step sizing (sample_l / fineness / scale_by_dis) is.

Usage:
  python benchmarks/probe_economy.py exp/ngp_fox/r4full/checkpoints/20000
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ckpt = sys.argv[1]
    n_rays = 2048

    import jax
    import jax.numpy as jnp

    from f2nerf_tpu.data.dataset import sample_rays
    from f2nerf_tpu.render.renderer import render
    from f2nerf_tpu.train.trainer import Trainer, render_statics
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.ops.segment import first_flags_from_ray_id, segment_cumsum
    from f2nerf_tpu.fields.mlp import mlp_apply
    from f2nerf_tpu.ops.activations import density_activation
    from f2nerf_tpu.render import renderer as R

    repo = os.path.join(os.path.dirname(__file__), "..")
    data = os.path.join(repo, "data", "example", "ngp_fox")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", [])
    import tempfile
    tr = Trainer(cfg, tempfile.mkdtemp(prefix="f2probe_"), data, seed=2022)
    tr.load_checkpoint(ckpt)
    print(f"iter {tr.iter_step}  hit_cap {tr.hit_cap}  "
          f"EMA meaningful {tr.ema_meaningful:.1f}")

    st = render_statics(cfg, n_rays, tr.dataset.near, train=True,
                        max_s=512, cap1=1 << 19, cap2=1 << 19,
                        max_hits=tr.hit_cap)

    import f2nerf_tpu.sampler.device as dv
    from f2nerf_tpu.train import schedules
    fineness = schedules.ray_march_fineness(tr.iter_step, cfg["train"])

    def probe(params, consts, tree, rays_o, rays_d, key):
        """Replicates the renderer's sample + prefilter path, returning the
        per-sample diagnostics the product renderer doesn't expose."""
        R_ = rays_o.shape[0]
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        near = jnp.full((R_,), st.global_near)
        far = jnp.full((R_,), 1e8)
        hit_idx, hit_near, hit_far, n_hits, trunc = dv.traverse(
            tree, rays_o, rays_d, near, far, st.max_hits)
        jitter = jax.random.uniform(key, (R_, st.max_s), minval=1e-4,
                                    maxval=1.0)
        out_t, out_dt, out_node, n_s, _ = dv.ray_march_parallel(
            tree, rays_o, rays_d, hit_idx, hit_near, hit_far, n_hits,
            jitter, jnp.asarray(fineness), st.sample_l, st.scale_by_dis,
            st.max_s)
        a, rid_a, ok_a, _ = R._compact_rowpacked(
            n_s, st.cap1, dict(t=out_t.reshape(-1), dt=out_dt.reshape(-1),
                               node=out_node.reshape(-1)), R_, max_s=st.max_s)
        rid_ac = jnp.minimum(rid_a, R_ - 1)
        node_a = jnp.where(ok_a, a["node"], 0)
        trans_a = jnp.maximum(tree.trans_idx[node_a], 0)
        xyz = rays_o[rid_ac] + rays_d[rid_ac] * a["t"][:, None]
        warp = dv.apply_warp(tree, trans_a, xyz)
        pts01 = jnp.where(ok_a[:, None], (warp + 1.0) * 0.5, 0.5)
        enc = R._field_encode(dict(feat_pool=params["feat_pool"]),
                              consts, pts01, trans_a, st)
        feat = mlp_apply(params["field_mlp"], enc)
        sigma = density_activation(feat[:, 0])
        sigma = jnp.where(ok_a, sigma, 0.0)
        sec = sigma * a["dt"]
        first = first_flags_from_ray_id(rid_a, R_)
        acc = segment_cumsum(sec, first, exclusive=True)
        trans_vis = jnp.exp(-acc)
        alpha = 1.0 - jnp.exp(-sec)
        return dict(ok=ok_a, trans_vis=trans_vis, alpha=alpha,
                    dt=a["dt"], n_hits=n_hits, n_s=n_s,
                    w=trans_vis * alpha)

    jp = jax.jit(probe)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    rays_o, rays_d, _, _, _ = sample_rays(tr.data, k1, n_rays,
                                          tr.dataset.height, tr.dataset.width)
    out = jax.device_get(jp(tr.params, tr.consts, tr.tree, rays_o, rays_d, k2))

    ok = out["ok"].astype(bool)
    tv = out["trans_vis"][ok]
    keep = tv > 1e-4
    free = tv > 0.99
    shell = keep & ~free
    n = float(ok.sum())
    print(f"sampled/ray        {n / n_rays:8.1f}")
    print(f"meaningful/ray     {float(keep.sum()) / n_rays:8.1f}")
    print(f"  free-space (trans>0.99)  {float(free.sum()) / n_rays:8.1f}")
    print(f"  surface shell            {float(shell.sum()) / n_rays:8.1f}")
    print(f"  post-surface (culled)    {float((~keep).sum()) / n_rays:8.1f}")
    w = out["w"][ok]
    print(f"weight: frac>1e-2 {np.mean(w > 1e-2):.4f}  frac>1e-4 "
          f"{np.mean(w > 1e-4):.4f}")
    dt = out["dt"][ok]
    print(f"dt: p10 {np.percentile(dt, 10):.5f}  median "
          f"{np.median(dt):.5f}  p90 {np.percentile(dt, 90):.5f}")
    print(f"oct hits/ray {float(out['n_hits'].sum()) / n_rays:.1f}   "
          f"marched samples/ray {float(out['n_s'].sum()) / n_rays:.1f}")


if __name__ == "__main__":
    main()
