#!/usr/bin/env python
"""Full train-step phase budget on fox (VERDICT r2 #1: attribute 100%).

Times jitted PREFIXES of the train step at the controller's real operating
point, so phase costs are reported as deltas that sum to the whole step
(fusion across phase boundaries is charged to the later phase). Run alone
(one TPU process). Usage: python benchmarks/probe_step_budget.py [overrides]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def timed(fn, *args, warm=2, rep=8):
    import jax
    out = None
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
    import numpy as np
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train import schedules
    from f2nerf_tpu.train.trainer import (Trainer, compute_losses,
                                          make_optimizer, render_statics)
    from f2nerf_tpu.render import renderer as rd
    from f2nerf_tpu.render.renderer import render, _compact, _field_query, _shader_query
    from f2nerf_tpu.sampler import device as dv
    from f2nerf_tpu.data.dataset import sample_rays
    from f2nerf_tpu.ops.segment import (first_flags_from_ray_id, local_index,
                                        segment_cumsum, segment_sum)
    from f2nerf_tpu.ops.activations import density_activation

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    settle = int(os.environ.get("F2_SETTLE", "80"))
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", sys.argv[1:])
    t = time.time()
    tr = Trainer(cfg, "/tmp/probe_budget", data, seed=2022)
    log(f"Trainer init: {time.time() - t:.1f}s n_trans={tr.n_volumes}")
    # F2_CKPT=<exp>/checkpoints/<iter>: profile a REAL training state (post-
    # milestone culling, mature batch controller) instead of the transient
    if os.environ.get("F2_CKPT"):
        tr.load_checkpoint(os.environ["F2_CKPT"])
        log(f"resumed from {os.environ['F2_CKPT']} at iter {tr.iter_step}")

    for i in range(settle):
        tr.train_one(sync=(i % 8 == 7))
    tr.freeze_controller()
    m = tr.train_one()
    n_rays = m["n_rays"]
    step_fn, st = tr._get_step(n_rays)
    log(f"settled {settle}: bucket={n_rays} cap1={st.cap1} cap2={st.cap2} "
        f"max_s={st.max_s} max_hits={st.max_hits} "
        f"ema sampled/meaningful/oct = {tr.ema_sampled:.1f}/"
        f"{tr.ema_meaningful:.1f}/{tr.ema_oct:.1f}")

    # ---- full step (as the trainer runs it, donated args excluded)
    tcfg = cfg["train"]
    runtime = dict(
        lr=jnp.asarray(schedules.learning_rate(tr.iter_step, tcfg)),
        fineness=jnp.asarray(schedules.ray_march_fineness(tr.iter_step, tcfg)),
        grad_progress=jnp.asarray(
            schedules.gradient_scaling_progress(tr.iter_step, tcfg)),
        var_loss_weight=jnp.asarray(
            schedules.var_loss_weight(tr.iter_step, tcfg)),
    )
    fineness = runtime["fineness"]
    params, opt_state, tree, consts = tr.params, tr.opt_state, tr.tree, tr.consts

    key = jax.random.PRNGKey(123)

    # NOTE: donation invalidates params after one call; so time via trainer
    REP = 20
    for depth in (0, 3):
        tr.pipeline_depth = depth
        for _ in range(3):
            tr.train_one(sync=False)
        jax.block_until_ready(tr.params)
        t = time.time()
        for _ in range(REP):
            tr.train_one(sync=False)
        jax.block_until_ready(tr.params)
        dt_full = (time.time() - t) / REP
        log(f"FULL STEP (pipeline={depth}): {dt_full * 1e3:.1f} ms  "
            f"({n_rays / dt_full:.0f} rays/s)")
    params, opt_state, tree, consts = tr.params, tr.opt_state, tr.tree, tr.consts

    R = n_rays
    H, W = tr.dataset.height, tr.dataset.width
    sample_l = st.sample_l
    loss_w = dict(disp_loss_weight=float(tcfg["disp_loss_weight"]),
                  tv_loss_weight=float(tcfg["tv_loss_weight"]))

    # ---------- phase prefixes ----------
    # NOTE: every phase takes (data, tree, params, consts, key) explicitly.
    # Capturing them as closure free variables would bake them into the HLO
    # as *constants*, and XLA's constant-folding on the multi-MB tree/table
    # arrays blows compile times up to tens of minutes on this 1-core host
    # (observed: 25 min for the fwd-loss phase when captured).
    def p0_rays(data, tree, params, consts, key):
        k_rays, k_render = jax.random.split(key)
        rays_o, rays_d, bounds, gt, img_idx = sample_rays(
            data, k_rays, R, H, W)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        return rays_o, rays_d, gt, img_idx, k_render

    def p1_traverse(data, tree, params, consts, key):
        rays_o, rays_d, gt, img_idx, k_render = p0_rays(
            data, tree, params, consts, key)
        near = jnp.full((R,), st.global_near)
        far = jnp.full((R,), 1e8)
        hits = dv.traverse(tree, rays_o, rays_d, near, far, st.max_hits)
        return rays_o, rays_d, gt, img_idx, k_render, hits

    def p2_march(data, tree, params, consts, key):
        rays_o, rays_d, gt, img_idx, k_render, hits = p1_traverse(
            data, tree, params, consts, key)
        hit_idx, hit_near, hit_far, n_hits, trunc = hits
        k_noise, k_bg, k_edge = jax.random.split(k_render, 3)
        jitter = jax.random.uniform(k_noise, (R, st.max_s),
                                    minval=1e-4, maxval=1.0)
        march = dv.ray_march_parallel(
            tree, rays_o, rays_d, hit_idx, hit_near, hit_far, n_hits,
            jitter, fineness, sample_l, st.scale_by_dis, st.max_s)
        return rays_o, rays_d, gt, img_idx, k_render, march

    def p3_compactA(data, tree, params, consts, key):
        rays_o, rays_d, gt, img_idx, k_render, march = p2_march(
            data, tree, params, consts, key)
        out_t, out_dt, out_node, n_s, first_oct = march
        a, rid_a, ok_a, _ = rd._compact_rowpacked(
            n_s, st.cap1,
            dict(t=out_t.reshape(-1), dt=out_dt.reshape(-1),
                 node=out_node.reshape(-1)), R, max_s=st.max_s)
        rid_ac = jnp.minimum(rid_a, R - 1)
        node_a = jnp.where(ok_a, a["node"], 0)
        trans_a = jnp.maximum(tree.trans_idx[node_a], 0)
        xyz_a = rays_o[rid_ac] + rays_d[rid_ac] * a["t"][:, None]
        warp_a = dv.apply_warp(tree, trans_a, xyz_a)
        pts01_a = (warp_a + 1.0) * 0.5
        return (rays_o, rays_d, gt, img_idx, k_render, a, rid_a, ok_a,
                rid_ac, trans_a, pts01_a)

    def p4_prefilter(data, tree, params, consts, key):
        (rays_o, rays_d, gt, img_idx, k_render, a, rid_a, ok_a,
         rid_ac, trans_a, pts01_a) = p3_compactA(
            data, tree, params, consts, key)
        feat_a = jax.lax.stop_gradient(
            _field_query(params, consts, pts01_a, trans_a, st))
        sigma_a = density_activation(feat_a[:, 0])
        sigma_a = jnp.where(ok_a, sigma_a, 0.0)
        sec_a = sigma_a * a["dt"]
        first_a = first_flags_from_ray_id(rid_a, R)
        acc_a = segment_cumsum(sec_a, first_a, exclusive=True)
        trans_vis_a = jnp.exp(-acc_a)
        alpha_a = 1.0 - jnp.exp(-sec_a)
        weights_a = trans_vis_a * alpha_a
        keep = ok_a & (trans_vis_a > 1e-4)
        return (rays_o, rays_d, gt, img_idx, k_render, a, rid_a, ok_a,
                rid_ac, trans_a, pts01_a, weights_a, alpha_a, keep)

    def fwd_loss(data, tree, params, consts, key):
        k_rays, k_render = jax.random.split(key)
        rays_o, rays_d, bounds, gt, img_idx = sample_rays(
            data, k_rays, R, H, W)
        result, occ = render(params, consts, tree, rays_o, rays_d, img_idx,
                             k_render, fineness, runtime["grad_progress"], st)
        loss, aux = compute_losses(result, gt, R, loss_w, runtime)
        return loss, (aux, occ)

    def p5_compactB(data, tree, params, consts, key):
        (rays_o, rays_d, gt, img_idx, k_render, a, rid_a, ok_a,
         rid_ac, trans_a, pts01_a, weights_a, alpha_a, keep) = p4_prefilter(
            data, tree, params, consts, key)
        dirs_a = rays_d[rid_ac]
        b, rid_b, ok_b, _ = _compact(
            keep, st.cap2,
            dict(t=a["t"], dt=a["dt"], pts01=pts01_a, trans=trans_a,
                 dirs=dirs_a, node=a["node"]), R, ray_id_src=rid_a)
        return (rays_o, rays_d, gt, img_idx, k_render, b, rid_b, ok_b)

    def p6_fieldB(data, tree, params, consts, key):
        (rays_o, rays_d, gt, img_idx, k_render, b, rid_b, ok_b) = p5_compactB(
            data, tree, params, consts, key)
        _, _, k_edge = jax.random.split(k_render, 3)
        vol_b = jnp.where(ok_b, b["trans"], 0)
        edge_pts, edge_anchor = dv.sample_edges(tree, k_edge, st.n_edge)
        q_pts01 = jnp.concatenate(
            [b["pts01"], (edge_pts.reshape(-1, 3) + 1.0) * 0.5], axis=0)
        q_vol = jnp.concatenate([vol_b, edge_anchor.reshape(-1)], axis=0)
        all_feat = _field_query(params, consts, q_pts01, q_vol, st)
        return (rays_o, rays_d, gt, img_idx, k_render, b, rid_b, ok_b,
                all_feat)

    def p6b_shader(data, tree, params, consts, key):
        (rays_o, rays_d, gt, img_idx, k_render, b, rid_b, ok_b,
         all_feat) = p6_fieldB(data, tree, params, consts, key)
        rid_bc = jnp.minimum(rid_b, R - 1)
        scene_feat = all_feat[: st.cap2]
        shading_feat = jnp.concatenate(
            [jnp.ones_like(scene_feat[:, :1]), scene_feat[:, 1:]], axis=-1)
        if st.use_app_emb:
            shading_feat = shading_feat + params["app_emb"][rid_bc * 0]
        colors_s = _shader_query(params, shading_feat, b["dirs"], st)
        return (rays_o, rays_d, gt, b, rid_b, ok_b, all_feat, colors_s)

    def p7_fwd(data, tree, params, consts, key):
        return fwd_loss(data, tree, params, consts, key)[0]

    def p8_grad(data, tree, params, consts, key):
        (loss, (aux, occ)), g = jax.value_and_grad(
            lambda p: fwd_loss(data, tree, p, consts, key),
            has_aux=True)(params)
        return loss, g

    def p9_step_body(data, tree, params, consts, key):
        """grad + occupancy fold (everything in the step but Adam/EMAs)."""
        (loss, (aux, occ)), g = jax.value_and_grad(
            lambda p: fwd_loss(data, tree, p, consts, key),
            has_aux=True)(params)
        new_tree = dv.apply_occupancy_adders(tree, occ)
        return loss, g, new_tree.weight_stats

    phases = [
        ("rays", p0_rays),
        ("traverse", p1_traverse),
        ("march", p2_march),
        ("compactA+warp", p3_compactA),
        ("prefilter field+scan", p4_prefilter),
        ("compactB", p5_compactB),
        ("fieldB+edges", p6_fieldB),
        ("shader", p6b_shader),
    ]
    prev = 0.0
    for name, fn in phases:
        jfn = jax.jit(fn)
        dt, _ = timed(jfn, tr.data, tree, params, consts, key)
        log(f"{name:>24}: cum {dt * 1e3:7.1f} ms   delta {(dt - prev) * 1e3:7.1f} ms")
        prev = dt
    chain_end = prev

    # ---------- standalone pieces (explicit args: the deep phase-prefix
    # chains made XLA's constant/CSE machinery blow up past p4)
    node_flat = jnp.asarray(
        np.random.default_rng(0).integers(0, 4096, st.cap1).astype(np.int32))
    rid_flat = jnp.sort(jnp.asarray(np.random.default_rng(1).integers(
        0, R, st.cap1).astype(np.int32)))
    w_flat = jnp.asarray(np.random.default_rng(2).random(st.cap1, np.float32))

    def occ_fn(node, rid, w):
        occ = dv.compute_occupancy_adders(tree, node, rid, w, w, R)
        return dv.apply_occupancy_adders(tree, occ).weight_stats

    dt, _ = timed(jax.jit(occ_fn), node_flat, rid_flat, w_flat)
    log(f"occupancy standalone (cap1={st.cap1}): {dt * 1e3:7.1f} ms")

    keep_mask = jnp.asarray(
        np.random.default_rng(3).random(st.cap1) < 0.6)
    pts01 = jnp.asarray(
        np.random.default_rng(4).random((st.cap1, 3), np.float32))

    def compactB_fn(keep, t, pts, rid):
        b, rid_b, ok_b, _ = _compact(
            keep, st.cap2, dict(t=t, dt=t, pts01=pts, trans=node_flat,
                                dirs=pts, node=node_flat), R, ray_id_src=rid)
        return b["pts01"].sum() + rid_b.sum()

    dt, _ = timed(jax.jit(compactB_fn), keep_mask, w_flat, pts01, rid_flat)
    log(f"compactB standalone: {dt * 1e3:7.1f} ms")

    dt, _ = timed(jax.jit(p7_fwd), tr.data, tree, params, consts, key)
    log(f"fwd loss (standalone jit): {dt * 1e3:7.1f} ms")
    dt_g, _ = timed(jax.jit(p8_grad), tr.data, tree, params, consts, key)
    log(f"value_and_grad (standalone jit): {dt_g * 1e3:7.1f} ms  "
        f"(bwd overhead vs fwd: {(dt_g - dt) * 1e3:.1f} ms)")
    dt_s, _ = timed(jax.jit(p9_step_body), tr.data, tree, params, consts, key)
    log(f"grad+occupancy fold: {dt_s * 1e3:7.1f} ms")
    log(f"chain p0-shader = {chain_end * 1e3:.1f} ms; "
        f"full step {dt_full * 1e3:.1f} ms; "
        f"step - (grad+occ) = {(dt_full - dt_s) * 1e3:.1f} ms (adam+EMAs+dispatch)")

    # ---------- sample-economy diagnostics (VERDICT r2 #2) ----------
    import numpy as _np
    trans_idx_dev = _np.asarray(jax.device_get(tree.trans_idx))
    th = tr.tree_host
    n = th.n_nodes
    host_leaf = th.is_leaf[:n]
    host_valid = host_leaf & (th.trans_idx[:n] >= 0)
    dev_valid = host_leaf & (trans_idx_dev[:n] >= 0)
    culled = int(_np.sum(host_valid & ~dev_valid))
    log(f"economy: leaves={int(host_leaf.sum())} valid@build={int(host_valid.sum())} "
        f"culled_on_device={culled} "
        f"ema sampled/meaningful/oct = {tr.ema_sampled:.1f}/"
        f"{tr.ema_meaningful:.1f}/{tr.ema_oct:.1f} "
        f"iter={tr.iter_step} fineness={float(fineness):.2f}")


if __name__ == "__main__":
    main()
