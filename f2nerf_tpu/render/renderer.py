"""Full render pipeline: sample -> prefilter -> field/shader -> composite.

TPU-native equivalent of Renderer::Render (reference Renderer.cpp:52-213):

  1. octree traversal + ray marching into dense per-ray buffers, compacted
     to a flat capacity-CAP1 sample buffer (the reference's ragged arrays);
  2. no-grad density prefilter: keep samples with transmittance > 1e-4
     ("early stop", Renderer.cpp:106-137), compacting to CAP2;
  3. occupancy-stat update from the prefilter weights/alphas
     (Renderer.cpp:140-149) — functional, returns a new tree;
  4. grad pass: anchored hash field on kept samples (+ 8192x2 TV edge
     samples in training, Renderer.cpp:159-170), SH shader with optional
     per-image appearance embedding (Renderer.cpp:184-187), early-training
     gradient scaling (Renderer.cpp:190-195);
  5. alpha compositing via segmented scans (Renderer.cpp:196-208):
     alpha = 1-exp(-sigma*dt), trans = exp(-cumsum_excl), w = trans*alpha,
     color += last_trans * bg; disparity/depth from t + 1e-2.

Everything is fixed-shape: ray count, MAX_HITS, MAX_S, CAP1, CAP2 are
static per jit cache entry; the adaptive batch controller picks a bucket.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields.hash_block import hash_block_encode, hash_block_gather_cached
from ..fields.hash_encoding import hash_encode
from ..fields.mlp import mlp_apply
from ..fields.sh import sh_encode
from ..ops.activations import density_activation, gradient_scaling, trunc_exp
from ..ops.segment import (first_flags_from_ray_id, local_index,
                           segment_cumsum, segment_sum)
from ..sampler import device as dv


class RenderStatics(NamedTuple):
    """Static (compile-time) render configuration."""
    max_hits: int
    max_s: int
    cap1: int
    cap2: int
    n_edge: int
    log2_table_size: int
    sh_degree: int
    sample_l: float
    global_near: float
    scale_by_dis: bool
    use_app_emb: bool
    bg_mode: str          # 'rand_noise' | 'white' | 'black'
    train: bool
    # Single-pass mode: skip the separate no-grad prefilter + recompaction
    # and mask dead samples instead. Numerically identical compositing; the
    # batch controller enables it while the early-stop would cull almost
    # nothing (early training: meaningful ~= sampled), saving a whole field
    # query per step. The reference always runs two passes
    # (Renderer.cpp:106-170).
    single_pass: bool = False
    # 'HashBlock' (TPU-native block-row layout, fields/hash_block.py) or
    # 'Hash3DAnchored' (reference per-corner gather semantics,
    # fields/hash_encoding.py)
    field_type: str = "HashBlock"
    # 'parallel' (while_loop-free jittered-grid marcher, the TPU-native
    # default) or 'lockstep' (reference-exact sequential EMIT/ADVANCE
    # state machine)
    march_mode: str = "parallel"


def _compact(valid_flat: jnp.ndarray, cap: int, fields: dict, n_rays: int,
             ray_id_src=None, max_s: int = None):
    """Compact flat sample arrays keeping `valid` rows, padded to `cap`.

    Returns (gathered fields, ray_id, valid_mask, kept_idx).
    If ray_id_src is None, ray ids derive from position // max_s (dense
    [n_rays, max_s] row-major source)."""
    idx = jnp.nonzero(valid_flat, size=cap, fill_value=valid_flat.shape[0])[0]
    ok = idx < valid_flat.shape[0]
    idx_c = jnp.minimum(idx, valid_flat.shape[0] - 1)
    out = {k: jnp.where(ok.reshape((-1,) + (1,) * (v.ndim - 1)),
                        v[idx_c], jnp.zeros_like(v[:1]))
           for k, v in fields.items()}
    if ray_id_src is None:
        rid = (idx_c // max_s).astype(jnp.int32)
    else:
        rid = ray_id_src[idx_c]
    rid = jnp.where(ok, rid, n_rays).astype(jnp.int32)
    return out, rid, ok, idx_c


_COMPACT_GROUP = 64


def _compact_rowpacked(n_s: jnp.ndarray, cap: int, fields: dict,
                       n_rays: int, max_s: int):
    """Compact a row-packed dense [n_rays, max_s] source (valid samples
    occupy the first n_s[r] slots of each row — exactly what the marcher
    emits) into a flat cap buffer. Output identical to
    ``_compact(pos < n_s, ...)``.

    jnp.nonzero lowers to cumsum+bincount — a (n_rays*max_s)-element
    scatter-add, the slowest primitive on TPU (~45 M updates/s measured;
    73.7 ms of the round-3 step budget at cap 393k). Row-packedness makes
    the kept set *arithmetically* indexable instead: destination slot j
    belongs to the last ray whose pack-prefix start <= j, found with a
    two-level indicator search (group starts, then in-group row gather) —
    only compares, reduces and row gathers, no scatter anywhere.
    """
    G = _COMPACT_GROUP
    n_s = n_s.astype(jnp.int32)
    ends = jnp.cumsum(n_s)
    starts = ends - n_s                                    # [R] monotonic
    total = ends[-1]

    n_grp = -(-n_rays // G)
    pad = n_grp * G - n_rays
    starts_p = jnp.concatenate(
        [starts, jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)]) \
        if pad else starts
    starts2 = starts_p.reshape(n_grp, G)                   # [R/G, G]
    grp_start = starts2[:, 0]                              # [R/G]

    j = jnp.arange(cap, dtype=jnp.int32)
    # level 1: group of each dst slot (indicator sum; fuses, no scatter)
    g = jnp.sum((grp_start[None, :] <= j[:, None]).astype(jnp.int32),
                axis=1) - 1                                # [cap]
    g = jnp.maximum(g, 0)
    # level 2: one row gather of the group's 64 starts, then local count
    row = jax.lax.optimization_barrier(starts2[g])         # [cap, G]
    le = row <= j[:, None]
    r = g * G + jnp.sum(le.astype(jnp.int32), axis=1) - 1
    r = jnp.clip(r, 0, n_rays - 1)

    ok = j < total
    # the owner's start is the largest group start <= j — a masked lane max
    # over the row already in registers (no scalar gather of starts[r])
    s = j - jnp.max(jnp.where(le, row, -1), axis=1)
    src = r * max_s + s
    src_c = jnp.where(ok, src, 0)
    out = {k: jnp.where(ok.reshape((-1,) + (1,) * (v.ndim - 1)),
                        v[src_c], jnp.zeros_like(v[:1]))
           for k, v in fields.items()}
    rid = jnp.where(ok, r, n_rays).astype(jnp.int32)
    return out, rid, ok, src_c


def _field_encode(params, consts, pts01, vol_idx, statics: RenderStatics):
    """hash encode -> [n, N_LEVELS*N_CHANNELS] features."""
    encode = (hash_block_encode if statics.field_type == "HashBlock"
              else hash_encode)
    return encode(params["feat_pool"], consts["prim_pool"],
                  consts["bias_pool"], pts01, vol_idx,
                  statics.log2_table_size)


def _field_query(params, consts, pts01, vol_idx, statics: RenderStatics):
    """hash encode + field MLP -> [n, 16] scene features
    (Hash3DAnchored::AnchoredQuery, Hash3DAnchored.cpp:84-99). The hash ops
    carry a custom VJP with tiny residuals, so no remat is needed."""
    feat = _field_encode(params, consts, pts01, vol_idx, statics)
    return mlp_apply(params["field_mlp"], feat)


def _shader_query(params, shading_feat, dirs, statics: RenderStatics):
    """SH encode + shader MLP + eps-widened sigmoid
    (SHShader::Query, SHShader.cpp:23-29)."""
    enc = sh_encode(dirs, statics.sh_degree)
    x = jnp.concatenate([shading_feat, enc], axis=-1)
    out = mlp_apply(params["shader_mlp"], x)
    eps = 1e-3
    return (1.0 + 2.0 * eps) * jax.nn.sigmoid(out) - eps


def render(params: dict, consts: dict, tree: dv.DeviceTree,
           rays_o: jnp.ndarray, rays_d: jnp.ndarray, emb_idx: jnp.ndarray,
           key: jax.Array, fineness: jnp.ndarray, grad_progress: jnp.ndarray,
           statics: RenderStatics):
    """Render a fixed-size ray batch. Returns (result dict, occupancy-vote
    dict or None). The caller folds the votes into the tree with
    ``apply_occupancy_adders`` (data-parallel shards pmax them first).

    params: feat_pool, field_mlp, shader_mlp, app_emb (trainable pytree).
    consts: prim_pool, bias_pool (fixed buffers).
    emb_idx: [R] int32 per-ray image index (appearance embedding).
    fineness / grad_progress: runtime scalars (no recompile across steps).
    """
    st = statics
    R = rays_o.shape[0]
    k_noise, k_bg, k_edge = jax.random.split(key, 3)

    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    # --- sampling (GetSamples ignores per-ray bounds: PersSampler.cu:322-325)
    near = jnp.full((R,), st.global_near)
    far = jnp.full((R,), 1e8)
    hit_idx, hit_near, hit_far, n_hits, trav_trunc = dv.traverse(
        tree, rays_o, rays_d, near, far, st.max_hits)

    if st.march_mode == "parallel":
        if st.train:
            jitter = jax.random.uniform(k_noise, (R, st.max_s),
                                        minval=1e-4, maxval=1.0)
        else:
            jitter = jnp.ones((R, st.max_s))
        out_t, out_dt, out_node, n_s, first_oct = dv.ray_march_parallel(
            tree, rays_o, rays_d, hit_idx, hit_near, hit_far, n_hits,
            jitter, fineness, st.sample_l, st.scale_by_dis, st.max_s)
    else:
        if st.train:
            noise = (jax.random.uniform(k_noise, (R + st.max_s + 16,)) - 0.5) + 1.0
        else:
            noise = jnp.ones((R + st.max_s + 16,))
        noise = noise * fineness

        out_t, out_dt, out_node, n_s, first_oct = dv.ray_march(
            tree, rays_o, rays_d, hit_idx, hit_near, hit_far, n_hits,
            noise, st.sample_l, st.scale_by_dis, st.max_s)

    # --- compact dense -> flat buffer A [CAP1] (row-packed fast path: the
    # marcher writes each ray's samples at the start of its row)
    a, rid_a, ok_a, _ = _compact_rowpacked(
        n_s, st.cap1,
        dict(t=out_t.reshape(-1), dt=out_dt.reshape(-1),
             node=out_node.reshape(-1)),
        R, max_s=st.max_s)
    rid_ac = jnp.minimum(rid_a, R - 1)
    node_a = jnp.where(ok_a, a["node"], 0)
    trans_a = jnp.maximum(tree.trans_idx[node_a], 0)
    xyz_a = rays_o[rid_ac] + rays_d[rid_ac] * a["t"][:, None]
    warp_a = dv.apply_warp(tree, trans_a, xyz_a)
    # Invalid A slots hold garbage samples (t=0 -> warp of the ray origin)
    # whose perspective division in apply_warp can emit NaN/inf. A NaN here
    # poisons enc_a rows; the cached-B fill index (cap1-1) forwards such a
    # row into the grad pass, where zero-cotangent x NaN kills every shared
    # MLP weight gradient while the loss stays finite (round-3 multi-device
    # regression). Pin invalid slots to the volume center — their outputs
    # are masked out of every composite anyway.
    pts01_a = jnp.where(ok_a[:, None], (warp_a + 1.0) * 0.5, 0.5)
    dirs_a = rays_d[rid_ac]

    occ = None
    n_keep = None
    if st.single_pass:
        # one grad pass over all sampled points; dead-sample suffixes have
        # transmittance < 1e-4 and contribute negligibly to the composite
        b = dict(t=a["t"], dt=a["dt"], pts01=pts01_a, trans=trans_a,
                 dirs=dirs_a, node=a["node"])
        rid_b, ok_b = rid_a, ok_a
        rid_bc = jnp.minimum(rid_b, R - 1)
        vol_b = trans_a
    else:
        # --- no-grad prefilter (Renderer.cpp:106-137). The raw encoding is
        # kept: the grad pass's samples are a gather of this buffer, so the
        # HashBlock B query reuses enc_a instead of re-hashing (16 row
        # gathers/sample -> 1; backward unchanged).
        enc_a = jax.lax.stop_gradient(
            _field_encode(params, consts, pts01_a, trans_a, st))
        feat_a = jax.lax.stop_gradient(mlp_apply(params["field_mlp"], enc_a))
        sigma_a = density_activation(feat_a[:, 0])
        sigma_a = jnp.where(ok_a, sigma_a, 0.0)
        sec_a = sigma_a * a["dt"]
        first_a = first_flags_from_ray_id(rid_a, R)
        acc_a = segment_cumsum(sec_a, first_a, exclusive=True)
        trans_vis_a = jnp.exp(-acc_a)
        alpha_a = 1.0 - jnp.exp(-sec_a)
        weights_a = trans_vis_a * alpha_a
        keep = ok_a & (trans_vis_a > 1e-4)
        n_keep = jnp.sum(keep.astype(jnp.float32))

        if st.train:
            occ = dv.compute_occupancy_adders(
                tree, jnp.where(ok_a, a["node"], -1), rid_a,
                jax.lax.stop_gradient(weights_a),
                jax.lax.stop_gradient(alpha_a), R)

        # --- compact A -> B [CAP2] (FilterIdxBounds equivalent)
        b, rid_b, ok_b, idx_b = _compact(
            keep, st.cap2,
            dict(t=a["t"], dt=a["dt"], pts01=pts01_a, trans=trans_a,
                 dirs=dirs_a, node=a["node"]),
            R, ray_id_src=rid_a)
        rid_bc = jnp.minimum(rid_b, R - 1)
        vol_b = jnp.where(ok_b, b["trans"], 0)

    # --- grad-enabled field query (+ edge samples for TV loss)
    cached = (not st.single_pass) and st.field_type == "HashBlock"
    if st.train:
        edge_pts, edge_anchor = dv.sample_edges(tree, k_edge, st.n_edge)
        edge_pts01 = (edge_pts.reshape(-1, 3) + 1.0) * 0.5
        edge_vol = edge_anchor.reshape(-1)
        if cached:
            enc_b = hash_block_gather_cached(
                params["feat_pool"], consts["prim_pool"],
                consts["bias_pool"], b["pts01"], vol_b,
                st.log2_table_size, enc_a, idx_b)
            # belt-and-braces: the grad-pass MLP must never see a non-finite
            # row, whatever the fill index pointed at
            enc_b = jnp.where(ok_b[:, None], enc_b, 0.0)
            enc_edge = _field_encode(params, consts, edge_pts01, edge_vol, st)
            all_feat = mlp_apply(params["field_mlp"],
                                 jnp.concatenate([enc_b, enc_edge], axis=0))
        else:
            q_pts01 = jnp.concatenate([b["pts01"], edge_pts01], axis=0)
            q_vol = jnp.concatenate([vol_b, edge_vol], axis=0)
            all_feat = _field_query(params, consts, q_pts01, q_vol, st)
        scene_feat = all_feat[: st.cap2]
        edge_feat = all_feat[st.cap2:].reshape(st.n_edge, 2, -1)
    elif cached:
        enc_b = hash_block_gather_cached(
            params["feat_pool"], consts["prim_pool"], consts["bias_pool"],
            b["pts01"], vol_b, st.log2_table_size, enc_a, idx_b)
        enc_b = jnp.where(ok_b[:, None], enc_b, 0.0)
        scene_feat = mlp_apply(params["field_mlp"], enc_b)
        edge_feat = None
    else:
        scene_feat = _field_query(params, consts, b["pts01"], vol_b, st)
        edge_feat = None

    sigma = density_activation(scene_feat[:, :1])
    sigma = jnp.where(ok_b[:, None], sigma, 0.0)
    shading_feat = jnp.concatenate(
        [jnp.ones_like(scene_feat[:, :1]), scene_feat[:, 1:]], axis=-1)
    if st.train and st.use_app_emb:
        shading_feat = shading_feat + params["app_emb"][emb_idx[rid_bc]]

    colors_s = _shader_query(params, shading_feat, b["dirs"], st)

    i_local = local_index(rid_b, R)
    counts_b = segment_sum(jnp.ones_like(rid_b, jnp.float32), rid_b, R)
    count_of = jnp.maximum(counts_b[rid_bc], 1.0)
    a_norm = (i_local.astype(jnp.float32) + 0.5) / count_of
    sigma = gradient_scaling(sigma, a_norm, grad_progress)
    colors_s = gradient_scaling(colors_s, a_norm, grad_progress)

    # --- composite (Renderer.cpp:196-208)
    sampled_t = b["t"] + 1e-2
    sec = sigma[:, 0] * b["dt"]
    first_b = first_flags_from_ray_id(rid_b, R)
    acc = segment_cumsum(sec, first_b, exclusive=True)
    trans_vis = jnp.exp(-acc)
    alpha = 1.0 - jnp.exp(-sec)
    weights = trans_vis * alpha
    weights = jnp.where(ok_b, weights, 0.0)

    if st.bg_mode == "white":
        bg = jnp.ones((R, 3))
    elif st.bg_mode == "black":
        bg = jnp.zeros((R, 3))
    elif st.train:
        bg = jax.random.uniform(k_bg, (R, 3))
    else:
        bg = jnp.full((R, 3), 0.5)

    last_trans = jnp.exp(-segment_sum(sec, rid_b, R))
    colors = segment_sum(weights[:, None] * colors_s, rid_b, R)
    colors = colors + last_trans[:, None] * bg
    disparity = segment_sum(weights / sampled_t, rid_b, R)
    depth = segment_sum(weights * sampled_t, rid_b, R) / (1.0 - last_trans + 1e-4)

    if st.single_pass:
        n_keep = jnp.sum((ok_b & (trans_vis > 1e-4)).astype(jnp.float32))
        if st.train:
            occ = dv.compute_occupancy_adders(
                tree, jnp.where(ok_b, b["node"], -1), rid_b,
                jax.lax.stop_gradient(weights),
                jax.lax.stop_gradient(jnp.where(ok_b, alpha, 0.0)), R)

    result = dict(
        colors=colors,
        first_oct_dis=first_oct,
        disparity=disparity,
        depth=depth,
        edge_feats=edge_feat,
        weights=weights,
        ray_id=rid_b,
        i_local=i_local,
        last_trans=last_trans,
        stats=dict(
            n_sampled=jnp.sum(ok_a.astype(jnp.float32)),
            n_meaningful=n_keep,
            n_oct_hits=jnp.sum(n_hits.astype(jnp.float32)),
            # per-batch max hits/ray: drives proactive hit-buffer growth
            # (recompile BEFORE truncation instead of after) — combined with
            # pmax, not psum, across data-parallel shards
            max_oct_hits=jnp.max(n_hits).astype(jnp.float32),
            overflow_a=jnp.sum(n_s.astype(jnp.float32)) - jnp.sum(ok_a.astype(jnp.float32)),
            n_saturated=jnp.sum((n_s >= st.max_s).astype(jnp.float32)),
            n_trav_truncated=jnp.sum(trav_trunc.astype(jnp.float32)),
            overflow_b=(0.0 if st.single_pass else
                        n_keep - jnp.sum(ok_b.astype(jnp.float32))),
        ),
    )
    return result, occ
