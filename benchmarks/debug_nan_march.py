#!/usr/bin/env python
"""Locate NaN emissions of ray_march_parallel on the real fox tree (CPU).
Caches the built tree + a ray batch in /tmp/f2dbg_state.pkl so reruns skip
the 9-minute octree build."""

import os
import pickle
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CACHE = "/tmp/f2dbg_state.pkl"


def get_state():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer
    from f2nerf_tpu.data.dataset import sample_rays
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", [])
    tr = Trainer(cfg, tempfile.mkdtemp(prefix="f2dbg_"), data, seed=2022)
    R = 2048
    rays_o, rays_d, _, _, _ = sample_rays(
        tr.data, jax.random.PRNGKey(7), R, tr.dataset.height, tr.dataset.width)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    state = dict(
        tree={k: np.asarray(v) for k, v in tr.tree._asdict().items()},
        rays_o=np.asarray(rays_o), rays_d=np.asarray(rays_d),
        sample_l=float(cfg["pts_sampler"]["sample_l"]),
        scale_by_dis=bool(cfg["pts_sampler"]["scale_by_dis"]),
        near=float(cfg["pts_sampler"]["near"]),
    )
    with open(CACHE, "wb") as f:
        pickle.dump(state, f)
    return state


def main():
    from f2nerf_tpu.sampler import device as dv

    s = get_state()
    tree = dv.DeviceTree(**{k: jnp.asarray(v) for k, v in s["tree"].items()})
    rays_o = jnp.asarray(s["rays_o"])
    rays_d = jnp.asarray(s["rays_d"])
    R = rays_o.shape[0]
    near = jnp.full((R,), s["near"])
    far = jnp.full((R,), 1e8)

    hit_idx, hit_near, hit_far, n_hits, trunc = dv.traverse(
        tree, rays_o, rays_d, near, far, max_hits=64)
    print("hits:", float(n_hits.sum()) / R, "nan near:",
          int(jnp.isnan(hit_near).sum()), "nan far:",
          int(jnp.isnan(hit_far).sum()),
          "inf near:", int(jnp.isinf(hit_near).sum()),
          "max |near|:", float(jnp.abs(jnp.where(jnp.isfinite(hit_near), hit_near, 0)).max()),
          "max far:", float(jnp.where(jnp.isfinite(hit_far), hit_far, 0).max()))

    max_s = 512
    jitter = jnp.ones((R, max_s))
    out_t, out_dt, out_node, n_s, first_oct = dv.ray_march_parallel(
        tree, rays_o, rays_d, hit_idx, hit_near, hit_far, n_hits,
        jitter, jnp.asarray(16.0), s["sample_l"], s["scale_by_dis"], max_s)

    pos = jnp.arange(max_s)[None, :]
    ok = pos < n_s[:, None]
    bad_t = jnp.isnan(out_t) & ok
    bad_dt = jnp.isnan(out_dt) & ok
    print("valid samples:", int(ok.sum()), "nan t:", int(bad_t.sum()),
          "nan dt:", int(bad_dt.sum()),
          "nan anywhere in out_t:", int(jnp.isnan(out_t).sum()))

    if int(bad_t.sum()) or int(jnp.isnan(out_t).sum()):
        ri, si = jnp.nonzero(jnp.isnan(out_t))
        r0 = int(ri[0])
        print("first bad ray", r0, "slots", np.asarray(si[ri == r0])[:8],
              "n_s", int(n_s[r0]), "n_hits", int(n_hits[r0]))
        print("hit_near", np.asarray(hit_near[r0])[: int(n_hits[r0]) + 2])
        print("hit_far ", np.asarray(hit_far[r0])[: int(n_hits[r0]) + 2])
        # recompute internals for this ray
        valid_hit = jnp.arange(64)[None, :] < n_hits[r0:r0 + 1, None]
        node_c = jnp.maximum(hit_idx[r0:r0 + 1], 0)
        tr_ = jnp.maximum(tree.trans_idx[node_c.reshape(-1)], 0)
        o_rep = jnp.repeat(rays_o[r0:r0 + 1], 64, axis=0)
        d_rep = jnp.repeat(rays_d[r0:r0 + 1], 64, axis=0)
        xyz = o_rep + d_rep * hit_near[r0].reshape(-1)[:, None]
        pnorm = dv.warp_jac_dir(
            dv._rows(tree.w2xz[tr_].T), dv._rows(tree.weight[tr_].T),
            xyz, d_rep) + 1e-6
        print("pnorm", np.asarray(pnorm)[: int(n_hits[r0]) + 2])
        rad = jnp.linalg.norm(o_rep - tree.t_center[tr_], axis=-1) / tree.t_dis[tr_]
        print("radius", np.asarray(rad)[: int(n_hits[r0]) + 2])
        print("t_dis", np.asarray(tree.t_dis[tr_])[: int(n_hits[r0]) + 2])


if __name__ == "__main__":
    main()
