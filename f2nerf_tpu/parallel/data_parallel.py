"""Data-parallel training over a TPU mesh.

The reference is single-process single-GPU with no distributed layer
(SURVEY.md §2.3); this module is the framework's first-class scaling design:

  * 1-D mesh over the ray/batch dimension ('data');
  * the whole train step runs inside `shard_map`, so the flat-sample-buffer
    compaction (nonzero/segment ops) stays local to each shard — no
    cross-device data-dependent shapes;
  * the training image pool is sharded along cameras (each device holds
    1/N of the pixels and samples rays from its own cameras);
  * parameters, the octree, and the hash pool are replicated; gradients are
    `pmean`'d over ICI; occupancy votes (max-combinable by construction) are
    `pmax`'d, then folded into the replicated tree;
  * the optimizer update is computed redundantly per device on identical
    inputs (cheap relative to the render) keeping parameters bitwise
    replicated.

Multi-host: processes each own their local devices; `jax.distributed`
initialization + per-process camera sharding extends the same spec over DCN
(the mesh axis just gets longer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..data import dataset as ds
from ..render.renderer import RenderStatics, render
from ..sampler import device as dv
from ..train import trainer as T


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (DCN): each process owns its local devices
    and the data mesh spans all of them. With no arguments JAX reads the
    cluster env (TPU pods auto-configure). Call before any other JAX use."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_data(data: dict, mesh: Mesh) -> dict:
    """Place the dataset dict: image pool sharded over cameras, metadata
    replicated."""
    out = {}
    for k, v in data.items():
        spec = P("data") if k in ("train_images", "train_ids") else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_sharded_train_step(cfg: dict, statics: RenderStatics,
                            height: int, width: int, mesh: Mesh):
    """Jitted SPMD train step over `mesh`; `n_rays` is the GLOBAL ray count
    (split evenly across shards)."""
    tcfg = cfg["train"]
    loss_w = dict(disp_loss_weight=float(tcfg["disp_loss_weight"]),
                  tv_loss_weight=float(tcfg["tv_loss_weight"]))
    tx = T.make_optimizer()
    n_shards = mesh.devices.size

    def shard_fn(params, opt_state, tree, consts, data, key, runtime, n_rays):
        me = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, me)
        k_rays, k_render = jax.random.split(key)
        n_local = n_rays // n_shards
        rays_o, rays_d, bounds, gt, img_idx = ds.sample_rays(
            data, k_rays, n_local, height, width)

        def loss_fn(p):
            result, occ = render(
                p, consts, tree, rays_o, rays_d, img_idx, k_render,
                runtime["fineness"], runtime["grad_progress"], statics)
            loss, aux = T.compute_losses(result, gt, n_local, loss_w, runtime)
            aux["stats"] = result["stats"]
            return loss, (aux, occ)

        grads, (aux, occ) = jax.grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, "data")
        occ = {k: jax.lax.pmax(v, "data") for k, v in occ.items()}
        new_tree = dv.apply_occupancy_adders(tree, occ)

        # scalar metrics: losses averaged, stats summed across shards
        aux = dict(aux)
        stats = {k: jax.lax.psum(v, "data") for k, v in aux.pop("stats").items()}
        aux = {k: jax.lax.pmean(v, "data") for k, v in aux.items()}
        aux["stats"] = stats

        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))

        def do_update(_):
            updates, new_opt = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -runtime["lr"] * u, updates)
            return optax.apply_updates(params, updates), new_opt

        new_params, new_opt_state = jax.lax.cond(
            finite, do_update, lambda _: (params, opt_state), None)
        aux["grads_finite"] = finite
        return new_params, new_opt_state, new_tree, aux

    data_spec = dict.fromkeys(
        ("poses", "intri", "dist", "bounds"), P())
    data_spec.update(train_images=P("data"), train_ids=P("data"))

    @partial(jax.jit, static_argnames=("n_rays",), donate_argnums=(0, 1, 2))
    def step(params, opt_state, tree, consts, data, key, runtime, n_rays):
        fn = shard_map(
            partial(shard_fn, n_rays=n_rays), mesh=mesh,
            in_specs=(P(), P(), P(), P(), data_spec, P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)
        return fn(params, opt_state, tree, consts, data, key, runtime)

    return step
