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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# NOTE: renderer/trainer are imported lazily inside make_sharded_train_step.
# They create device constants at import time, which initializes the XLA
# backend — and `init_distributed` must run before ANY backend init
# (jax.distributed contract). This module must stay importable first.


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


def make_global_mesh() -> Mesh:
    """Multi-host data mesh over ALL global devices (every process's local
    devices, in process order — `jax.devices()` is globally consistent after
    `init_distributed`). The mesh axis simply spans DCN."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def process_camera_slice(n_images: int) -> slice:
    """The contiguous camera range THIS process loads from disk (per-process
    data loading: each host reads only its own cameras; the device mesh then
    shards those over its local devices). Matches the padded round-robin
    layout of `Dataset.device_arrays(n_shards=global)`."""
    n_proc = jax.process_count()
    per = -(-n_images // n_proc)
    lo = jax.process_index() * per
    return slice(lo, min(lo + per, n_images))


def shard_data_multihost(local_data: dict, mesh: Mesh,
                         sharded_keys=("train_images", "train_ids")) -> dict:
    """Assemble globally-sharded arrays from process-LOCAL shards.

    `local_data[k]` for sharded keys holds only this process's camera rows
    (1/process_count of the global leading dim); other keys are replicated
    from identical host copies. Uses `jax.make_array_from_process_local_data`
    so no host ever materializes the full image pool — the multi-host
    data-loading story (SURVEY.md §2.3 DCN design)."""
    out = {}
    for k, v in local_data.items():
        if k in sharded_keys:
            v = np.asarray(v)
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data")), v, global_shape)
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def shard_data(data: dict, mesh: Mesh) -> dict:
    """Place the dataset dict: image pool sharded over cameras, metadata
    replicated."""
    out = {}
    for k, v in data.items():
        spec = P("data") if k in ("train_images", "train_ids") else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a (host or single-device) pytree onto every mesh device.

    Multi-host: a device-committed local array can't be device_put straight
    to a global sharding (the target spans non-addressable devices), so leaves
    are dropped to host numpy first — every process holds an identical copy
    by construction (replicated inputs + deterministic host logic), which is
    exactly the contract `device_put(np, global-replicated)` requires."""
    if jax.process_count() > 1:
        tree = jax.tree_util.tree_map(np.asarray, tree)
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_sharded_train_step(cfg: dict, statics, height: int, width: int,
                            mesh: Mesh):
    """Jitted SPMD train step over `mesh`; `n_rays` is the GLOBAL ray count
    (split evenly across shards). Thin alias: the single-chip and sharded
    step share ONE builder (trainer.make_train_step) so the two paths can
    never drift; `statics` (a renderer.RenderStatics) must be built for the
    per-shard ray count."""
    from ..train import trainer as T
    return T.make_train_step(cfg, statics, height, width, mesh=mesh)
