"""Multi-host (DCN) data-parallel test: 2 real processes x 4 virtual CPU
devices each, coordinated through `jax.distributed` (VERDICT r2 #8).

Exercises the full multi-host story end-to-end on one machine:
  * `init_distributed` with an explicit coordinator (the path a TPU pod
    slice takes over DCN, SURVEY.md §2.3);
  * `make_global_mesh` spanning both processes' devices;
  * per-process data loading: each process materializes ONLY its
    `process_camera_slice` of the image pool, assembled into one global
    sharded array via `shard_data_multihost`;
  * a shard_map step with `pmean` gradients across the 8 global shards —
    both processes must agree on the result (the collective crossed the
    process boundary).

The reference has no distributed layer at all (SURVEY.md §2.3); this test
validates the framework's own design without TPU hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
# A TPU plugin sitecustomize may pre-import jax and pin jax_platforms, so
# (as in tests/conftest.py) the post-import config.update is authoritative;
# XLA_FLAGS is read lazily at backend init, so the env set still works.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import PartitionSpec as P

jax.config.update("jax_platforms", "cpu")
# cross-process collectives on the CPU backend need gloo; without it each
# process builds a local-only client and jax.process_count() stays 1
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.environ["F2_REPO"])
from f2nerf_tpu.parallel import data_parallel as dpm

pid = int(sys.argv[1])
dpm.init_distributed(coordinator_address=os.environ["F2_COORD"],
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = dpm.make_global_mesh()

# per-process camera loading: 8 global cameras, this process reads 4
N_CAMS, H = 8, 16
sl = dpm.process_camera_slice(N_CAMS)
assert (sl.stop - sl.start) == 4
cam_ids = np.arange(N_CAMS, dtype=np.int32)
# deterministic fake pixels: camera c filled with value c
local_imgs = np.stack([np.full((H,), float(c), np.float32)
                       for c in cam_ids[sl]])
local_data = dict(train_images=local_imgs,
                  train_ids=cam_ids[sl],
                  intri=np.eye(3, dtype=np.float32))
data = dpm.shard_data_multihost(local_data, mesh)
assert data["train_images"].shape == (N_CAMS, H)

params = dpm.replicate(dict(w=jnp.ones((4,), jnp.float32)), mesh)

from functools import partial
from jax import shard_map

@jax.jit
def step(params, data):
    def body(params, imgs, ids):
        # per-shard loss touches ONLY this shard's camera pixels
        target = imgs.mean()
        loss_fn = lambda p: jnp.sum((p["w"] - target) ** 2)
        g = jax.grad(loss_fn)(params)
        g = jax.lax.pmean(g, "data")          # crosses the process boundary
        tgt = jax.lax.pmean(target, "data")
        return g, tgt
    return shard_map(body, mesh=mesh,
                     in_specs=(P(), P("data"), P("data")),
                     out_specs=(P(), P()), check_vma=False)(
                         params, data["train_images"], data["train_ids"])

g, tgt = step(params, data)
# global mean over camera values 0..7 = 3.5 -> grad = 2*(1 - 3.5) = -5
tgt_local = np.asarray(g["w"].addressable_shards[0].data)
np.testing.assert_allclose(float(np.asarray(tgt.addressable_shards[0].data)),
                           3.5, rtol=1e-6)
np.testing.assert_allclose(tgt_local, -5.0, rtol=1e-6)
print(f"proc{pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_pmean(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["F2_REPO"] = REPO
    env["F2_COORD"] = f"127.0.0.1:{_free_port()}"
    env["F2_JAX_CACHE"] = "0"
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out


TRAIN_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.environ["F2_REPO"])
from f2nerf_tpu.parallel import data_parallel as dpm

pid = int(sys.argv[1])
dpm.init_distributed(coordinator_address=os.environ["F2_COORD"],
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

from f2nerf_tpu.train import trainer as T
from f2nerf_tpu.utils.config import compose

cfg = compose("confs", "wanjinyou", [
    "train.pts_batch_size=4096",
    "pts_sampler.bbox_levels=6",
    "pts_sampler.max_level=3",
    "pts_sampler.sample_l=0.03125",
    "train.ray_march_init_fineness=2",
    "field.log2_table_size=10",
    "+capacity.max_nodes=8192",
    "+capacity.max_trans=512",
    "+capacity.max_edges=16384",
])
tr = T.Trainer(cfg, os.path.join(os.environ["F2_EXP"], f"proc{pid}"),
               os.environ["F2_DATA"], seed=7)
# the global mesh spans both processes; each holds 4 of the 8 shards
assert tr._multihost and tr.n_shards == 8, (tr._multihost, tr.n_shards)
assert len(tr.data["train_images"].addressable_shards) == 4
# global shape covers ALL cameras though this process loaded only half
assert tr.data["train_images"].shape[0] == tr.data["train_ids"].shape[0]

m1 = tr.train_one()
m2 = tr.train_one()
assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
# checkpoint write is process-0-only (no shared-fs race)
tr.save_checkpoint()
ck = os.path.join(tr.base_exp_dir, "checkpoints")
assert os.path.isdir(ck) == (pid == 0)
print(f"proc{pid} LOSS {m2['loss']:.9e} OK", flush=True)
"""


def test_two_process_real_train_step(tmp_path):
    """VERDICT r4 weak #6: the REAL sharded train step (renderer + sampler +
    optimizer inside shard_map) across a genuine process boundary — 2
    `jax.distributed` CPU processes x 4 virtual devices, gloo collectives.
    Each process constructs the product Trainer, which must (a) pick the
    global mesh, (b) load only its `process_camera_slice` of the image pool
    and assemble the global array via `shard_data_multihost`, and (c) after
    two steps report bitwise-identical replicated losses on both processes
    (the pmean'd gradient crossed DCN and kept params replicated)."""
    from tests.test_train_e2e import make_synthetic_dataset
    data_dir = make_synthetic_dataset(str(tmp_path / "synth"))
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["F2_REPO"] = REPO
    env["F2_DATA"] = data_dir
    env["F2_EXP"] = str(tmp_path / "exp")
    env["F2_COORD"] = f"127.0.0.1:{_free_port()}"
    env["F2_JAX_CACHE"] = "0"
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} LOSS" in out, out
        losses.append(out.split(f"proc{i} LOSS ")[1].split()[0])
    assert losses[0] == losses[1], f"replicated loss diverged: {losses}"
