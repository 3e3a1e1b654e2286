"""End-to-end training smoke test on a tiny synthetic scene (CPU).

Builds a synthetic dataset (solid colored ball at the origin viewed from a
camera ring), writes reference-format files (cams_meta.npy + images), then
runs the full Trainer pipeline for a few steps: loss must drop, checkpoint
must round-trip, eval render must produce finite images.
"""

import os

import numpy as np
import pytest

from f2nerf_tpu.utils.config import compose

from tests.test_sampler import synthetic_rig  # reuse camera ring


def make_synthetic_dataset(tmpdir, n_cams=24, h=40, w=60):
    c2w, w2c, intri, bounds = synthetic_rig(n_cams=n_cams)
    # shrink intrinsics to the tiny image size
    intri = intri.copy()
    intri[:, 0, 0] = intri[:, 1, 1] = 50.0
    intri[:, 0, 2] = w / 2
    intri[:, 1, 2] = h / 2
    dist = np.zeros((n_cams, 4), np.float32)
    bounds = np.tile(np.array([0.5, 6.0], np.float32), (n_cams, 1))

    # render a lambertian-ish ball of radius 0.7 at origin, orange on gray bg
    imgs = []
    for k in range(n_cams):
        i, j = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
        u = (j - intri[k, 0, 2]) / intri[k, 0, 0]
        v = (i - intri[k, 1, 2]) / intri[k, 1, 1]
        d = np.stack([u, -v, -np.ones_like(u)], -1) @ c2w[k, :3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[k, :3, 3]
        # ray-sphere
        b = (d * o).sum(-1)
        c = (o * o).sum() - 0.7 ** 2
        disc = b * b - c
        hit = disc > 0
        img = np.full((h, w, 3), 0.5, np.float32)
        img[hit] = np.array([0.9, 0.5, 0.1])
        imgs.append((img * 255).astype(np.uint8))

    os.makedirs(os.path.join(tmpdir, "images"), exist_ok=True)
    from PIL import Image
    paths = []
    for k, im in enumerate(imgs):
        p = os.path.join(tmpdir, "images", f"{k:04d}.png")
        Image.fromarray(im).save(p)
        paths.append(p)
    with open(os.path.join(tmpdir, "image_list.txt"), "w") as f:
        f.write("\n".join(paths) + "\n")

    cams = np.zeros((n_cams, 27), np.float64)
    cams[:, :12] = c2w.reshape(n_cams, -1)
    cams[:, 12:21] = intri.reshape(n_cams, -1)
    cams[:, 21:25] = dist
    cams[:, 25:27] = bounds
    np.save(os.path.join(tmpdir, "cams_meta.npy"), cams)
    return tmpdir


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    data_dir = make_synthetic_dataset(str(tmp_path_factory.mktemp("synth")))
    exp_dir = str(tmp_path_factory.mktemp("exp"))
    cfg = compose("confs", "wanjinyou", [
        "train.pts_batch_size=4096",
        "train.end_iter=60",
        "train.learning_rate_warm_up_end_iter=10",
        "pts_sampler.bbox_levels=6",
        "pts_sampler.max_level=4",
        "pts_sampler.sample_l=0.015625",  # 1/64: coarse for speed
        "train.ray_march_init_fineness=2",
        "field.log2_table_size=12",
        "+capacity.max_nodes=8192",
        "+capacity.max_trans=512",
        "+capacity.max_edges=16384",
    ])
    from f2nerf_tpu.train.trainer import Trainer
    tr = Trainer(cfg, exp_dir, data_dir, seed=2022)
    return tr


def test_training_reduces_loss(trainer):
    start = trainer.iter_step
    losses = []
    for i in range(60):
        m = trainer.train_one()
        losses.append(m["mse"])
        assert np.isfinite(m["loss"]), m
        if i == 0:
            # at init sigma is ~e^-3 everywhere, so transmittance decays
            # slowly and the prefilter must keep nearly every sample; a
            # collapsed ratio here means samples are being culled by a
            # geometry/NaN bug, not by learned density (the failure mode a
            # bare loss-drop assertion missed)
            assert m["n_meaningful"] > 0.8 * m["n_sampled"], m
    assert trainer.iter_step == start + 60
    assert np.mean(losses[-10:]) < 0.85 * np.mean(losses[:10]), losses


def test_checkpoint_roundtrip(trainer):
    import jax
    trainer.save_checkpoint()
    # materialize before train_one donates the buffers
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(trainer.params)]
    step0 = trainer.iter_step
    trainer.train_one()
    trainer.load_checkpoint()
    assert trainer.iter_step == step0
    p1 = jax.tree_util.tree_leaves(trainer.params)
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_render(trainer):
    from f2nerf_tpu.data.dataset import camera_rays
    while len(trainer.mse_records) < 30:  # self-sufficient when run alone
        trainer.train_one()
    idx = int(trainer.dataset.test_set[0])
    ro, rd = camera_rays(trainer.data, idx,
                         trainer.dataset.height, trainer.dataset.width)
    colors, disp, octd = trainer.render_image(np.asarray(ro), np.asarray(rd),
                                              chunk=1024, max_s=128)
    assert colors.shape == (trainer.dataset.height * trainer.dataset.width, 3)
    assert np.isfinite(colors).all() and np.isfinite(disp).all()
    # eval must track training quality (catches silent sample-buffer
    # overflows that leave rays rendering as background): its mse should be
    # in the same regime as the recent train mse, not at the ~0.1+ level of
    # an untrained/background-only render
    gt = trainer.dataset.images[idx].reshape(-1, 3).astype(np.float32) / 255.0
    mse_pred = float(((np.clip(colors, 0, 1) - gt) ** 2).mean())
    train_mse = float(np.mean(trainer.mse_records[-10:]))
    assert mse_pred < 3.0 * train_mse + 1e-3, (mse_pred, train_mse)


def test_host_data_loader(trainer, tmp_path_factory):
    """data_at_gpu=false: host-side pixel gather feeds the same step."""
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer
    cfg = compose("confs", "wanjinyou", [
        "train.pts_batch_size=4096",
        "train.learning_rate_warm_up_end_iter=10",
        "pts_sampler.bbox_levels=6",
        "pts_sampler.max_level=4",
        "pts_sampler.sample_l=0.015625",
        "train.ray_march_init_fineness=2",
        "field.log2_table_size=12",
        "dataset.data_at_gpu=false",
        "+capacity.max_nodes=8192",
        "+capacity.max_trans=512",
        "+capacity.max_edges=16384",
    ])
    tr = Trainer(cfg, str(tmp_path_factory.mktemp("exp_host")),
                 trainer.dataset.data_path, seed=3)
    assert "train_images" not in tr.data
    for _ in range(3):
        m = tr.train_one()
    assert np.isfinite(m["loss"]) and m["n_sampled"] > 0


def test_single_image_ray_mode(trainer, tmp_path_factory):
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer
    cfg = compose("confs", "wanjinyou", [
        "train.pts_batch_size=4096",
        "pts_sampler.bbox_levels=6",
        "pts_sampler.max_level=4",
        "pts_sampler.sample_l=0.015625",
        "train.ray_march_init_fineness=2",
        "field.log2_table_size=12",
        "dataset.ray_sample_mode=single_image",
        "+capacity.max_nodes=8192",
        "+capacity.max_trans=512",
        "+capacity.max_edges=16384",
    ])
    tr = Trainer(cfg, str(tmp_path_factory.mktemp("exp_si")),
                 trainer.dataset.data_path, seed=4)
    m = tr.train_one()
    assert np.isfinite(m["loss"])


def test_hash3d_anchored_field_trains(trainer, tmp_path_factory):
    """field.type=Hash3DAnchored (the reference per-corner semantics,
    fields/hash_encoding.py) must train end-to-end — it is the non-default
    arm of the equal-budget A/B (benchmarks/run_ab_field.sh) and must also
    exercise the renderer's non-cached B pass (renderer.py: cached is
    HashBlock-only)."""
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer
    cfg = compose("confs", "wanjinyou", [
        "train.pts_batch_size=4096",
        "train.learning_rate_warm_up_end_iter=10",
        "pts_sampler.bbox_levels=6",
        "pts_sampler.max_level=4",
        "pts_sampler.sample_l=0.015625",
        "train.ray_march_init_fineness=2",
        "field.type=Hash3DAnchored",
        "field.log2_table_size=12",
        "+capacity.max_nodes=8192",
        "+capacity.max_trans=512",
        "+capacity.max_edges=16384",
    ])
    tr = Trainer(cfg, str(tmp_path_factory.mktemp("exp_h3d")),
                 trainer.dataset.data_path, seed=5)
    losses = []
    for _ in range(20):
        m = tr.train_one()
        losses.append(m["mse"])
        assert np.isfinite(m["loss"])
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_reset(trainer):
    p0 = np.asarray(trainer.params["feat_pool"])
    trainer.reset()
    p1 = np.asarray(trainer.params["feat_pool"])
    assert np.abs(p0 - p1).max() > 0
    m = trainer.train_one()
    assert np.isfinite(m["loss"])


def test_hit_cap_adaptation(trainer):
    """VERDICT r2 #5: the traversal hit capacity must honor the configured
    max_oct_intersect_per_ray by growing — never silently dropping
    geometry. Both adaptation paths, compile-free."""
    from f2nerf_tpu.train.trainer import grow_hit_cap

    # EMA-driven growth: doubles until the EMA sits below 75% of the cap
    assert grow_hit_cap(64, 1024, ema_oct=10.0) == 64
    assert grow_hit_cap(64, 1024, ema_oct=49.0) == 128
    assert grow_hit_cap(64, 1024, ema_oct=200.0) == 512
    assert grow_hit_cap(64, 1024, ema_oct=1e9) == 1024   # clamped at limit
    assert grow_hit_cap(1024, 1024, ema_oct=1e9) == 1024  # no overshoot

    # truncation-reactive doubling via _ingest_aux (fake device aux)
    cap0, lim0 = trainer.hit_cap, trainer.hit_cap_limit
    frozen0 = trainer.controller_frozen
    try:
        trainer.controller_frozen = False
        trainer.hit_cap, trainer.hit_cap_limit = 64, 1024
        aux = dict(mse=1e-2, loss=1e-2,
                   stats=dict(n_sampled=4096.0, n_meaningful=2048.0,
                              n_oct_hits=512.0, n_trav_truncated=3.0))
        trainer._ingest_aux(64, aux)
        assert trainer.hit_cap == 128
        assert trainer.trunc_ema > 0
        # at the limit, truncation can no longer grow the cap
        trainer.hit_cap = 1024
        trainer._ingest_aux(64, aux)
        assert trainer.hit_cap == 1024
    finally:
        trainer.hit_cap, trainer.hit_cap_limit = cap0, lim0
        trainer.controller_frozen = frozen0
