"""Schedule curves vs the reference formulas (ExpRunner.cpp:221-254)."""

import math

import pytest

from f2nerf_tpu.train import schedules

CFG = dict(learning_rate=1e-2, learning_rate_alpha=1e-1,
           learning_rate_warm_up_end_iter=1000, end_iter=20000,
           ray_march_init_fineness=16, ray_march_fineness_decay_end_iter=10000,
           gradient_scaling_start=1000, gradient_scaling_end=5000,
           var_loss_weight=1e-2, var_loss_start=5000, var_loss_end=10000)


def test_learning_rate_curve():
    assert schedules.learning_rate(0, CFG) == 0.0
    assert schedules.learning_rate(500, CFG) == pytest.approx(5e-3)
    assert schedules.learning_rate(1000, CFG) == pytest.approx(1e-2)
    # cosine tail ends at alpha * base
    assert schedules.learning_rate(20000, CFG) == pytest.approx(1e-3)
    mid = schedules.learning_rate(10500, CFG)
    expect = 1e-2 * ((1 - 0.1) * (math.cos(0.5 * math.pi) * 0.5 + 0.5) + 0.1)
    assert mid == pytest.approx(expect)


def test_fineness_decay():
    assert schedules.ray_march_fineness(0, CFG) == pytest.approx(16.0)
    assert schedules.ray_march_fineness(10000, CFG) == 1.0
    assert schedules.ray_march_fineness(5000, CFG) == pytest.approx(4.0)  # sqrt(16)


def test_gradient_scaling_progress():
    assert schedules.gradient_scaling_progress(0, CFG) == 0.0
    assert schedules.gradient_scaling_progress(3000, CFG) == pytest.approx(0.5)
    assert schedules.gradient_scaling_progress(5000, CFG) == 1.0
    off = dict(CFG, gradient_scaling_start=0, gradient_scaling_end=0)
    assert schedules.gradient_scaling_progress(0, off) == 1.0


def test_var_loss_ramp():
    assert schedules.var_loss_weight(4999, CFG) == 0.0
    assert schedules.var_loss_weight(7500, CFG) == pytest.approx(5e-3)
    assert schedules.var_loss_weight(10001, CFG) == pytest.approx(1e-2)


def test_all_top_configs_compose():
    from f2nerf_tpu.utils.config import compose
    for name in ("wanjinyou", "wanjinyou_big", "free", "llff", "nerf-360"):
        cfg = compose("confs", name, [])
        for group in ("train", "dataset", "renderer", "pts_sampler",
                      "field", "shader"):
            assert group in cfg, (name, group)
        assert cfg["shader"]["degree"] == 4
        assert cfg["pts_sampler"]["type"] == "PersSampler"


def test_bucket_hysteresis_dead_band():
    from f2nerf_tpu.train.trainer import pick_bucket_hysteresis

    # fresh controller: raw pick wins
    assert pick_bucket_hysteresis(3100.0, None) == 3072
    # boundary noise around 3072 must not flip the bucket either way
    assert pick_bucket_hysteresis(3048.0, 3072) == 3072   # raw pick = 2048
    assert pick_bucket_hysteresis(3120.0, 2048) == 2048   # raw pick = 3072
    # a decisive move (>10% past the boundary) does switch
    assert pick_bucket_hysteresis(2704.0, 3072) == 2048   # < 0.9 * 3072
    assert pick_bucket_hysteresis(3400.0, 2048) == 3072   # > 1.1 * 3072
    # multi-bucket jumps still land on the raw pick
    assert pick_bucket_hysteresis(13000.0, 2048) == 12288
    assert pick_bucket_hysteresis(600.0, 8192) == 512


def test_max_s_floor_across_buckets():
    """Per-ray sample cap must not shrink as the ray bucket grows: the
    4096-ray bucket at 262144 pts/batch truncated geometry at max_s=256 and
    collapsed train PSNR (r4 full fox run, iter 5950). Reference allows
    1024 samples/ray regardless of batch (PersSampler.cu:8-9)."""
    from f2nerf_tpu.train.trainer import BUCKETS, max_s_for

    caps = [max_s_for(b, 262144) for b in BUCKETS]
    assert all(c >= 512 for c in caps), caps
    # non-increasing with bucket size, and small buckets keep the 1024 roof
    assert all(a >= b for a, b in zip(caps, caps[1:])), caps
    assert max_s_for(512, 262144) == 1024
    assert max_s_for(1024, 262144) == 1024


def test_flat_cap1_not_ceilinged_by_pts_batch():
    """cap1 must track raw marcher demand, not the point budget: the old
    2*pts_batch ceiling pinned cap1 at 524288 on fox (3072-ray bucket,
    ~175 raw samples/ray wanted vs 170.7 allowed), truncating every ray's
    far tail (train PSNR 30.9 -> 23.5, r4fix run iter 5200-5900) and
    deadlocking the demand EMA at cap1/n_rays."""
    from f2nerf_tpu.train.trainer import flat_caps

    pts_local = 262144
    # the observed failure point: demand 175/ray at the 3072 bucket
    cap1, cap2 = flat_caps(3072, 512, pts_local,
                           ema_sampled=175.0, ema_meaningful=80.0,
                           prev=None, lo=2048)
    assert cap1 >= int(1.3 * 175.0 * 3072), (cap1, cap2)  # no truncation
    assert cap1 > 2 * pts_local  # the old ceiling must be gone
    assert cap2 <= pts_local     # field budget still honors pts_batch
    # static worst case still bounds cap1
    assert cap1 <= 3072 * 512

    # saturation unsticking: with the EMA fed landed+overflow the demand
    # estimate exceeds the old cap, so the memoized pair is invalidated
    prev = (524288, 262144)
    cap1b, _ = flat_caps(3072, 512, pts_local,
                         ema_sampled=175.0, ema_meaningful=80.0,
                         prev=prev, lo=2048)
    assert cap1b > prev[0]
