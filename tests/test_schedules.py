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
    # a decisive move (>5% past the boundary) does switch
    assert pick_bucket_hysteresis(2888.0, 3072) == 2048   # < 0.95 * 3072
    assert pick_bucket_hysteresis(3280.0, 2048) == 3072   # > 1.05 * 3072
    # the fox steady state (want ~13107 from meaningful ~20/ray) must reach
    # the 12288 bucket from below — the old 10% band pinned it at 8192
    assert pick_bucket_hysteresis(13107.0, 8192) == 12288
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


def test_flat_cap1_abs_ceiling_calibration():
    """ADVICE r4 (cap1 unbounded) + the r5 fox-240 regression an 8x default
    caused: the absolute ceiling must NEVER bind below the 16384-ray bucket
    (pre-ceiling behavior preserved — with max_s floored at 512,
    n_rays*max_s == 16*pts_local exactly at 16384 rays on the shrunk test
    budget), yet still bound the 32768-ray worst case."""
    from f2nerf_tpu.train.trainer import flat_caps

    # fox-240 gate operating point: pts_batch 16384, 512 rays, early
    # fineness demand ~500/ray -> the natural n_rays*max_s bound, not the
    # absolute ceiling, must clip (8x would have halved the buffer here)
    cap1, _ = flat_caps(512, 512, 16384, ema_sampled=512.0,
                        ema_meaningful=400.0, prev=None, lo=2048)
    assert cap1 == 512 * 512, cap1

    # 32768-ray pathological demand: bounded by 16x pts_batch (4.2M), not
    # the unbounded 16.7M static worst case
    cap1b, _ = flat_caps(32768, 512, 262144, ema_sampled=512.0,
                         ema_meaningful=100.0, prev=None, lo=2048)
    assert cap1b == 16 * 262144, cap1b


def test_flat_caps_warns_on_unmeetable_pts_batch(capsys):
    """r5 root-cause regression: 512-ray bucket floor x ~110 meaningful/ray
    vs pts_batch 16384 drops ~60% of grad-pass samples — the silent mode
    that pinned the fox-240 canary at ~10 dB for three rounds. The rebuild
    path must now say so."""
    from f2nerf_tpu.train.trainer import flat_caps

    flat_caps(512, 512, 16384, ema_sampled=115.0, ema_meaningful=110.0,
              prev=None, lo=2048)
    out = capsys.readouterr().out
    assert "Raise train.pts_batch_size" in out, out

    # the healthy contract (controller-sized bucket, demand ~ pts_batch
    # with the designed <=25% transition overshoot) stays quiet
    flat_caps(8192, 512, 262144, ema_sampled=70.0, ema_meaningful=30.0,
              prev=None, lo=2048)
    assert "Raise train.pts_batch_size" not in capsys.readouterr().out


def test_controller_20k_trajectory_no_deadlock():
    """VERDICT r4 #6: walk the adaptive controller through a synthetic but
    fox-shaped 20k trajectory (fineness decay, culling convergence, 5
    subdivision milestones) and assert the three r4 incident mechanisms
    stay dead:
      (a) per-ray sample cap collapse (max_s below marcher demand ->
          sustained saturation),
      (b) flat-cap ceiling deadlock (demand EMA pinned at cap1/n_rays ->
          sustained dense-buffer overflow),
      (c) hit-buffer truncation thrash (TravTrunc-driven doubling mid-run
          while training is degraded),
    plus global sanity: bounded recompile count and the steady-state
    bucket actually reached (no pin at a small bucket).

    Uses a bare Trainer (no dataset/tree) so the REAL _ingest_aux /
    cur_batch_size / _caps composition is exercised; only the device step
    and milestone tree rebuild are simulated.
    """
    from f2nerf_tpu.train import schedules
    from f2nerf_tpu.train.trainer import (Trainer, grow_hit_cap, max_s_for,
                                          pow2ceil)
    from f2nerf_tpu.utils.config import compose

    cfg = compose("confs", "wanjinyou",
                  ["dataset_name=example", "case_name=x"])
    tcfg = cfg["train"]
    end_iter = int(tcfg["end_iter"])
    pts_batch = int(tcfg["pts_batch_size"])
    milestones = sorted(int(m) for m in cfg["pts_sampler"]["sub_div_milestones"])

    tr = Trainer.__new__(Trainer)      # controller state only
    tr.cfg = cfg
    tr.pts_batch = pts_batch
    tr.n_shards = 1
    tr.controller_frozen = False
    tr._cur_bucket = None
    tr._cap_memo = {}
    tr.ema_sampled = 512.0
    tr.ema_meaningful = 512.0
    tr.ema_oct = 16.0
    tr.oct_max = 0.0
    tr.trunc_ema = 0.0
    tr.sat_ema = 0.0
    tr.psnr_smooth = -1.0
    tr.mse_records = []
    tr.hit_cap_limit = int(cfg["pts_sampler"]["max_oct_intersect_per_ray"])
    tr.hit_cap = min(64, tr.hit_cap_limit)

    def scene(i):
        """Synthetic demand model shaped like the fox logs: raw samples/ray
        track fineness; culling converges meaningful/ray toward ~20; octree
        hits/ray double at each milestone (leaf sides halve)."""
        fin = schedules.ray_march_fineness(i, tcfg)
        # sublinear in fineness (calibrated to the r4 fox logs: Samples EMA
        # ~500 at init fineness 16, ~110 at fineness 1)
        s_raw = 110.0 * fin ** 0.55
        cull = 0.18 + 0.82 * math.exp(-i / 2500.0)
        meaningful = max(20.0, s_raw * cull)
        n_mile = sum(1 for m in milestones if m <= i)
        oct_mean = 16.0 * (2.0 ** n_mile) * (0.75 ** max(n_mile - 2, 0))
        # worst ray ~4x the mean (within the reference's 1024 contract,
        # PersSampler.cu:9 — fox never overflows it)
        oct_max = min(4.0 * oct_mean, 1000.0)
        return s_raw, meaningful, oct_mean, oct_max

    jit_keys = set()
    overflow_run = sat_run = trunc_run = 0
    max_overflow_run = max_sat_run = max_trunc_run = 0
    mile_idx = 0
    for i in range(end_iter):
        # milestone boundary: the Trainer's maybe_maintain_tree hit-cap
        # pre-sizing (subdivision ~doubles worst-case hits/ray)
        if mile_idx < len(milestones) and milestones[mile_idx] <= i:
            mile_idx += 1
            want = pow2ceil(2.0 * max(tr.oct_max, 1.0))
            tr.hit_cap = min(max(tr.hit_cap, want), tr.hit_cap_limit)
            tr.oct_max = tr.oct_max * 0.5

        n_rays = tr.cur_batch_size()
        max_s = max_s_for(n_rays, pts_batch)
        cap1, cap2 = tr._caps(n_rays, max_s)
        tr.hit_cap = grow_hit_cap(tr.hit_cap, tr.hit_cap_limit, tr.ema_oct)
        jit_keys.add((n_rays, cap1, cap2, tr.hit_cap))

        s_raw, meaningful, oct_mean, oct_max_true = scene(i)
        # simulated device step: dense per-ray cap then flat caps
        per_ray = min(s_raw, max_s)
        sat = 1.0 if s_raw > max_s else 0.0
        landed = min(per_ray * n_rays, cap1)
        overflow = per_ray * n_rays - landed
        n_meaningful = min(meaningful, per_ray) * n_rays
        trunc_rays = float(oct_max_true > tr.hit_cap)
        stats = dict(n_sampled=landed, n_meaningful=n_meaningful,
                     n_oct_hits=oct_mean * n_rays, overflow_a=overflow,
                     n_saturated=sat * n_rays,
                     n_trav_truncated=trunc_rays,
                     max_oct_hits=min(oct_max_true, tr.hit_cap))
        tr._ingest_aux(n_rays, dict(stats=stats, mse=0.01))

        overflow_run = overflow_run + 1 if overflow > 0 else 0
        sat_run = sat_run + 1 if sat > 0 else 0
        trunc_run = trunc_run + 1 if trunc_rays > 0 else 0
        max_overflow_run = max(max_overflow_run, overflow_run)
        max_sat_run = max(max_sat_run, sat_run)
        max_trunc_run = max(max_trunc_run, trunc_run)

    # (a) the dense per-ray cap never saturates (max_s >= marcher demand)
    assert max_sat_run == 0, f"max_s saturation for {max_sat_run} iters"
    # (b) dense-buffer overflow self-heals within one controller reaction
    # (~EMA horizon), never deadlocks at a ceiling
    assert max_overflow_run < 50, \
        f"cap1 overflow persisted {max_overflow_run} iters (deadlock)"
    # (c) hit-buffer truncation is transient (pre-sizing + doubling react)
    assert max_trunc_run < 30, \
        f"hit truncation persisted {max_trunc_run} iters"
    # bounded recompiles: each key is a 30-45s step compile via the tunnel
    assert len(jit_keys) <= 30, f"{len(jit_keys)} jit keys: {sorted(jit_keys)}"
    # steady state reached: meaningful/ray -> ~20 must put the controller
    # in the >= 12288 bucket (262144 / 20 = 13107), not pinned low
    assert tr._cur_bucket >= 12288, f"pinned at bucket {tr._cur_bucket}"
