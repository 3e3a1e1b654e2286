"""Fox PSNR regression gate (VERDICT r2 #3).

Trains the real ngp_fox scene (the reference's in-repo example dataset,
reference README Run section; Dataset.cpp:16-125) for a short budget at a
pinned small ray bucket and threshold-gates the smoothed train PSNR. This is
the cheapest real-scene canary: the round-2 marcher NaN bug flatlined fox at
~8 dB while every synthetic e2e test stayed green, and a silently broken
field/kernel rewrite costs several dB here long before it shows anywhere
else.

Budget calibration (CPU, 1-core host, re-done round 5): a small tree
(bbox_levels=3, no subdivision) + 240 iters at the 512-ray bucket with
pts_batch_size=65536. pts_batch MUST satisfy the contract
``bucket_floor(512) x meaningful-demand(~110/ray) <= pts_batch`` — the
original calibration used 16384, which silently dropped ~60% of every
step's meaningful samples from the grad pass (cap2 truncation) and pinned
training at ~10 dB from the day the test was added; every e2e stat looked
healthy (finite grads, zero traversal truncation), which is exactly why
this canary now exists in a configuration that can actually learn
(verified: mse 0.145 -> 0.029 by iter 124 after the pts_batch fix, ~10 dB
-> ~14 dB and climbing; the collapse mode sits at ~8.5 dB). The silent
drop itself is now observable (overflow_b stat -> GradTrunc report flag +
flat_caps warning). On TPU the same test runs in a couple of minutes.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# same fallback chain as bench.py: repo-local copy, then the reference's
# in-repo example dataset (read-only)
FOX = next((c for c in (os.path.join(REPO, "data", "example", "ngp_fox"),
                        "/root/reference/data/example/ngp_fox")
            if os.path.isfile(os.path.join(c, "cams_meta.npy"))), "")

pytestmark = pytest.mark.skipif(
    not FOX, reason="ngp_fox example dataset not present")


def test_fox_short_train_psnr(tmp_path):
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer

    cfg = compose(os.path.join(REPO, "confs"), "wanjinyou", [
        # small, fast tree: shallow bbox, no milestones, no compaction
        "pts_sampler.bbox_levels=3",
        "pts_sampler.sub_div_milestones=[1000000]",
        "pts_sampler.compact_freq=1000000",
        # pin the smallest bucket: one compile, no controller dynamics.
        # 65536, NOT less: the 512-ray bucket floor x ~110 meaningful
        # samples/ray needs ~56k grad-pass slots; a smaller pts_batch
        # silently truncates the B buffer and training plateaus at ~10 dB
        # (see module docstring)
        "train.pts_batch_size=65536",
        "train.end_iter=240",
    ])
    tr = Trainer(cfg, str(tmp_path), FOX, seed=2022)
    assert tr.n_volumes >= 1
    tr.ema_meaningful = 128.0  # -> 512-ray bucket (65536/128)
    tr.freeze_controller()

    finite_flags = []
    for _ in range(240):
        m = tr.train_one(sync=False)  # returns None while the pipeline fills
        if m is not None:
            finite_flags.append(m["grads_finite"])
    # drain the pipeline
    m = tr.train_one(sync=True)
    finite_flags.append(m["grads_finite"])
    # the final sync drain reports only its last entry, so a few in-flight
    # steps can go unobserved — bound that loss by the pipeline depth
    assert len(finite_flags) >= 240 - tr.pipeline_depth

    # EVERY step must have finite grads: the round-3 cached-B regression
    # produced finite losses while the NaN guard silently skipped poisoned
    # updates — a last-step-only check misses intermittent poisoning.
    finite_flags = np.asarray([float(f) for f in finite_flags])
    assert (finite_flags == 1.0).all(), (
        f"non-finite gradients on fox at iters "
        f"{np.nonzero(finite_flags != 1.0)[0].tolist()[:10]}")
    assert np.isfinite(tr.psnr_smooth)
    # healthy runs reach ~17+ dB EMA here (13.8 by iter 124 on the r5
    # calibration run); the collapse modes sit at ~8.5-10 dB (marcher NaN,
    # cap2 truncation) — 15.0 splits the two populations with margin
    assert tr.psnr_smooth > 15.0, (
        f"fox train PSNR regression: {tr.psnr_smooth:.2f} dB after 240 iters")
