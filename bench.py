#!/usr/bin/env python
"""Training-throughput benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/sec", "vs_baseline": N}

Workload: ngp_fox (the reference's in-repo example scene) under the
wanjinyou config — the reference's headline benchmark (BASELINE.md). Falls
back to the synthetic ball scene if the dataset is unavailable.

Baseline constant: the reference paper reports ~12 min for 20k iterations on
one RTX 2080Ti (~27.8 it/s); at its steady-state adaptive batch of ~13k rays
(262144 target points / ~20 meaningful samples per ray, ExpRunner.cpp:86)
that is ~3.6e5 rays/sec. The repo itself publishes no numbers (SURVEY.md §6).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_SEC = 3.6e5
_REPO = os.path.dirname(os.path.abspath(__file__))


def preflight_tpu_relay():
    """Fail fast (honest zero + rc 1) when the axon TPU relay is dead.

    The tunnel's PJRT client retries dialing forever when the relay
    process is down (observed round-3 outage: every dispatch hangs); a
    quick TCP probe beats a silent multi-hour hang. Only applies when the
    axon platform would be selected (JAX_PLATFORMS unset — the image's
    sitecustomize pins "axon,cpu" — or explicitly includes axon)."""
    import socket
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        return
    for port in (8082, 8083, 8087, 8092):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=2).close()
            return
        except OSError:
            pass
    print("bench.py: axon TPU relay unreachable (all tunnel ports refused) "
          "— the relay process died and only the external driver can "
          "restore it (see BENCHMARKS.md round-3 infrastructure note). "
          "Set JAX_PLATFORMS=cpu to benchmark on CPU.", file=sys.stderr)
    print(json.dumps({
        "metric": "ngp_fox wanjinyou training throughput",
        "value": 0.0,
        "unit": "rays/sec",
        "vs_baseline": 0.0,
        "error": "axon TPU relay down: tunnel ports connection-refused",
    }))
    sys.exit(1)


def find_dataset():
    if os.environ.get("F2_BENCH_SYNTH", "0") != "1":
        for cand in (
            os.path.join(_REPO, "data", "example", "ngp_fox"),
            "/root/reference/data/example/ngp_fox",
        ):
            if os.path.exists(os.path.join(cand, "cams_meta.npy")):
                return cand, None
    from f2nerf_tpu.utils.synthetic import write_ball_dataset, TINY_OVERRIDES
    return write_ball_dataset(tempfile.mkdtemp(prefix="f2bench_")), TINY_OVERRIDES


def main():
    preflight_tpu_relay()
    import jax
    import numpy as np
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer

    data_path, extra = find_dataset()
    workload = "ngp_fox" if extra is None else "synthetic-ball"
    cfg = compose(os.path.join(_REPO, "confs"), "wanjinyou", extra or [])
    tr = Trainer(cfg, tempfile.mkdtemp(prefix="f2bench_exp_"), data_path,
                 seed=2022)

    # Steady-state mode: resume from a real training run's checkpoint when
    # one exists (the full-budget fox run, benchmarks/run_full20k.sh), so
    # the benchmark reflects the post-milestone operating point — mature
    # occupancy culling + adaptive batch — instead of the iter-250
    # transient (VERDICT r2 #10). Opt out: F2_BENCH_CKPT=0; point at a
    # specific run: F2_BENCH_CKPT=/path/to/checkpoints/latest.
    ckpt_env = os.environ.get("F2_BENCH_CKPT", "")
    ckpt = None
    if ckpt_env not in ("0", "none") and extra is None:
        cands = [ckpt_env] if ckpt_env else []
        cands += [os.path.join(_REPO, "exp", "ngp_fox", e,
                               "checkpoints", "latest")
                  for e in ("r5full", "r4fix", "r4full", "r3full", "r2long")]
        ckpt = next((c for c in cands if c and os.path.isdir(c)), None)
    if ckpt:
        tr.load_checkpoint(ckpt)
        workload += f"@iter{tr.iter_step}"
        settle = tr.iter_step + int(os.environ.get("F2_BENCH_SETTLE", "24"))
    else:
        # Train past the init transient so the adaptive controller reaches
        # its operating bucket (early training has ~5x more samples/ray
        # than steady state). The persistent compile cache keeps the
        # bucket-walk compiles cheap on reruns. F2_BENCH_SETTLE=12 gives
        # the old quick behavior.
        settle = int(os.environ.get("F2_BENCH_SETTLE", "250"))
    while tr.iter_step < settle:
        tr.train_auto(sync=(tr.iter_step % 64 == 56))
    # pin the bucket so the timed window has no recompiles
    tr.freeze_controller()
    m = tr.train_auto()
    n_rays = m["n_rays"]

    it0 = tr.iter_step
    t0 = time.time()
    K = 40
    while tr.iter_step < it0 + K:
        tr.train_auto(sync=False)
    tr.train_auto(sync=True)
    rays = (tr.iter_step - it0) * n_rays
    dt = time.time() - t0
    rays_per_sec = rays / dt

    print(json.dumps({
        "metric": f"{workload} wanjinyou training throughput",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
