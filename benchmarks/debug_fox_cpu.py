#!/usr/bin/env python
"""CPU bisect harness: trains fox for N iters at a pinned small bucket and
prints per-iter psnr/meaningful so field-collapse bugs reproduce in minutes
without the TPU tunnel. Usage: debug_fox_cpu.py [iters] [override ...]"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import tempfile
    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    overrides = sys.argv[2:]
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou",
                  ["train.pts_batch_size=16384"] + overrides)
    tr = Trainer(cfg, tempfile.mkdtemp(prefix="f2dbg_"), data, seed=2022)
    log(f"init done n_nodes={tr.tree_host.n_nodes} n_trans={tr.n_volumes}")
    # pin the smallest bucket: no controller dynamics, one compile
    tr.ema_meaningful = 32.0
    tr.freeze_controller()
    for i in range(iters):
        m = tr.train_one(sync=True)
        if i < 10 or i % 10 == 0:
            log(f"it {i:4d} psnr={m['psnr']:5.2f} loss={m['loss']:.4f} "
                f"sampled={m['n_sampled'] / m['n_rays']:6.1f} "
                f"meaningful={m['n_meaningful'] / m['n_rays']:6.1f} "
                f"oct={m['n_oct_hits'] / m['n_rays']:5.1f} "
                f"finite={m['grads_finite']:.0f} "
                f"trunc={m['n_trav_truncated']:.0f}")


if __name__ == "__main__":
    main()
