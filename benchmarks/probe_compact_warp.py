#!/usr/bin/env python
"""Micro-probe: decompose the compactA+warp phase cost (78 ms @ cap1=393216
in probe_step_budget) into _compact / field gathers / warp-table gathers +
transposes / warp math. Synthetic inputs shaped like the fox 2048-ray bucket.
Run alone (one TPU process)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def timed(fn, *args, warm=2, rep=10):
    import jax
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / rep


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from f2nerf_tpu.render.renderer import _compact
    from f2nerf_tpu.sampler.device import _rows, warp_jac_dir
    from f2nerf_tpu.sampler.warp import N_PROS

    R, MAX_S, CAP1, M = 2048, 512, 393216, 384
    N = R * MAX_S
    rng = np.random.default_rng(0)
    n_s = rng.integers(30, 200, R)
    pos = np.arange(MAX_S)
    valid = (pos[None, :] < n_s[:, None]).reshape(-1)
    valid_j = jnp.asarray(valid)
    t_flat = jnp.asarray(rng.random(N, np.float32))
    dt_flat = jnp.asarray(rng.random(N, np.float32))
    node_flat = jnp.asarray(rng.integers(0, 5000, N).astype(np.int32))
    w2xz = jnp.asarray(rng.standard_normal((M, 96)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((M, 36)).astype(np.float32))
    tr = jnp.asarray(rng.integers(0, M, CAP1).astype(np.int32))
    xyz = jnp.asarray(rng.standard_normal((CAP1, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((CAP1, 3)).astype(np.float32))
    rays_o = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))

    # 1. _compact alone (3 fields, like the renderer)
    f1 = jax.jit(lambda v, a, b, c: _compact(
        v, CAP1, dict(t=a, dt=b, node=c), R, max_s=MAX_S))
    log(f"_compact(1M->{CAP1}, 3 fields): "
        f"{timed(f1, valid_j, t_flat, dt_flat, node_flat) * 1e3:7.2f} ms")

    # 2. nonzero alone
    f2 = jax.jit(lambda v: jnp.nonzero(v, size=CAP1, fill_value=N)[0])
    log(f"nonzero(1M->{CAP1}):            {timed(f2, valid_j) * 1e3:7.2f} ms")

    # 3. warp-table gathers + transposes only
    f3 = jax.jit(lambda tr: (w2xz[tr].T.sum(), weight[tr].T.sum()))
    log(f"w2xz/weight gather+T @{CAP1}:   {timed(f3, tr) * 1e3:7.2f} ms")

    # 3b. gathers without transpose
    f3b = jax.jit(lambda tr: (w2xz[tr].sum(), weight[tr].sum()))
    log(f"w2xz/weight gather only:        {timed(f3b, tr) * 1e3:7.2f} ms")

    # 4. full apply_warp math (gather + transpose + 12 rational pros)
    def warp_full(tr, pts):
        m = _rows(w2xz[tr].T)
        w = _rows(weight[tr].T)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        out = [0.0, 0.0, 0.0]
        for k in range(N_PROS):
            a = m[8 * k] * x + m[8 * k + 1] * y + m[8 * k + 2] * z + m[8 * k + 3]
            b = m[8 * k + 4] * x + m[8 * k + 5] * y + m[8 * k + 6] * z + m[8 * k + 7]
            v = a / b
            for ax in range(3):
                out[ax] = out[ax] + w[12 * ax + k] * v
        return jnp.stack(out, axis=-1)

    f4 = jax.jit(warp_full)
    log(f"apply_warp math @{CAP1}:        {timed(f4, tr, xyz) * 1e3:7.2f} ms")

    # 5. warp math only (pre-gathered, no transpose): rows as [96, n]
    mT = w2xz[tr].T
    wT = weight[tr].T
    jax.block_until_ready((mT, wT))

    def warp_math(mT, wT, pts):
        m = _rows(mT)
        w = _rows(wT)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        out = [0.0, 0.0, 0.0]
        for k in range(N_PROS):
            a = m[8 * k] * x + m[8 * k + 1] * y + m[8 * k + 2] * z + m[8 * k + 3]
            b = m[8 * k + 4] * x + m[8 * k + 5] * y + m[8 * k + 6] * z + m[8 * k + 7]
            v = a / b
            for ax in range(3):
                out[ax] = out[ax] + w[12 * ax + k] * v
        return jnp.stack(out, axis=-1)

    f5 = jax.jit(warp_math)
    log(f"warp math only (pre-T inputs):  {timed(f5, mT, wT, xyz) * 1e3:7.2f} ms")

    # 6. jacobian-dir math at R*H (the march's per-hit warp cost)
    RH = 2048 * 64
    tr2 = tr[:RH]
    f6 = jax.jit(lambda tr2, x, d: warp_jac_dir(
        _rows(w2xz[tr2].T), _rows(weight[tr2].T), x, d))
    log(f"warp_jac_dir @{RH}:          "
        f"{timed(f6, tr2, xyz[:RH], dirs[:RH]) * 1e3:7.2f} ms")

    # 7. the 3 field gathers from the dense buffer
    idx = jnp.asarray(rng.integers(0, N, CAP1).astype(np.int32))
    f7 = jax.jit(lambda i: (t_flat[i].sum(), dt_flat[i].sum(), node_flat[i].sum()))
    log(f"3x [1M] gathers @{CAP1}:        {timed(f7, idx) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
