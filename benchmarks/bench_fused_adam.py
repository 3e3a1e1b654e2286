#!/usr/bin/env python
"""Fused Pallas Adam vs optax chain: one-step equivalence + step timing on
the REAL platform (BENCHMARKS.md TPU queue item 0).

tests/test_fused_adam.py runs the kernel in Pallas *interpret* mode on CPU,
which never exercises Mosaic codegen; this probe runs whatever platform JAX
resolves (TPU under the axon tunnel) on a wanjinyou-sized parameter tree
(feat_pool [16, 16384, 128] f32 = 33.6 M params at log2_table_size=19) and
reports:

  * max |delta| between the fused and optax parameter updates after one step
  * steady-state wall time per optimizer step for both paths (K steps inside
    one jit scan, so tunnel dispatch cost is amortized)

Usage: python benchmarks/bench_fused_adam.py [--steps 50] [--log2 19]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--log2", type=int, default=19)
    args = ap.parse_args()

    import optax
    from f2nerf_tpu.fields import hash_block as hb
    from f2nerf_tpu.fields.mlp import init_mlp
    from f2nerf_tpu.ops.fused_adam import apply_adam
    from f2nerf_tpu.train.trainer import (ADAM_KW, WEIGHT_DECAY,
                                          make_optimizer)

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    feat, _, _ = hb.init_block_state(k1, args.log2, n_volumes=64)
    params = dict(
        feat_pool=feat,
        field_mlp=init_mlp(k2, hb.N_LEVELS * hb.N_CHANNELS, 16, 64, 1),
        shader_mlp=init_mlp(k3, 16 + 25, 3, 64, 1),
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f} M (feat_pool {feat.size/1e6:.1f} M)")

    tx = make_optimizer()
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(k4, p.shape, p.dtype) * 1e-3, params)
    lr = jnp.asarray(5e-3)

    @jax.jit
    def step_optax(p, s, g):
        updates, s2 = tx.update(g, s, p)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        return optax.apply_updates(p, updates), s2

    @jax.jit
    def step_fused(p, s, g):
        return apply_adam(p, s, g, lr, weight_decay=WEIGHT_DECAY, **ADAM_KW)

    # ---- one-step numeric equivalence
    p_a, s_a = step_optax(params, opt_state, grads)
    p_b, s_b = step_fused(params, opt_state, grads)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(p_a)[0],
            jax.tree_util.tree_leaves(p_b)):
        d = float(jnp.max(jnp.abs(a - b)))
        name = "/".join(str(getattr(x, "key", x)) for x in path)
        print(f"  max|fused-optax| {name:32s} {d:.3e}")

    # ---- K-step timing inside one dispatch (lax.scan), fresh grads per
    # step derived from the key so XLA cannot fold the loop
    def run(step_fn, p, s):
        def body(carry, k):
            p, s = carry
            g = jax.tree_util.tree_map(
                lambda x: jax.random.normal(k, x.shape, x.dtype) * 1e-3, p)
            p, s = step_fn(p, s, g)
            return (p, s), ()
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
        (p, s), _ = jax.lax.scan(body, (p, s), keys)
        return p

    for name, fn in (("optax", step_optax), ("fused", step_fused)):
        runner = jax.jit(lambda p, s, fn=fn: run(fn, p, s))
        out = runner(params, opt_state)          # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = runner(params, opt_state)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{name}: {dt*1e3:.3f} ms/step "
              f"({n_params * 4 * 4 / dt / 1e9:.1f} GB/s pmvg stream)")


if __name__ == "__main__":
    main()
