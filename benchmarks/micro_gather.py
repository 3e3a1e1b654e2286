"""Microbenchmarks for the round-2 hash-grid kernel design space on TPU v5e.

Methodology (see BENCHMARKS.md): timing through the axon tunnel lies unless
all repetition happens inside one jitted fori_loop with every output
consumed. Each case reports rows/s from the in-jit loop.

Run:  python benchmarks/micro_gather.py [case ...]
Cases run sequentially in-process; pass names to select a subset.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 32


def _time_rows(fn, args, n_rows, iters=ITERS, warm=True):
    """fn(salt, *args, iters=) -> scalar checksum; returns (rows/s, s/iter).

    The tunnel caches identical repeat calls, so every call gets a fresh
    `salt` scalar that the case must fold into its index math.
    """
    f = jax.jit(partial(fn, iters=iters))
    float(f(jnp.int32(1), *args))  # compile + warm; forced host fetch
    t0 = time.perf_counter()
    # block_until_ready lies through the axon tunnel; float() cannot
    float(f(jnp.int32(2), *args))
    dt = time.perf_counter() - t0
    per = dt / iters
    return n_rows / per, per


def gather_case(n, t, w, dtype=jnp.float32):
    table = jnp.asarray(np.random.randn(t, w), dtype)
    idx = jnp.asarray(np.random.randint(0, t, n), jnp.int32)

    def fn(salt, table, idx, iters):
        def body(i, acc):
            ix = (idx + (i + salt) * 7919) % t
            g = jnp.take(table, ix, axis=0)
            return acc + g.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return fn, (table, idx), n


def scatter_case(n, t, w, dtype=jnp.float32):
    vals = jnp.asarray(np.random.randn(n, w), dtype)
    idx = jnp.asarray(np.random.randint(0, t, n), jnp.int32)

    def fn(salt, vals, idx, iters):
        def body(i, acc):
            ix = (idx + (i + salt) * 7919) % t
            tab = jnp.zeros((t, w), vals.dtype).at[ix].add(vals)
            return acc + tab.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return fn, (vals, idx), n


def argsort_case(n):
    idx = jnp.asarray(np.random.randint(0, 1 << 19, n), jnp.int32)

    def fn(salt, idx, iters):
        def body(i, acc):
            perm = jnp.argsort(idx ^ (i + salt))
            return acc + perm[::4096].sum()
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
    return fn, (idx,), n


def sort_segsum_case(n, t, w):
    """Full scatter-free backward candidate: argsort keys, permute payload
    rows, segment-sum equal keys, then one gather per table row."""
    vals = jnp.asarray(np.random.randn(n, w), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, t, n), jnp.int32)

    def fn(salt, vals, idx, iters):
        def body(i, acc):
            keys = (idx + (i + salt) * 7919) % t
            order = jnp.argsort(keys)
            sk = keys[order]
            sv = jnp.take(vals, order, axis=0)
            # inclusive segment-sum via cumsum trick
            csum = jnp.cumsum(sv, axis=0)
            # for each table row, its segment end = searchsorted(sk, row, 'right')-1
            ends = jnp.searchsorted(sk, jnp.arange(t), side="right") - 1
            starts = jnp.searchsorted(sk, jnp.arange(t), side="left") - 1
            tot = jnp.take(csum, jnp.maximum(ends, 0), axis=0)
            base = jnp.where((starts >= 0)[:, None],
                             jnp.take(csum, jnp.maximum(starts, 0), axis=0), 0.0)
            has = (ends > starts)[:, None]
            tab = jnp.where(has, tot - base, 0.0)
            return acc + tab.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return fn, (vals, idx), n


def pallas_gather_case(n, t, unroll=1):
    """The hypothetical Pallas hash-lookup inner loop: table resident in
    VMEM (8 MiB at t=16384, w=128 — fits), one dynamic row load per sample
    inside a fori_loop. v5e has no vector-lane row gather, so per-row
    serial loads are the ONLY Pallas formulation; this measures whether
    they beat XLA's gather lowering (~300 M rows/s). See ARCHITECTURE.md
    "Why the hash lookup is not a Pallas kernel"."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, CHUNK = 128, 2048
    table = jnp.asarray(np.random.randn(t, W), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, t, n), jnp.int32)

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, c):
            out_ref[i, :] = table_ref[idx_ref[i, 0], :]
            return c
        jax.lax.fori_loop(0, CHUNK, body, 0, unroll=unroll)

    def gather(table, ix2):
        return pl.pallas_call(
            kernel,
            grid=(n // CHUNK,),
            in_specs=[pl.BlockSpec((CHUNK, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((t, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(ix2, table)

    def fn(salt, table, idx, iters):
        def body(i, acc):
            ix = ((idx + (i + salt) * 7919) % t).reshape(-1, 1)
            return acc + gather(table, ix).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return fn, (table, idx), n


CASES = {}


def reg(name, builder):
    CASES[name] = builder


# forward-gather design space: rows/s vs row width and dtype
reg("gather_f32_w2",    lambda: gather_case(1 << 20, 1 << 19, 2))
reg("gather_f32_w16",   lambda: gather_case(1 << 20, 1 << 16, 16))
reg("gather_f32_w128",  lambda: gather_case(1 << 20, 1 << 14, 128))
reg("gather_f32_w128_big", lambda: gather_case(1 << 22, 1 << 14, 128))
reg("gather_bf16_w128", lambda: gather_case(1 << 20, 1 << 14, 128, jnp.bfloat16))
reg("gather_f32_w128_bigtab", lambda: gather_case(1 << 20, 1 << 18, 128))
# row-width scaling past one vreg: if 256/512-lane rows gather at the same
# ROW rate, multi-row layouts halve/quarter the gather count per sample
reg("gather_f32_w256",  lambda: gather_case(1 << 20, 1 << 13, 256))
reg("gather_f32_w512",  lambda: gather_case(1 << 20, 1 << 12, 512))
reg("scatter_f32_w256", lambda: scatter_case(1 << 20, 1 << 13, 256))
# the Pallas counter-kernel (serial VMEM row loads; see builder docstring)
reg("pallas_gather_w128", lambda: pallas_gather_case(1 << 20, 1 << 14))
reg("pallas_gather_w128_u8",
    lambda: pallas_gather_case(1 << 20, 1 << 14, unroll=8))
# backward-scatter design space
reg("scatter_f32_w2",   lambda: scatter_case(1 << 20, 1 << 19, 2))
reg("scatter_f32_w128", lambda: scatter_case(1 << 20, 1 << 14, 128))
reg("scatter_f32_w128_small", lambda: scatter_case(1 << 18, 1 << 14, 128))
# sort-based scatter-free backward
reg("argsort_4m",       lambda: argsort_case(1 << 22))
reg("argsort_1m",       lambda: argsort_case(1 << 20))
reg("sort_segsum_w128", lambda: sort_segsum_case(1 << 20, 1 << 14, 128))


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        fn, args, n = CASES[name]()
        try:
            rate, per = _time_rows(fn, args, n)
            print(f"{name:28s} {rate/1e6:10.1f} M rows/s   {per*1e3:8.2f} ms/iter  (n={n})")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
