"""Small fused bias-free MLPs (tiny-cuda-nn FullyFusedMLP equivalent).

The reference wraps tcnn's fp16 FullyFusedMLP (ReLU hidden, no output
activation, no biases; TCNNWP.cpp:79-100) behind a dynamic-loss-scale
autograd function. On TPU these are just bf16 matmuls with fp32 accumulation
feeding the MXU — no loss scaling needed. Widths (in 32 -> hidden 64 -> out)
map cleanly onto MXU tiles when batched over 100k+ samples.

Parameters are a list of weight matrices [d_in, d_hidden, ..., d_out] stored
fp32, cast to bf16 for the matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mlp(key: jax.Array, d_in: int, d_out: int, d_hidden: int, n_hidden_layers: int):
    """He-uniform init for ReLU nets (tcnn seeds its own variant with a fixed
    seed, TCNNWP.cpp:96-97; exact init parity is not required)."""
    dims = [d_in] + [d_hidden] * (n_hidden_layers + 1) + [d_out]
    keys = jax.random.split(key, len(dims) - 1)
    ws = []
    for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:])):
        lim = (6.0 / a) ** 0.5
        ws.append(jax.random.uniform(k, (a, b), jnp.float32, -lim, lim))
    return ws


def mlp_apply(ws, x: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    """ReLU-hidden, linear-output, bias-free forward in bf16 (fp32 accum)."""
    h = x.astype(jnp.bfloat16)
    for i, w in enumerate(ws):
        h = jnp.dot(h, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        if i + 1 < len(ws):
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    return h.astype(out_dtype)
