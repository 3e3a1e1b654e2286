"""Segmented (per-ray) ops over flat sample buffers.

The reference implements differentiable ragged-segment reductions as raw CUDA
kernels keyed by per-ray (start, end) index pairs (FlexOps.cu:5-215: Sum,
AccumulateSum; CustomOps.cu:12-66: WeightVar). On TPU we keep samples in a
flat fixed-capacity buffer with a per-sample ``ray_id`` (sorted, padding rows
carry ray_id == n_rays) and express everything with segment reductions and a
segmented scan — all natively differentiable, so no custom backward kernels
are needed.

Numerical note: the segmented cumsum is a `lax.associative_scan` over
(value, reset-flag) pairs, so partial sums never mix across segments —
matching the per-ray accuracy of the reference's per-thread loops (a plain
global cumsum would lose precision over a 262k-sample buffer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(x: jnp.ndarray, ray_id: jnp.ndarray, n_rays: int) -> jnp.ndarray:
    """Per-ray sum. x: [cap] or [cap, c]; returns [n_rays] or [n_rays, c].

    Equivalent of FlexOps::Sum (FlexOps.cu; scalar + vector variants).
    Padding samples must have ray_id == n_rays (dropped).
    """
    return jax.ops.segment_sum(x, ray_id, num_segments=n_rays + 1,
                               indices_are_sorted=True)[:n_rays]


def segment_max(x: jnp.ndarray, ray_id: jnp.ndarray, n_rays: int) -> jnp.ndarray:
    return jax.ops.segment_max(x, ray_id, num_segments=n_rays + 1,
                               indices_are_sorted=True)[:n_rays]


def segment_cumsum(x: jnp.ndarray, is_first: jnp.ndarray, exclusive: bool = True) -> jnp.ndarray:
    """Segmented prefix sum along a flat buffer.

    ``is_first`` marks the first sample of each segment (bool [cap]).
    Equivalent of FlexOps::AccumulateSum (FlexOps.cu:75-215) on the ragged
    layout. Implemented as an associative scan over (value, flag) pairs:
      (a1,f1) * (a2,f2) = (a2 + a1*(1-f2), f1|f2)
    """
    flag = is_first.astype(x.dtype)

    def op(c1, c2):
        a1, f1 = c1
        a2, f2 = c2
        return (a2 + a1 * (1.0 - f2), jnp.minimum(f1 + f2, 1.0))

    inclusive, _ = jax.lax.associative_scan(op, (x, flag))
    if exclusive:
        return inclusive - x
    return inclusive


def first_flags_from_ray_id(ray_id: jnp.ndarray, n_rays: int) -> jnp.ndarray:
    """is_first[k] = sample k starts a new segment (ray_id changes at k)."""
    prev = jnp.concatenate([jnp.full((1,), -1, ray_id.dtype), ray_id[:-1]])
    return jnp.logical_and(ray_id != prev, ray_id < n_rays)


def local_index(ray_id: jnp.ndarray, n_rays: int) -> jnp.ndarray:
    """Index of each sample within its ray (0-based), int32."""
    is_first = first_flags_from_ray_id(ray_id, n_rays)
    ones = jnp.ones_like(ray_id, dtype=jnp.float32)
    return segment_cumsum(ones, is_first, exclusive=True).astype(jnp.int32)
