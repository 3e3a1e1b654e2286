"""Custom activations / gradient shaping ops.

TPU-native equivalents of the reference's custom autograd ops:
  * trunc_exp — exp forward, backward clamps the input to [-100, 5]
    (reference CustomOps.cpp:9-18). Used as the density activation with a
    shift of 3 (Renderer.cpp:102-105: density = trunc_exp(x - 3)).
  * gradient_scaling — identity forward; backward multiplies per-sample
    gradients by ``progress + (1 - progress) * a^2`` where ``a`` is the
    sample's normalized position along its ray (reference CustomOps.cu:68-80,
    127-166; cf. "Floaters No More"). Suppresses near-camera gradients early
    in training.
  * weight_var — per-ray variance of the sample-weight distribution over
    normalized positions i/16 (reference CustomOps.cu:12-66). Expressed in
    plain differentiable jnp segment ops; JAX AD reproduces the reference's
    analytic backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .segment import segment_sum

_WEIGHT_VAR_SCALE = 16.0  # reference CustomOps.cu:8 (SCALE)


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -100.0, 5.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def density_activation(raw):
    """density = trunc_exp(raw - 3) (reference Renderer.cpp:102-105)."""
    return trunc_exp(raw - 3.0)


@jax.custom_vjp
def gradient_scaling(x, a_norm, progress):
    """Identity fwd; bwd scales grad by progress + (1-progress)*a_norm^2.

    ``a_norm``: [cap] normalized position (i_local + 0.5) / count_of_ray,
    broadcast over trailing dims of x. ``progress`` in [0, 1]; at 1 this is
    a no-op (the reference skips the op entirely then, Renderer.cpp:190-195).
    """
    return x


def _gs_fwd(x, a_norm, progress):
    return x, (a_norm, progress)


def _gs_bwd(res, g):
    a_norm, progress = res
    scale = progress + (1.0 - progress) * a_norm * a_norm
    scale = scale.reshape(scale.shape + (1,) * (g.ndim - scale.ndim))
    return (g * scale, None, None)


gradient_scaling.defvjp(_gs_fwd, _gs_bwd)


def weight_var(weights, ray_id, i_local, n_rays):
    """Per-ray weight-distribution variance (reference CustomOps.cu:12-35).

    mean = sum_i w_i * (i/16) / (1e-6 + sum_i w_i)
    var  = sum_i w_i * (i/16 - mean)^2
    """
    pos = i_local.astype(jnp.float32) / _WEIGHT_VAR_SCALE
    w_sum = segment_sum(weights, ray_id, n_rays) + 1e-6
    wpos_sum = segment_sum(weights * pos, ray_id, n_rays)
    mean = wpos_sum / w_sum
    bias = pos - mean[ray_id.clip(0, n_rays - 1)]
    bias = jnp.where(ray_id < n_rays, bias, 0.0)
    return segment_sum(weights * bias * bias, ray_id, n_rays)
