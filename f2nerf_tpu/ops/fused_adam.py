"""Fused Adam(+weight-decay) update as a Pallas TPU kernel.

The reference drives three independent torch Adam instances
(Hash3DAnchored.cpp:124-150, SHShader.cpp:44-56, Renderer.cpp:238-258);
each torch step launches separate read/modify/write passes for the moment
buffers and the parameters. Here the whole update for a tensor is ONE
Pallas kernel: one streaming pass over (p, m, v, g) that writes (p', m',
v') in place (``input_output_aliases``), so the hash feature pool — 33.5M
params at wanjinyou scale, by far the largest state — costs exactly its
minimal HBM traffic and a single kernel launch instead of the optax chain
(decay -> moments -> bias correction -> scale -> apply) that XLA only
partially fuses across ``lax.cond`` boundaries.

Semantics are bit-identical to the production optax chain in
trainer.make_optimizer():

    g'   = g + wd * p                      (torch-style coupled decay;
                                            wd = 0 for the feature pool)
    m    = b1 * m + (1 - b1) * g'
    v    = b2 * v + (1 - b2) * g'^2
    p'   = p - lr * (m / (1 - b1^t)) / (sqrt(v / (1 - b2^t)) + eps)

Access is fully regular (row-major streaming), which is exactly where a
Pallas kernel beats generic XLA on TPU; the irregular ops of this
framework (hash row gather/scatter) stay in XLA because v5e has no
vector-lane row gather — see ARCHITECTURE.md "Why the hash lookup is not
a Pallas kernel" and benchmarks/micro_gather.py (pallas_gather_case) for the measured
proof.

Runs in interpreter mode automatically off-TPU so the CPU test suite
exercises the same kernel code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row chunk per grid step: 512 x 128 f32 = 256 KiB/buffer; 7 live buffers
# (4 in + 3 out) x double buffering ~ 3.5 MiB VMEM
_BLK = 512
_LANES = 128


@functools.cache
def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _adam_kernel(b1: float, b2: float, eps: float, wd: float,
                 lr_ref, c1_ref, c2_ref,
                 p_ref, m_ref, v_ref, g_ref,
                 po_ref, mo_ref, vo_ref):
    g = g_ref[...]
    p = p_ref[...]
    if wd:
        g = g + wd * p
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * (g * g)
    # c1/c2 are the precomputed 1/(1 - beta^t) bias corrections
    u = (m * c1_ref[0, 0]) / (jnp.sqrt(v * c2_ref[0, 0]) + eps)
    po_ref[...] = p - lr_ref[0, 0] * u
    mo_ref[...] = m
    vo_ref[...] = v


def adam_rows(p, m, v, g, lr, c1, c2, *, b1: float, b2: float, eps: float,
              wd: float = 0.0):
    """One fused Adam step over [rows, 128] f32 tensors.

    lr/c1/c2: [1, 1] f32 device scalars (runtime — no recompile per step).
    Returns (p', m', v'); inputs p/m/v are aliased to the outputs, so pass
    donated buffers for a true in-place update.
    """
    rows = p.shape[0]
    assert p.shape == (rows, _LANES) and rows % _BLK == 0, p.shape
    blk = pl.BlockSpec((_BLK, _LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_adam_kernel, b1, b2, eps, wd),
        grid=(rows // _BLK,),
        in_specs=[smem, smem, smem, blk, blk, blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=(jax.ShapeDtypeStruct(p.shape, jnp.float32),) * 3,
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=_interpret(),
    )(lr, c1, c2, p, m, v, g)


def _leaf_is_pool(path) -> bool:
    return bool(path) and getattr(path[0], "key", None) == "feat_pool"


def apply_adam(params, opt_state, grads, lr, *, b1: float, b2: float,
               eps: float, weight_decay: float):
    """Drop-in fused replacement for ``tx.update`` + ``optax.apply_updates``
    of trainer.make_optimizer()'s chain (masked decay + scale_by_adam).

    ``opt_state`` keeps the exact optax chain structure — (MaskedState,
    ScaleByAdamState) — so checkpoints are interchangeable between the
    fused and optax paths. The feature pool (no decay, [*, 128] f32, the
    only tensor of consequence) takes the Pallas kernel; every other leaf
    is a few KB and stays in plain jnp, which XLA fuses on its own.
    """
    import optax

    masked_st, adam_st = opt_state
    count = optax.safe_int32_increment(adam_st.count)
    cf = count.astype(jnp.float32)
    c1 = (1.0 / (1.0 - b1 ** cf)).reshape(1, 1)
    c2 = (1.0 / (1.0 - b2 ** cf)).reshape(1, 1)
    lr2 = jnp.asarray(lr, jnp.float32).reshape(1, 1)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(adam_st.mu)
    flat_v = jax.tree_util.tree_leaves(adam_st.nu)
    treedef = jax.tree_util.tree_structure(params)

    new_p, new_m, new_v = [], [], []
    for (path, p), g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        if _leaf_is_pool(path) and p.size % (_BLK * _LANES) == 0:
            shape = p.shape
            p2, m2, v2 = adam_rows(
                p.reshape(-1, _LANES), m.reshape(-1, _LANES),
                v.reshape(-1, _LANES), g.reshape(-1, _LANES),
                lr2, c1, c2, b1=b1, b2=b2, eps=eps, wd=0.0)
            new_p.append(p2.reshape(shape))
            new_m.append(m2.reshape(shape))
            new_v.append(v2.reshape(shape))
        else:
            wd = 0.0 if _leaf_is_pool(path) else weight_decay
            g = g + wd * p
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * (g * g)
            u = (m * c1[0, 0]) / (jnp.sqrt(v * c2[0, 0]) + eps)
            new_p.append(p - lr2[0, 0] * u)
            new_m.append(m)
            new_v.append(v)

    new_params = jax.tree_util.tree_unflatten(treedef, new_p)
    new_adam = optax.ScaleByAdamState(
        count=count,
        mu=jax.tree_util.tree_unflatten(treedef, new_m),
        nu=jax.tree_util.tree_unflatten(treedef, new_v))
    return new_params, (masked_st, new_adam)
