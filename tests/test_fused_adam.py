"""Fused Pallas Adam (ops/fused_adam.py) vs the production optax chain.

The fused path must be numerically identical (same math, same order) and
keep the optax state structure so checkpoints interoperate. Runs the
kernel in Pallas interpret mode on CPU — same code path as TPU modulo
Mosaic codegen.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from f2nerf_tpu.ops.fused_adam import apply_adam
from f2nerf_tpu.train.trainer import ADAM_KW, WEIGHT_DECAY, make_optimizer


def small_tree(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return dict(
        feat_pool=jax.random.normal(k1, (16, 32, 128)) * 1e-2,
        field_mlp=dict(w0=jax.random.normal(k2, (32, 64)),
                       w1=jax.random.normal(k3, (64, 16))),
        app_emb=jax.random.normal(k4, (7, 16)) * 0.1,
    )


def rand_like(tree, key):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) * 1e-3
                  for k, l in zip(keys, leaves)])


@pytest.mark.parametrize("steps", [3])
def test_fused_matches_optax_chain(steps):
    tx = make_optimizer()
    params_a = small_tree(jax.random.PRNGKey(0))
    params_b = jax.tree_util.tree_map(jnp.copy, params_a)
    st_a = tx.init(params_a)
    st_b = jax.tree_util.tree_map(jnp.copy, st_a)
    lr = 1e-2

    for i in range(steps):
        grads = rand_like(params_a, jax.random.PRNGKey(100 + i))
        # production optax path (trainer.make_core do_update)
        updates, st_a = tx.update(grads, st_a, params_a)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params_a = optax.apply_updates(params_a, updates)
        # fused path
        params_b, st_b = apply_adam(params_b, st_b, grads, lr,
                                    weight_decay=WEIGHT_DECAY, **ADAM_KW)

    for pa, pb in zip(jax.tree_util.tree_leaves(params_a),
                      jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    # state structure identical (checkpoint interop)
    assert (jax.tree_util.tree_structure(st_a)
            == jax.tree_util.tree_structure(st_b))
    assert int(st_b[1].count) == steps
    for ma, mb in zip(jax.tree_util.tree_leaves(st_a[1].mu),
                      jax.tree_util.tree_leaves(st_b[1].mu)):
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb),
                                   rtol=1e-6, atol=1e-9)


def test_fused_under_jit_with_donation():
    """The trainer calls this inside a donated jit under lax.cond."""
    tx = make_optimizer()
    params = small_tree(jax.random.PRNGKey(1))
    st = tx.init(params)
    grads = rand_like(params, jax.random.PRNGKey(2))

    @jax.jit
    def step(p, s, g, finite):
        return jax.lax.cond(
            finite,
            lambda _: apply_adam(p, s, g, 1e-2,
                                 weight_decay=WEIGHT_DECAY, **ADAM_KW),
            lambda _: (p, s),
            None)

    p2, s2 = step(params, st, grads, jnp.asarray(True))
    assert int(s2[1].count) == 1
    # skipped branch leaves everything untouched
    p3, s3 = step(params, st, grads, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(p3["feat_pool"]),
                                  np.asarray(params["feat_pool"]))
    assert int(s3[1].count) == 0
    # decay hit the MLP but not the pool: pool update must be pure-adam
    g0 = grads["feat_pool"]
    m = (1 - ADAM_KW["b1"]) * g0
    v = (1 - ADAM_KW["b2"]) * g0 * g0
    mhat = m / (1 - ADAM_KW["b1"])
    vhat = v / (1 - ADAM_KW["b2"])
    expect = params["feat_pool"] - 1e-2 * mhat / (jnp.sqrt(vhat)
                                                  + ADAM_KW["eps"])
    np.testing.assert_allclose(np.asarray(p2["feat_pool"]),
                               np.asarray(expect), rtol=1e-6, atol=1e-8)
