"""Unit tests for the block-anchored hash encoding (fields/hash_block.py).

Strategy (SURVEY.md §4: the reference has no tests; golden-test the math):
  * forward vs an independent per-sample numpy implementation of the same
    block-hash + trilerp semantics;
  * custom-VJP table gradient vs jax autodiff of the plain forward;
  * trilinear interpolation properties: exact at lattice points, continuous
    inside a block;
  * per-volume anchoring decorrelates features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f2nerf_tpu.fields import hash_block as hb
from f2nerf_tpu.fields.hash_encoding import N_CHANNELS, N_LEVELS, level_scales

L2T = 12  # tiny table for tests: n_blocks = 128


@pytest.fixture(scope="module")
def state():
    key = jax.random.PRNGKey(0)
    feat, prim, bias = hb.init_block_state(key, L2T, n_volumes=3)
    # make features O(1) so interpolation errors are visible
    feat = jax.random.normal(jax.random.PRNGKey(1), feat.shape)
    return feat, prim, bias


def numpy_reference(feat, prim, bias, pts01, vol, log2t):
    """Straightforward per-sample loop with the documented semantics.

    Also returns a per-(sample, level) `safe` mask that is False when any
    coordinate lands within 1e-3 of a lattice plane — there XLA's FMA
    rounding can legitimately pick the neighbouring cell and the comparison
    is meaningless."""
    nb = hb.n_blocks(log2t)
    scales = level_scales()
    out = np.zeros((len(pts01), N_LEVELS * N_CHANNELS), np.float32)
    safe = np.ones((len(pts01), N_LEVELS), bool)
    feat = np.asarray(feat)
    prim = np.asarray(prim)
    bias = np.asarray(bias)
    for i, (p, v) in enumerate(zip(np.asarray(pts01), np.asarray(vol))):
        for lvl in range(N_LEVELS):
            x = p * scales[lvl] + bias[lvl, v]
            f = np.floor(x).astype(np.int64)
            safe[i, lvl] = bool(np.min(np.abs(x - np.round(x))) > 1e-3)
            a = x - f
            b = f // 3
            c = f - 3 * b
            h = np.uint32(0)
            for ax in range(3):
                h ^= np.uint32(np.int64(b[ax]) & 0xFFFFFFFF) * np.uint32(prim[lvl, v, ax])
            row = feat[lvl, int(h & np.uint32(nb - 1))]
            acc = np.zeros(2, np.float32)
            for dx in range(2):
                for dy in range(2):
                    for dz in range(2):
                        w = ((a[0] if dx else 1 - a[0])
                             * (a[1] if dy else 1 - a[1])
                             * (a[2] if dz else 1 - a[2]))
                        lane = ((c[0] + dx) * 32 + (c[1] + dy) * 8
                                + (c[2] + dz) * 2)
                        acc += w * row[lane:lane + 2]
            out[i, 2 * lvl:2 * lvl + 2] = acc
    return out, safe


def test_forward_matches_numpy_reference(state):
    feat, prim, bias = state
    rng = np.random.RandomState(7)
    pts = rng.rand(64, 3).astype(np.float32)
    vol = rng.randint(0, 3, 64).astype(np.int32)
    got = np.asarray(hb.hash_block_encode(
        feat, prim, bias, jnp.asarray(pts), jnp.asarray(vol), L2T))
    want, safe = numpy_reference(feat, prim, bias, pts, vol, L2T)
    safe2 = np.repeat(safe, N_CHANNELS, axis=1)
    assert safe.mean() > 0.5  # the comparison actually covers most entries
    np.testing.assert_allclose(got[safe2], want[safe2], rtol=2e-3, atol=1e-3)


def test_custom_vjp_matches_autodiff(state):
    feat, prim, bias = state
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    vol = jnp.asarray(rng.randint(0, 3, 32).astype(np.int32))
    gcoef = jnp.asarray(rng.randn(32, N_LEVELS * N_CHANNELS).astype(np.float32))

    def loss_custom(ft):
        return jnp.sum(hb.hash_block_encode(ft, prim, bias, pts, vol, L2T) * gcoef)

    def loss_plain(ft):
        out, _ = hb._encode_fwd_impl(ft, prim, bias, pts, vol, L2T)
        return jnp.sum(out * gcoef)

    g1 = jax.grad(loss_custom)(feat)
    g2 = jax.grad(loss_plain)(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_exact_at_lattice_and_continuous(state):
    feat, prim, bias = state
    # zero bias so lattice positions are analytic
    bias0 = jnp.zeros_like(bias)
    scales = level_scales()
    # pick a point strictly inside a block at level 0 and nudge it
    base = np.array([[0.31, 0.52, 0.18]], np.float32)
    eps = 1e-4 / scales[-1]
    a = hb.hash_block_encode(feat, prim, bias0, jnp.asarray(base),
                             jnp.zeros(1, jnp.int32), L2T)
    b = hb.hash_block_encode(feat, prim, bias0, jnp.asarray(base + eps),
                             jnp.zeros(1, jnp.int32), L2T)
    # continuity: an eps nudge (even across cell boundaries within a block)
    # moves features by O(eps * scale)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_volumes_decorrelate(state):
    feat, prim, bias = state
    pts = jnp.asarray(np.full((4, 3), 0.4, np.float32))
    f0 = hb.hash_block_encode(feat, prim, bias, pts,
                              jnp.zeros(4, jnp.int32), L2T)
    f1 = hb.hash_block_encode(feat, prim, bias, pts,
                              jnp.ones(4, jnp.int32), L2T)
    assert float(jnp.max(jnp.abs(f0 - f1))) > 1e-3


def test_grad_only_touches_gathered_rows(state):
    feat, prim, bias = state
    pts = jnp.asarray(np.random.RandomState(0).rand(8, 3).astype(np.float32))
    vol = jnp.zeros(8, jnp.int32)

    g = jax.grad(lambda ft: jnp.sum(
        hb.hash_block_encode(ft, prim, bias, pts, vol, L2T)))(feat)
    touched = np.count_nonzero(np.any(np.asarray(g) != 0, axis=-1))
    assert 0 < touched <= 8 * N_LEVELS


def test_gather_cached_matches_direct_encode(state):
    """hash_block_gather_cached must equal hash_block_encode in value AND
    table-gradient when the cache holds the superset encoding (the
    renderer's prefilter A buffer)."""
    feat, prim, bias = state
    rng = np.random.RandomState(3)
    pts_a = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    vol_a = jnp.asarray(rng.randint(0, 2, 32).astype(np.int32))
    enc_a = hb.hash_block_encode(feat, prim, bias, pts_a, vol_a, L2T)

    idx = jnp.asarray(rng.choice(32, 12, replace=False).astype(np.int32))
    pts_b, vol_b = pts_a[idx], vol_a[idx]

    def direct(ft):
        return hb.hash_block_encode(ft, prim, bias, pts_b, vol_b, L2T)

    def cached(ft):
        return hb.hash_block_gather_cached(
            ft, prim, bias, pts_b, vol_b, L2T,
            jax.lax.stop_gradient(enc_a), idx)

    np.testing.assert_allclose(np.asarray(direct(feat)),
                               np.asarray(cached(feat)), rtol=1e-6)
    w = jnp.asarray(rng.randn(12, N_LEVELS * N_CHANNELS).astype(np.float32))
    g_direct = jax.grad(lambda ft: jnp.sum(direct(ft) * w))(feat)
    g_cached = jax.grad(lambda ft: jnp.sum(cached(ft) * w))(feat)
    np.testing.assert_allclose(np.asarray(g_direct), np.asarray(g_cached),
                               rtol=1e-5, atol=1e-7)
