"""Block-anchored multi-resolution hash encoding — the TPU-native field.

Same capability as the reference's Hash3DAnchored (Hash3DAnchored.{h,cpp,cu}):
a 16-level anchored hash grid with per-(level, octree-volume) random prime
seeds and coordinate bias, trilinear interpolation, features feeding a small
MLP. The *data layout* is redesigned for the TPU memory system instead of the
GPU cache:

  The reference does 8 independent corner lookups per (sample, level)
  (Hash3DAnchored.cu:44-79) and relies on L2 cache hits to sustain ~4.5 G
  lookups/s. The TPU has no hardware gather: XLA row gathers cost ~300 M
  ROWS/s regardless of row width up to 128 lanes (measured,
  benchmarks/micro_gather.py). So we make every row carry a whole
  interpolation neighbourhood:

  * Space at each level is tiled into 3x3x3-cell blocks. A block row stores
    the 4x4x4 corner lattice covering its cells (+1 halo) x 2 channels
    = 128 f32 = exactly one TPU vector register row.
  * A sample needs ONE row per level (the block containing its cell, all 8
    trilerp corners included) instead of 8 row gathers: 16 gathers/sample
    total instead of 128.
  * hash = (bx*p_a ^ by*p_b ^ bz*p_c) & (n_blocks-1) on *block* coords, with
    the same per-(level, volume) random primes / bias as the reference
    (Hash3DAnchored.cpp:38-69), so octree leaves stay decorrelated.
  * Trilinear interpolation happens in lane space: three factored lane-weight
    masks (separable in x/y/z) + two channel-masked lane reductions — pure
    VPU work that XLA fuses behind the gather.
  * Backward scatters [n,128] gradient rows at ~132 M rows/s (measured) —
    no atomics, no sort.

Capacity: n_blocks = 2^log2_table_size / 32 blocks/level; distinct corner
slots/level = 64*n_blocks = 2*2^log2_table_size (corners shared by adjacent
blocks are stored per block, so parameters are ~2.4x the reference pool for
the same count of distinct cells — a bandwidth-for-capacity trade that is
free in HBM). Unlike the reference grid, corner values on block faces are
duplicated rather than shared, so the field may be slightly discontinuous
across block boundaries at each level; block phases differ per level, and
training drives both copies to consistency (quality evidence: fox CLI runs
in BENCHMARKS.md and the threshold-gated fox train-PSNR regression test in
tests/test_fox_regression.py, which falls back to the reference's in-repo
fox dataset so it runs in every environment).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hash_encoding import N_CHANNELS, N_LEVELS, _random_primes, level_scales

BLOCK_CELLS = 3   # cells covered per axis
BLOCK_LAT = 4     # stored lattice points per axis (cells + 1 halo)
LANES = BLOCK_LAT ** 3 * N_CHANNELS  # = 128

# lane layout: lane = lx*32 + ly*8 + lz*2 + ch
_LANE = np.arange(LANES)
_LANE_LX = jnp.asarray((_LANE >> 5) & 3, jnp.float32)[None, :]
_LANE_LY = jnp.asarray((_LANE >> 3) & 3, jnp.float32)[None, :]
_LANE_LZ = jnp.asarray((_LANE >> 1) & 3, jnp.float32)[None, :]
# [128, 2] channel de-interleave matrix: the per-level feature pair is an
# MXU contraction prod @ _CH_MAT instead of two masked lane reductions
_CH_MAT = jnp.asarray(np.stack([((_LANE & 1) == 0), ((_LANE & 1) == 1)],
                               axis=-1).astype(np.float32))


def n_blocks(log2_table_size: int) -> int:
    """Blocks per level: parameter count 2x the reference pool/level, distinct
    cell capacity ~0.84x (27 cells/block vs 32 entries/block-equivalent)."""
    return max(16, (1 << log2_table_size) >> 5)


def init_block_state(key: jax.Array, log2_table_size: int, n_volumes: int,
                     rand_bias: bool = True):
    """(feat_tables [N_LEVELS, n_blocks, 128] f32, prim_pool, bias_pool).

    Same init distribution and prime/bias generation as the reference
    (Hash3DAnchored.cpp:33,38-69)."""
    nb = n_blocks(log2_table_size)
    k1, k2, k3 = jax.random.split(key, 3)
    feat = (jax.random.uniform(k1, (N_LEVELS, nb, LANES)) * 0.2 - 1.0) * 1e-4
    prim = _random_primes(np.asarray(jax.random.randint(
        k2, (N_LEVELS * n_volumes * 3,), 1 << 28, 1 << 30, dtype=jnp.int32)))
    prim = jnp.asarray(prim.reshape(N_LEVELS, n_volumes, 3), dtype=jnp.uint32)
    if rand_bias:
        bias = jax.random.uniform(k3, (N_LEVELS, n_volumes, 3)) * 1000.0 + 100.0
    else:
        bias = jnp.zeros((N_LEVELS, n_volumes, 3), jnp.float32)
    return feat.astype(jnp.float32), prim, bias


def _vol_rows(prim_pool, bias_pool, vol_idx):
    """One [n, 3*N_LEVELS] gather each for primes and bias (vol_idx is
    shared across levels, so 2 row gathers replace 96 scalar gathers)."""
    nv = prim_pool.shape[1]
    prim_rows = jnp.take(
        prim_pool.astype(jnp.int32).transpose(1, 0, 2).reshape(nv, -1),
        vol_idx, axis=0)
    bias_rows = jnp.take(
        bias_pool.transpose(1, 0, 2).reshape(nv, -1), vol_idx, axis=0)
    return prim_rows, bias_rows


def _level_rows_weights(lvl_scale, prim3, bias3, points01):
    """Per-level hash row index [n] + local corner base c [n,3] int32 +
    fractional a [n,3]. All math on flat [n] vectors (lane-padding rule)."""
    xs, fs, cs, bs = [], [], [], []
    for axis in range(3):
        x = points01[:, axis] * lvl_scale + bias3[:, axis]
        f = jnp.floor(x)
        fi = f.astype(jnp.int32)
        b = fi // BLOCK_CELLS
        xs.append(x - f)                     # fractional in cell
        cs.append(fi - BLOCK_CELLS * b)      # local corner base in {0,1,2}
        bs.append(b)
    h = (bs[0].astype(jnp.uint32) * prim3[:, 0].astype(jnp.uint32)
         ^ bs[1].astype(jnp.uint32) * prim3[:, 1].astype(jnp.uint32)
         ^ bs[2].astype(jnp.uint32) * prim3[:, 2].astype(jnp.uint32))
    return h, cs, xs


def _lane_weights(cs, xs):
    """Separable trilerp lane weights w[n,128] = wx*wy*wz over the
    4x4x4x2 lane layout. Each axis factor is a tent function
    relu(1 - |lane_pos - (c + a)|): exactly (1-a) at lane c, a at lane
    c+1, 0 elsewhere — pure f32 FMA/VPU work, ~2x faster than the
    compare/select formulation (measured)."""
    w = None
    for lane_pos, c, a in zip((_LANE_LX, _LANE_LY, _LANE_LZ), cs, xs):
        t = c.astype(jnp.float32)[:, None] + a[:, None]
        wa = jnp.maximum(0.0, 1.0 - jnp.abs(lane_pos - t))
        w = wa if w is None else w * wa
    return w


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def hash_block_encode(feat_tables, prim_pool, bias_pool, points01, vol_idx,
                      log2_table_size: int):
    """Block-anchored multi-res hash lookup.

    points01: [n, 3] warp coords mapped to [0,1] (as hash_encode).
    vol_idx: [n] int32 anchor volume.
    Returns [n, N_LEVELS*N_CHANNELS] f32 (level-major pairs, matching
    hash_encode's output layout).
    """
    out, _ = _encode_fwd_impl(feat_tables, prim_pool, bias_pool, points01,
                              vol_idx, log2_table_size)
    return out


def _encode_fwd_impl(feat_tables, prim_pool, bias_pool, points01, vol_idx,
                     log2_table_size):
    nb = n_blocks(log2_table_size)
    mask = jnp.uint32(nb - 1)
    scales = level_scales()
    prim_rows, bias_rows = _vol_rows(prim_pool, bias_pool, vol_idx)

    def level(carry, inp):
        table, scale, p3, b3 = inp
        h, cs, xs = _level_rows_weights(scale, p3, b3, points01)
        # barrier: keep XLA from fusing (and re-executing) the row gather
        # into its consumers (same pathology as the warp-table gathers,
        # benchmarks/probe_compact_warp.py)
        row = jax.lax.optimization_barrier(
            jnp.take(table, (h & mask).astype(jnp.int32), axis=0))
        w = _lane_weights(cs, xs)
        f2 = jnp.dot(row * w, _CH_MAT, preferred_element_type=jnp.float32)
        return carry, f2

    prim_lv = prim_rows.reshape(-1, N_LEVELS, 3).transpose(1, 0, 2)
    bias_lv = bias_rows.reshape(-1, N_LEVELS, 3).transpose(1, 0, 2)
    _, feats = jax.lax.scan(
        level, 0, (feat_tables, jnp.asarray(scales), prim_lv, bias_lv))
    out = feats.transpose(1, 0, 2).reshape(points01.shape[0],
                                           N_LEVELS * N_CHANNELS)
    return out, (prim_rows, bias_rows)


def _hash_block_fwd(feat_tables, prim_pool, bias_pool, points01, vol_idx,
                    log2_table_size):
    out, (prim_rows, bias_rows) = _encode_fwd_impl(
        feat_tables, prim_pool, bias_pool, points01, vol_idx,
        log2_table_size)
    # tiny residuals: index math is recomputed in the backward; the gathered
    # rows are NOT saved (the table grad needs only lane weights)
    return out, (feat_tables.shape, prim_rows, bias_rows, points01)


def _hash_block_bwd(log2_table_size, res, g):
    """Table gradient only (the reference kernel likewise,
    Hash3DAnchored.cu:82-155): d_row[n,128] = (g0*ch0 + g1*ch1) * w, row
    scatter-add per level — ~132 M rows/s on v5e, no atomics needed."""
    tab_shape, prim_rows, bias_rows, points01 = res
    nb = n_blocks(log2_table_size)
    mask = jnp.uint32(nb - 1)
    scales = level_scales()
    n = points01.shape[0]
    prim_lv = prim_rows.reshape(n, N_LEVELS, 3).transpose(1, 0, 2)
    bias_lv = bias_rows.reshape(n, N_LEVELS, 3).transpose(1, 0, 2)
    g_lv = g.reshape(n, N_LEVELS, N_CHANNELS).transpose(1, 0, 2)

    def level(carry, inp):
        scale, p3, b3, gl = inp
        h, cs, xs = _level_rows_weights(scale, p3, b3, points01)
        w = _lane_weights(cs, xs)
        d_row = jnp.dot(gl, _CH_MAT.T, preferred_element_type=jnp.float32) * w
        d_tab = jnp.zeros(tab_shape[1:], jnp.float32).at[
            (h & mask).astype(jnp.int32)].add(d_row)
        return carry, d_tab

    _, d_tables = jax.lax.scan(
        level, 0, (jnp.asarray(scales), prim_lv, bias_lv, g_lv))
    return d_tables, None, None, None, None


hash_block_encode.defvjp(_hash_block_fwd, _hash_block_bwd)


# ------------------------------------------------------------------ cached B

@partial(jax.custom_vjp, nondiff_argnums=(5,))
def hash_block_gather_cached(feat_tables, prim_pool, bias_pool, points01,
                             vol_idx, log2_table_size: int,
                             cached_feat, src_idx):
    """Encode `points01` given that `cached_feat[src_idx]` already holds
    this exact encoding (computed no-grad by the prefilter pass over the
    superset A buffer; the early-stop keep set is a gather of it).

    Forward: ONE row gather from the cached [cap1, 32] features instead of
    16 hash-row gathers per sample (the forward values are bitwise the
    prefilter's). Backward: identical table-gradient scatter to
    ``hash_block_encode`` (recomputes hash indices + lane weights from the
    residuals — nothing extra is saved). The reference evaluates the field
    twice per step (no-grad early-stop pass then grad pass,
    Renderer.cpp:106-170) and pays the full lookup cost both times; caching
    is free on TPU because the A features are materialized anyway.
    """
    del feat_tables, prim_pool, bias_pool, points01, vol_idx
    return jnp.take(jax.lax.stop_gradient(cached_feat), src_idx, axis=0)


def _cached_fwd(feat_tables, prim_pool, bias_pool, points01, vol_idx,
                log2_table_size, cached_feat, src_idx):
    out = jnp.take(jax.lax.stop_gradient(cached_feat), src_idx, axis=0)
    prim_rows, bias_rows = _vol_rows(prim_pool, bias_pool, vol_idx)
    return out, (feat_tables.shape, prim_rows, bias_rows, points01)


def _cached_bwd(log2_table_size, res, g):
    d_tables = _hash_block_bwd(log2_table_size, res, g)[0]
    return d_tables, None, None, None, None, None, None


hash_block_gather_cached.defvjp(_cached_fwd, _cached_bwd)
