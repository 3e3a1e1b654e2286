"""Multi-resolution anchored hash-grid encoding.

TPU-native equivalent of Hash3DAnchored (reference Hash3DAnchored.{h,cpp,cu}):
  * N_LEVELS=16 levels, N_CHANNELS=2 features per entry, per-level grid
    resolution 2^3 .. 2^10 geometric (Hash3DAnchored.h:15-20, .cu:28).
  * One flat feature pool of (1 << log2_table_size) * N_LEVELS entries split
    evenly per level (Hash3DAnchored.cpp:71-78).
  * Per-(level, volume) random prime hash seeds in [2^28, 2^30) and optional
    random coordinate bias in [100, 1100) so each octree leaf ("anchor")
    decorrelates its hashing (Hash3DAnchored.cpp:38-69).
  * hash = (x*p_a ^ y*p_b ^ z*p_c) mod local_size, trilinear interpolation of
    the 8 corners (Hash3DAnchored.cu:44-79).

TPU performance design (this is the hottest op in the framework):
  * All index math runs on flat [n] vectors — any [n, 8, 3]-shaped
    formulation pads the minor dims to 128 lanes and wastes ~40x VPU work.
  * Corner hashes reuse three per-axis products (hash(x+1) = x*p + p), so a
    level costs 3 uint32 multiplies per sample, not 24.
  * Lookups are [n, 2] row gathers from the fp32 pool — measured the fastest
    XLA random-access path on v5e (row gathers beat packed-u32 element
    gathers ~1.7x; TPU has no hardware gather, so this op is rate-limited by
    XLA's gather lowering, which is at the hardware per-row issue floor —
    see ARCHITECTURE.md "Why the hash lookup is not a Pallas kernel").
  * custom_vjp: like the reference kernel (Hash3DAnchored.cu:82-155), the
    backward produces gradients only for the feature pool (warp coords carry
    no gradient path); residuals are just the query inputs, so no remat or
    loss scaling is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_CHANNELS = 2
N_LEVELS = 16
RES_BASE_POW_2 = 3.0
RES_FINE_POW_2 = 10.0


def level_scales() -> np.ndarray:
    """Per-level grid resolution multiplier (Hash3DAnchored.cu:28)."""
    l = np.arange(N_LEVELS, dtype=np.float32)
    return np.exp2((RES_FINE_POW_2 - RES_BASE_POW_2) * l / (N_LEVELS - 1) + RES_BASE_POW_2)


def local_size(log2_table_size: int) -> int:
    """Entries per level: pool/N_LEVELS floored to a multiple of 16
    (Hash3DAnchored.cpp:71-78)."""
    pool = (1 << log2_table_size) * N_LEVELS
    return (pool // N_LEVELS) >> 4 << 4


def init_hash_state(key: jax.Array, log2_table_size: int, n_volumes: int,
                    rand_bias: bool = True):
    """Create (feat_pool, prim_pool, bias_pool).

    feat_pool: [pool_size, 2] f32, init (rand*0.2 - 1) * 1e-4, i.e.
      U[-1e-4, -0.8e-4) (Hash3DAnchored.cpp:33).
    prim_pool: [N_LEVELS, n_volumes, 3] uint32 random primes in [2^28, 2^30).
    bias_pool: [N_LEVELS, n_volumes, 3] f32 in [100, 1100).
    """
    pool_size = (1 << log2_table_size) * N_LEVELS
    k1, k2, k3 = jax.random.split(key, 3)
    feat = (jax.random.uniform(k1, (pool_size, N_CHANNELS)) * 0.2 - 1.0) * 1e-4
    prim = _random_primes(np.asarray(jax.random.randint(
        k2, (N_LEVELS * n_volumes * 3,), 1 << 28, 1 << 30, dtype=jnp.int32)))
    prim = jnp.asarray(prim.reshape(N_LEVELS, n_volumes, 3), dtype=jnp.uint32)
    if rand_bias:
        bias = jax.random.uniform(k3, (N_LEVELS, n_volumes, 3)) * 1000.0 + 100.0
    else:
        bias = jnp.zeros((N_LEVELS, n_volumes, 3), jnp.float32)
    return feat.astype(jnp.float32), prim, bias


def _small_primes(limit: int) -> np.ndarray:
    sieve = np.ones(limit, bool)
    sieve[:2] = False
    for p in range(2, int(limit ** 0.5) + 1):
        if sieve[p]:
            sieve[p * p::p] = False
    return np.nonzero(sieve)[0].astype(np.int64)


def _random_primes(seeds: np.ndarray) -> np.ndarray:
    """Advance each seed to the next prime (vectorized; init only).

    Candidates are < 2^30, so trial division by primes <= 2^15 is exact."""
    primes = _small_primes(1 << 15)[1:]  # odd primes
    cand = (np.asarray(seeds, np.int64) | 1).copy()
    for _ in range(200):
        composite = (cand[:, None] % primes[None, :] == 0).any(axis=1)
        if not composite.any():
            break
        cand[composite] += 2
    return cand


def _corner_indices_weights(prim_pool, bias_pool, points01, vol_idx,
                            log2_table_size: int):
    """Yields (level, corner) -> (idx [n] int32, w [n] f32). Python-level
    generator, traced once per (level, corner)."""
    lsz = jnp.uint32(local_size(log2_table_size))
    scales = level_scales()
    px, py, pz = points01[:, 0], points01[:, 1], points01[:, 2]
    for lvl in range(N_LEVELS):
        off = jnp.int32(lvl * local_size(log2_table_size))
        pa = prim_pool[lvl, vol_idx, 0]
        pb = prim_pool[lvl, vol_idx, 1]
        pc = prim_pool[lvl, vol_idx, 2]
        x = px * scales[lvl] + bias_pool[lvl, vol_idx, 0]
        y = py * scales[lvl] + bias_pool[lvl, vol_idx, 1]
        z = pz * scales[lvl] + bias_pool[lvl, vol_idx, 2]
        fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
        ax, ay, az = x - fx, y - fy, z - fz
        hx0 = fx.astype(jnp.int32).astype(jnp.uint32) * pa
        hy0 = fy.astype(jnp.int32).astype(jnp.uint32) * pb
        hz0 = fz.astype(jnp.int32).astype(jnp.uint32) * pc
        hx1, hy1, hz1 = hx0 + pa, hy0 + pb, hz0 + pc
        for c in range(8):
            hx = hx1 if (c >> 2) & 1 else hx0
            hy = hy1 if (c >> 1) & 1 else hy0
            hz = hz1 if c & 1 else hz0
            idx = ((hx ^ hy ^ hz) % lsz).astype(jnp.int32) + off
            w = ((ax if (c >> 2) & 1 else 1.0 - ax)
                 * (ay if (c >> 1) & 1 else 1.0 - ay)
                 * (az if c & 1 else 1.0 - az))
            yield lvl, idx, w


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def hash_encode(feat_pool, prim_pool, bias_pool, points01, vol_idx,
                log2_table_size: int):
    """Anchored multi-res hash lookup.

    points01: [n, 3] warp coords mapped from [-1,1] to [0,1]
      (Hash3DAnchored.cpp:93: (pts + 1) * 0.5).
    vol_idx: [n] int32 anchor (octree-leaf warp index).
    Returns [n, N_LEVELS*N_CHANNELS] f32.
    """
    n = points01.shape[0]
    out = [jnp.zeros((n, N_CHANNELS), jnp.float32) for _ in range(N_LEVELS)]
    for lvl, idx, w in _corner_indices_weights(
            prim_pool, bias_pool, points01, vol_idx, log2_table_size):
        # [n, 2] row gather: measured ~1.7x faster than packed-u32 element
        # gathers on v5e (XLA's small-row gather path)
        out[lvl] = out[lvl] + feat_pool[idx] * w[:, None]
    return jnp.concatenate(out, axis=-1)


def _hash_encode_fwd(feat_pool, prim_pool, bias_pool, points01, vol_idx,
                     log2_table_size):
    out = hash_encode(feat_pool, prim_pool, bias_pool, points01, vol_idx,
                      log2_table_size)
    return out, (feat_pool.shape[0], prim_pool, bias_pool, points01, vol_idx)


def _hash_encode_bwd(log2_table_size, res, g):
    """Gradient only for the feature pool (the reference kernel likewise,
    Hash3DAnchored.cu:82-155). Row scatter-adds keyed by the recomputed
    corner indices (residuals are just the query inputs)."""
    pool_size, prim_pool, bias_pool, points01, vol_idx = res
    acc = jnp.zeros((pool_size, N_CHANNELS), jnp.float32)
    for lvl, idx, w in _corner_indices_weights(
            prim_pool, bias_pool, points01, vol_idx, log2_table_size):
        gv = g[:, 2 * lvl:2 * lvl + 2] * w[:, None]
        acc = acc.at[idx].add(gv)
    return acc, None, None, None, None


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)
