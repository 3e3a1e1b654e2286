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

Design notes (TPU): the lookup is a plain XLA gather + trilerp; JAX AD
produces the scatter-add backward into the feature pool — the reference's
hand-written __half2 atomicAdd kernel (Hash3DAnchored.cu:82-155) with its
x128 static loss scaling is unnecessary in fp32/bf16. Integer hashing uses
uint32 wraparound arithmetic (well-defined in XLA).
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

    feat_pool: [pool_size, 2] f32, init U(-1e-4, 0.2e-4 - 1e-4]... matching
      (rand*0.2 - 1) * 1e-4 i.e. U[-1e-4, -0.8e-4) (Hash3DAnchored.cpp:33).
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


def _random_primes(seeds: np.ndarray) -> np.ndarray:
    """Advance each seed to the next prime (host-side, init only)."""
    def is_prime(x: int) -> bool:
        if x % 2 == 0:
            return False
        i = 3
        while i * i <= x:
            if x % i == 0:
                return False
            i += 2
        return True

    out = np.empty_like(seeds)
    for i, s in enumerate(seeds):
        v = int(s) | 1
        while not is_prime(v):
            v += 2
        out[i] = v
    return out


@partial(jax.jit, static_argnames=("log2_table_size",))
def hash_encode(feat_pool: jnp.ndarray, prim_pool: jnp.ndarray, bias_pool: jnp.ndarray,
                points01: jnp.ndarray, vol_idx: jnp.ndarray, log2_table_size: int):
    """Anchored multi-res hash lookup.

    points01: [n, 3] warp coords mapped from [-1,1] to [0,1]
      (Hash3DAnchored.cpp:93: (pts + 1) * 0.5).
    vol_idx: [n] int32 anchor (octree-leaf warp index).
    Returns [n, N_LEVELS*N_CHANNELS] f32.
    """
    n = points01.shape[0]
    lsz = jnp.uint32(local_size(log2_table_size))
    scales = jnp.asarray(level_scales())  # [L]

    pt = points01[:, None, :] * scales[None, :, None]  # [n, L, 3]
    pt = pt + bias_pool[:, vol_idx, :].transpose(1, 0, 2)  # [n, L, 3]
    prim = prim_pool[:, vol_idx, :].transpose(1, 0, 2)  # [n, L, 3] uint32

    pos = jnp.floor(pt)
    frac = pt - pos
    posi = pos.astype(jnp.int32).astype(jnp.uint32)  # wraps like CUDA uint cast of int

    # 8 corners: bit c = (dx, dy, dz)
    corner = jnp.asarray(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=jnp.uint32)
    cpos = posi[:, :, None, :] + corner[None, None, :, :]  # [n, L, 8, 3]
    h = (cpos[..., 0] * prim[:, :, None, 0]) ^ \
        (cpos[..., 1] * prim[:, :, None, 1]) ^ \
        (cpos[..., 2] * prim[:, :, None, 2])
    idx = (h % lsz).astype(jnp.int32)  # [n, L, 8]
    level_off = (jnp.arange(N_LEVELS, dtype=jnp.int32) * jnp.int32(local_size(log2_table_size)))
    idx = idx + level_off[None, :, None]

    w = jnp.where(corner[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
    w = w[..., 0] * w[..., 1] * w[..., 2]  # [n, L, 8]

    feats = feat_pool[idx]  # [n, L, 8, C]
    out = jnp.sum(feats * w[..., None], axis=2)  # [n, L, C]
    return out.reshape(n, N_LEVELS * N_CHANNELS)
