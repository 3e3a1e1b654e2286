"""Unit tests: camera math, segment ops, activations, hash encoding, SH.

Golden values checked against independent numpy implementations of the
reference formulas (reference file:line cited in each module's docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f2nerf_tpu.core import camera
from f2nerf_tpu.ops import segment
from f2nerf_tpu.ops.activations import (density_activation, gradient_scaling,
                                        trunc_exp, weight_var)
from f2nerf_tpu.fields import hash_encoding as he
from f2nerf_tpu.fields.mlp import init_mlp, mlp_apply
from f2nerf_tpu.fields.sh import sh_encode


# ------------------------------------------------------------- camera

def test_undistort_roundtrip():
    rng = np.random.RandomState(0)
    params = jnp.asarray(np.tile([[0.05, -0.01, 0.001, -0.002]], (64, 1)), jnp.float32)
    u = jnp.asarray(rng.uniform(-0.6, 0.6, 64), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.6, 0.6, 64), jnp.float32)
    x, y = camera.undistort(params, u, v, n_iters=10)
    du, dv = camera.apply_distortion(params, x, y)
    np.testing.assert_allclose(np.asarray(x + du), np.asarray(u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y + dv), np.asarray(v), atol=1e-5)


def test_undistort_zero_params_identity():
    params = jnp.zeros((5, 4))
    u = jnp.linspace(-1, 1, 5)
    v = jnp.linspace(-0.5, 0.5, 5)
    x, y = camera.undistort(params, u, v)
    np.testing.assert_allclose(np.asarray(x), np.asarray(u), atol=1e-7)
    np.testing.assert_allclose(np.asarray(y), np.asarray(v), atol=1e-7)


def test_pixel_to_ray_opengl_convention():
    # Identity pose at origin: center pixel must map to (0, 0, -1) direction.
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[:3])
    intri = jnp.asarray([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]])
    dist = jnp.zeros((4,))
    o, d = camera.pixel_to_ray(pose, intri, dist, jnp.asarray(40.0), jnp.asarray(50.0))
    np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(o), [0, 0, 0], atol=1e-6)
    # pixel right of center -> +x; pixel below center (larger i) -> -y
    _, d2 = camera.pixel_to_ray(pose, intri, dist, jnp.asarray(40.0), jnp.asarray(60.0))
    assert d2[0] > 0 and abs(d2[1]) < 1e-6
    _, d3 = camera.pixel_to_ray(pose, intri, dist, jnp.asarray(50.0), jnp.asarray(50.0))
    assert d3[1] < 0


def test_normalize_scene():
    rng = np.random.RandomState(1)
    poses = np.tile(np.eye(4, dtype=np.float32)[:3], (10, 1, 1))
    poses[:, :3, 3] = rng.uniform(-5, 5, (10, 3))
    bounds = rng.uniform(0.5, 10.0, (10, 2)).astype(np.float32)
    p2, b2, center, radius = camera.normalize_scene(poses, bounds)
    pos = p2[:, :3, 3]
    np.testing.assert_allclose(pos.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1).max(), 1.0, atol=1e-5)
    np.testing.assert_allclose(b2, bounds / radius, rtol=1e-6)


def test_pose_interpolate_endpoints_and_rotation():
    rng = np.random.RandomState(2)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    p0 = np.eye(4, dtype=np.float32)[:3]
    p1 = np.zeros((3, 4), dtype=np.float32)
    p1[:3, :3] = q
    p1[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(camera.pose_interpolate(p0, p1, 0.0), p0, atol=1e-5)
    np.testing.assert_allclose(camera.pose_interpolate(p0, p1, 1.0), p1, atol=1e-5)
    mid = camera.pose_interpolate(p0, p1, 0.5)
    r = mid[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)  # still a rotation


# ------------------------------------------------------------- segment ops

def _ragged_setup():
    counts = np.array([3, 0, 2, 4, 0], np.int32)
    n_rays, cap = len(counts), 12
    ray_id = np.full(cap, n_rays, np.int32)
    k = 0
    for r, c in enumerate(counts):
        for _ in range(c):
            ray_id[k] = r
            k += 1
    x = np.arange(cap, dtype=np.float32) + 1.0
    x[k:] = 0.0
    return counts, n_rays, cap, jnp.asarray(ray_id), jnp.asarray(x)


def test_segment_sum_and_max():
    counts, n_rays, cap, ray_id, x = _ragged_setup()
    s = np.asarray(segment.segment_sum(x, ray_id, n_rays))
    expect = [1 + 2 + 3, 0, 4 + 5, 6 + 7 + 8 + 9, 0]
    np.testing.assert_allclose(s, expect)


def test_segment_cumsum_exclusive():
    counts, n_rays, cap, ray_id, x = _ragged_setup()
    is_first = segment.first_flags_from_ray_id(ray_id, n_rays)
    c = np.asarray(segment.segment_cumsum(x, is_first, exclusive=True))
    expect = np.array([0, 1, 3, 0, 4, 0, 6, 13, 21, 0, 0, 0], np.float32)
    np.testing.assert_allclose(c[:9], expect[:9])


def test_local_index():
    counts, n_rays, cap, ray_id, x = _ragged_setup()
    li = np.asarray(segment.local_index(ray_id, n_rays))
    np.testing.assert_array_equal(li[:9], [0, 1, 2, 0, 1, 0, 1, 2, 3])


def _make_ray_id(counts: jnp.ndarray, cap: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample ray ids from per-ray counts (test-local helper; moved out
    of ops.segment — no production caller).

    counts: [n_rays] int32 (sum <= cap). Returns (ray_id [cap] with padding
    rows = n_rays, is_first [cap] bool).
    """
    n_rays = counts.shape[0]
    starts = jnp.cumsum(counts) - counts  # exclusive
    total = jnp.sum(counts)
    # ray_id[k] = number of starts <= k among rays with count>0 ... use scatter:
    # +1 at every ray's start (including empty rays: they share the start of
    # the next ray, so cumsum-1 lands on the LAST ray starting at <= k, which
    # is the non-empty one).
    seg = jnp.zeros((cap,), jnp.int32).at[starts].add(1, mode="drop")
    ray_id = jnp.cumsum(seg) - 1
    pos = jnp.arange(cap, dtype=jnp.int32)
    ray_id = jnp.where(pos < total, ray_id, n_rays)
    nonempty_starts = jnp.where(counts > 0, starts, cap)
    first_mark = jnp.zeros((cap,), jnp.int32).at[nonempty_starts].add(1, mode="drop")
    is_first = jnp.logical_and(pos < total, first_mark > 0)
    return ray_id.astype(jnp.int32), is_first


def test_make_ray_id_matches_counts():
    counts = jnp.asarray(np.array([3, 0, 2, 4, 0], np.int32))
    ray_id, is_first = _make_ray_id(counts, 12)
    np.testing.assert_array_equal(np.asarray(ray_id)[:9], [0, 0, 0, 2, 2, 3, 3, 3, 3])
    assert np.all(np.asarray(ray_id)[9:] == 5)
    np.testing.assert_array_equal(np.nonzero(np.asarray(is_first))[0], [0, 3, 5])


# ------------------------------------------------------------- activations

def test_trunc_exp_grad_clamps():
    g = jax.grad(lambda x: trunc_exp(x))(10.0)
    np.testing.assert_allclose(g, np.exp(5.0), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(2.0)
    np.testing.assert_allclose(g2, np.exp(2.0), rtol=1e-5)
    np.testing.assert_allclose(density_activation(jnp.asarray(3.0)), 1.0, rtol=1e-5)


def test_gradient_scaling():
    a = jnp.asarray([0.25, 0.75])
    x = jnp.asarray([1.0, 1.0])
    y, vjp = jax.vjp(lambda x: gradient_scaling(x, a, 0.5), x)
    np.testing.assert_allclose(y, x)
    (gx,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(gx), 0.5 + 0.5 * np.array([0.25, 0.75]) ** 2, rtol=1e-6)


def test_weight_var_against_reference_formula():
    counts, n_rays, cap, ray_id, _ = _ragged_setup()
    rng = np.random.RandomState(3)
    w = rng.uniform(0, 1, cap).astype(np.float32)
    w[9:] = 0.0
    i_local = np.asarray(segment.local_index(ray_id, n_rays))
    got = np.asarray(weight_var(jnp.asarray(w), ray_id, jnp.asarray(i_local), n_rays))
    # reference CustomOps.cu:12-35 re-implemented directly:
    expect = np.zeros(n_rays, np.float32)
    k = 0
    for r, c in enumerate(counts):
        ws = w[k:k + c]
        k += c
        if c == 0:
            continue
        pos = np.arange(c) / 16.0
        mean = (ws * pos).sum() / (1e-6 + ws.sum())
        expect[r] = (ws * (pos - mean) ** 2).sum()
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-7)


# ------------------------------------------------------------- hash + mlp + sh

def test_hash_encode_matches_numpy():
    key = jax.random.PRNGKey(0)
    log2_t = 8
    n_vol = 3
    feat, prim, bias = he.init_hash_state(key, log2_t, n_vol)
    rng = np.random.RandomState(4)
    pts = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    vol = rng.randint(0, n_vol, 32).astype(np.int32)
    got = np.asarray(he.hash_encode(feat, prim, bias, jnp.asarray(pts), jnp.asarray(vol), log2_t))

    # independent numpy reference of Hash3DAnchored.cu:12-79
    featn, primn, biasn = map(np.asarray, (feat, prim, bias))
    lsz = he.local_size(log2_t)
    scales = he.level_scales()
    expect = np.zeros((32, he.N_LEVELS * he.N_CHANNELS), np.float32)
    for i in range(32):
        for l in range(he.N_LEVELS):
            p = pts[i] * scales[l] + biasn[l, vol[i]]
            pa, pb, pc = primn[l, vol[i]].astype(np.uint64)
            x0 = np.floor(p).astype(np.int64)
            f = p - x0
            acc = np.zeros(2, np.float32)
            for c in range(8):
                dx, dy, dz = (c >> 2) & 1, (c >> 1) & 1, c & 1
                cx = np.uint64((x0[0] + dx) % (1 << 32))
                cy = np.uint64((x0[1] + dy) % (1 << 32))
                cz = np.uint64((x0[2] + dz) % (1 << 32))
                h = (np.uint64(cx * pa % (1 << 32)) ^
                     np.uint64(cy * pb % (1 << 32)) ^
                     np.uint64(cz * pc % (1 << 32))) % np.uint64(lsz)
                w = ((f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1]) *
                     (f[2] if dz else 1 - f[2]))
                acc += w * featn[l * lsz + int(h)]
            expect[i, 2 * l:2 * l + 2] = acc
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-8)


def test_hash_encode_grad_is_scatter_add():
    key = jax.random.PRNGKey(1)
    feat, prim, bias = he.init_hash_state(key, 6, 1)
    pts = jnp.asarray([[0.3, 0.4, 0.5]])
    vol = jnp.asarray([0], jnp.int32)

    def f(fp):
        return jnp.sum(he.hash_encode(fp, prim, bias, pts, vol, 6))

    g = jax.grad(f)(feat)
    # total gradient mass = 1 per (level, channel): trilerp weights sum to 1
    np.testing.assert_allclose(np.asarray(g).sum(), he.N_LEVELS * he.N_CHANNELS, rtol=1e-4)


def test_mlp_shapes_and_relu():
    ws = init_mlp(jax.random.PRNGKey(0), 32, 16, 64, 1)
    assert [w.shape for w in ws] == [(32, 64), (64, 64), (64, 16)]
    x = jnp.ones((8, 32))
    y = mlp_apply(ws, x)
    assert y.shape == (8, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_sh_encode_values():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode(d, 4))[0]
    assert out.shape == (16,)
    np.testing.assert_allclose(out[0], 0.28209479, rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.48860251, rtol=1e-5)  # z term
    np.testing.assert_allclose(out[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[6], 0.94617469575755997 - 0.31539156525251999, rtol=1e-5)
    # orthonormality spot check: integral of basis^2 over sphere == 1
    rng = np.random.RandomState(5)
    v = rng.randn(20000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    basis = np.asarray(sh_encode(jnp.asarray(v, jnp.float32), 4))
    norms = (basis ** 2).mean(axis=0) * 4 * np.pi
    np.testing.assert_allclose(norms, 1.0, atol=0.15)


def test_config_compose():
    from f2nerf_tpu.utils.config import compose
    cfg = compose("confs", "wanjinyou", ["mode=test", "dataset.factor=4"])
    assert cfg["mode"] == "test"
    assert cfg["dataset"]["factor"] == 4
    assert cfg["train"]["ray_march_init_fineness"] == 16  # _self_ override applied
    assert cfg["pts_sampler"]["sample_l"] == pytest.approx(1 / 256)
    assert cfg["renderer"]["use_app_emb"] is True
    cfg2 = compose("confs", "llff", [])
    assert cfg2["train"]["disp_loss_weight"] == pytest.approx(5e-2)
    assert cfg2["pts_sampler"]["sub_div_milestones"][0] == 1000


def test_sh_general_degrees():
    """General-degree SH (reference kernel supports <= 8) matches the
    hardcoded degree-4 table and stays orthonormal at degree 8."""
    from f2nerf_tpu.fields.sh import sh_encode_general
    rng = np.random.RandomState(7)
    v = rng.randn(4000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    vd = jnp.asarray(v, jnp.float32)
    np.testing.assert_allclose(np.asarray(sh_encode_general(vd, 4)),
                               np.asarray(sh_encode(vd, 4)), atol=1e-5)
    basis = np.asarray(sh_encode_general(vd, 8))
    assert basis.shape == (4000, 64)
    norms = (basis ** 2).mean(axis=0) * 4 * np.pi
    np.testing.assert_allclose(norms, 1.0, atol=0.4)  # MC estimate
    assert np.isfinite(np.asarray(sh_encode(vd, 8))).all()
