"""Perspective-warp construction for octree leaves (host-side numpy).

Re-implements the semantics of PersOctree::ConstructTrans (reference
PersSampler.cpp:437-612) and DistanceSummary (PersSampler.cpp:16-25):

Each valid octree leaf gets a warp into a compact 3D frame built from
projections onto N_PROS=12 virtual pinhole cameras:
  1. robust distance summary: exp(mean of log-distances below the 1st
     quartile) over visible-camera distances;
  2. greedy farthest-point selection of 6 cameras on the unit sphere of
     directions around the node center;
  3. each selected camera is rotated so its z-axis points at the node center
     and pushed out to at least dis_summary; focal is fx/cx of camera 0,
     scaled by dis/dis_summary (clipped >= 1);
  4. 12 projection rows (x-rows and y-rows of the 6 cameras) form [12, 2, 4]
     world->(u, depth) maps; projected coords v_i = a_i / b_i;
  5. PCA over the 12-dim projected coordinates of 32^3 random in-node points
     gives a [3, 12] weight matrix, normalized so the mean per-axis Jacobian
     magnitude (warp -> image) is 1 (unit warp step ~ one pixel).

This runs at octree construction only (init + subdivision milestones reuse
existing warps), so plain numpy is the right tool; results are uploaded to
device as flat arrays.
"""

from __future__ import annotations

import numpy as np

N_PROS = 12


def distance_summary(dis: np.ndarray) -> float:
    """exp(mean of log-distances below the first quartile); 1e8 if empty.

    Falls back to exp(mean(log)) when the below-quartile mask is empty
    (reference PersSampler.cpp:16-25).
    """
    dis = np.asarray(dis, np.float64).reshape(-1)
    if dis.size <= 0:
        return 1e8
    log_dis = np.log(np.maximum(dis, 1e-30))
    thres = np.quantile(log_dis, 0.25)
    mask = log_dis < thres
    if mask.sum() < 1e-3:
        return float(np.exp(log_dis.mean()))
    return float(np.exp(log_dis[mask].mean()))


def _pca_rows(pts: np.ndarray) -> np.ndarray:
    """Top-3 principal directions of [n, k] points as rows [3, k]
    (reference PersSampler.cpp:423-435)."""
    moved = (pts - pts.mean(axis=0, keepdims=True)).astype(np.float64)
    cov = moved.T @ moved / moved.shape[0]
    l, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(l)[::-1]
    return v[:, order[:3]].T  # rows = top eigenvectors


def _rot_align(from_z: np.ndarray, to_z: np.ndarray) -> np.ndarray:
    """Rotation matrix R with (row-vector convention) from_z @ R.T == to_z.

    Mirrors the angle-axis construction at PersSampler.cpp:525-546:
    angle = asin(|cross|), flipped through pi when the dot is negative.
    """
    crossed = np.cross(from_z, to_z)
    sin_val = np.linalg.norm(crossed)
    cos_val = float(np.dot(from_z, to_z))
    angle = np.arcsin(np.clip(sin_val, -1.0, 1.0))
    if cos_val < 0.0:
        angle = np.pi - angle
    if sin_val < 1e-12:
        return np.eye(3) if cos_val > 0 else -np.eye(3)
    axis = crossed / sin_val
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def virtual_cams(c2w: np.ndarray, intri: np.ndarray, center: np.ndarray,
                 rng: np.random.Generator) -> tuple[np.ndarray, float]:
    """Host half of the leaf-warp construction: distance summary, greedy
    camera selection, z-axis alignment, projection rows
    (PersSampler.cpp:461-566). Cheap (O(n_cams)); the per-point PCA +
    Jacobian half is batched over leaves on the accelerator
    (``finish_trans_batch``). Returns (w2xz [12, 2, 4] f64, dis_summary)."""
    n_virt = N_PROS // 2
    n_cams = c2w.shape[0]
    center = np.asarray(center, np.float64)
    cam_pos = c2w[:, :3, 3].astype(np.float64)
    cam_axes = np.linalg.inv(c2w[:, :3, :3].astype(np.float64))  # rows = axes

    dis = np.linalg.norm(cam_pos - center, axis=-1)
    dis_sum = distance_summary(dis)
    normed = (cam_pos - center) / dis[:, None]

    # greedy farthest-point selection on normalized positions
    pair_dis = np.linalg.norm(normed[None] - normed[:, None], axis=-1)
    good = [int(rng.integers(n_cams))]
    marks = np.zeros(n_cams, bool)
    marks[good[0]] = True
    for _ in range(1, min(n_virt, n_cams)):
        cand_dis = pair_dis[:, marks].min(axis=1)
        cand_dis[marks] = -1.0
        cand = int(np.argmax(cand_dis))
        marks[cand] = True
        good.append(cand)
    i = 0
    while len(good) < n_virt:
        good.append(good[i])
        i += 1

    cam_scale = np.clip(dis / dis_sum, 1.0, 1e9)
    rel_pos = normed * np.clip(dis, dis_sum, 1e9)[:, None]

    g = np.asarray(good)
    good_pos = rel_pos[g] + center          # virtual cam world position
    good_rel = rel_pos[g]
    good_axes = cam_axes[g].copy()          # [6, 3, 3] rows = x, y, z axes
    good_scale = cam_scale[g]

    expect_z = good_rel / np.linalg.norm(good_rel, axis=-1, keepdims=True)
    for i in range(n_virt):
        r = _rot_align(good_axes[i, 2], expect_z[i])
        good_axes[i] = good_axes[i] @ r.T
    assert np.abs(good_axes[:, 2] - expect_z).max() < 1e-3

    focal = float(intri[0, 0] / intri[0, 2])
    x_axis = good_axes[:, 0] * focal * good_scale[:, None]
    y_axis = good_axes[:, 1] * focal * good_scale[:, None]
    z_axis = good_axes[:, 2]

    row0 = np.concatenate([x_axis, y_axis], axis=0)       # [12, 3]
    row1 = np.concatenate([z_axis, z_axis], axis=0)       # [12, 3]
    wp_pos = np.concatenate([good_pos, good_pos], axis=0)  # [12, 3]
    w2xz = np.zeros((N_PROS, 2, 4))
    w2xz[:, 0, :3] = row0
    w2xz[:, 1, :3] = row1
    w2xz[:, 0, 3] = -(row0 * wp_pos).sum(-1)
    w2xz[:, 1, 3] = -(row1 * wp_pos).sum(-1)
    return w2xz, dis_sum


def construct_trans(rand_pts: np.ndarray, c2w: np.ndarray, intri: np.ndarray,
                    center: np.ndarray, rng: np.random.Generator) -> dict:
    """Build one leaf warp (naive single-leaf reference path; the octree
    build batches leaves through ``finish_trans_batch`` instead — the two
    are cross-checked by tests/test_render_math.py).

    rand_pts: [n_pts, 3] random points inside the node.
    c2w: [n_cams, 3, 4] poses of the cameras that see the node.
    intri: [3, 3] shared intrinsics (camera 0's, PersSampler.cpp:418).
    center: [3] node center.
    Returns dict(w2xz [12,2,4], weight [3,12], center [3], dis_summary).
    """
    w2xz, dis_sum = virtual_cams(c2w, intri, center, rng)

    # projected coords + Jacobian of v = a/b wrt world xyz; the per-point
    # [n_pts, ...] tensors run in f32 (construction hot path: this runs per
    # valid leaf), the small matrices stay f64
    pts = np.asarray(rand_pts, np.float32)
    w2xz32 = w2xz.astype(np.float32)
    a = pts @ w2xz32[:, 0, :3].T + w2xz32[:, 0, 3]   # [n, 12]
    b = pts @ w2xz32[:, 1, :3].T + w2xz32[:, 1, 3]   # [n, 12]
    assert b.max() < 0.0, "points must be in front of the virtual cameras"
    dv_da = 1.0 / b
    dv_db = a / (-b * b)
    dv_dxyz = dv_da[..., None] * w2xz32[None, :, 0, :3] + \
        dv_db[..., None] * w2xz32[None, :, 1, :3]  # [n, 12, 3]
    v = a / b

    weight = _pca_rows(v)  # [3, 12] (f64 internally)

    w32 = weight.astype(np.float32)
    jac = np.matmul(w32[None], dv_dxyz)                    # [n, 3, 3]
    jac_w2w = np.linalg.inv(jac)                           # world wrt warp
    jac_w2i = np.matmul(dv_dxyz, jac_w2w)                  # [n, 12, 3]
    jac_max = np.abs(jac_w2i).max(axis=1)                  # [n, 3]
    mean_step = (1.0 / jac_max).mean(axis=0, dtype=np.float64)  # [3]
    weight = weight / mean_step[:, None]

    return dict(
        w2xz=w2xz.astype(np.float32),
        weight=weight.astype(np.float32),
        center=np.asarray(center, np.float32),
        dis_summary=np.float32(dis_sum),
    )


_FINISH_FNS: dict = {}


def _get_finish_fns(c: int, n: int):
    """Jitted batched PCA-covariance + Jacobian-normalization kernels for a
    [c leaves, n points] chunk. The per-point math of ConstructTrans
    (PersSampler.cpp:568-597) is embarrassingly batchable over leaves; on a
    1-core host it dominates octree construction (VERDICT round 1 #8), so it
    runs on the accelerator. The 12x12 eigendecomposition stays on host in
    f64 (PCA eigenvector precision)."""
    if (c, n) in _FINISH_FNS:
        return _FINISH_FNS[(c, n)]
    import jax
    import jax.numpy as jnp

    def _ab(w2xz, pts):
        w0, t0 = w2xz[:, :, 0, :3], w2xz[:, :, 0, 3]
        w1, t1 = w2xz[:, :, 1, :3], w2xz[:, :, 1, 3]
        a = jnp.einsum("cnk,cjk->cnj", pts, w0) + t0[:, None]
        b = jnp.einsum("cnk,cjk->cnj", pts, w1) + t1[:, None]
        return a, b, w0, w1

    @jax.jit
    def cov_fn(w2xz, pts):
        a, b, _, _ = _ab(w2xz, pts)
        v = a / b
        mv = v - v.mean(axis=1, keepdims=True)
        cov = jnp.einsum("cni,cnj->cij", mv, mv) / n
        return cov, b.max(axis=(1, 2))

    def _inv3(m):
        """Closed-form 3x3 inverse (adjugate/det) — vectorized, no LAPACK."""
        a, b_, cc = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        ca, cb, ccc = e * i - f * h, cc * h - b_ * i, b_ * f - cc * e
        cd, ce, cf = f * g - d * i, a * i - cc * g, cc * d - a * f
        cg, ch, ci = d * h - e * g, b_ * g - a * h, a * e - b_ * d
        det = a * ca + b_ * cd + cc * cg
        adj = jnp.stack([jnp.stack([ca, cb, ccc], -1),
                         jnp.stack([cd, ce, cf], -1),
                         jnp.stack([cg, ch, ci], -1)], -2)
        return adj / det[..., None, None]

    @jax.jit
    def norm_fn(w2xz, pts, weight):
        a, b, w0, w1 = _ab(w2xz, pts)
        dv = (w0[:, None] / b[..., None]
              - (a / (b * b))[..., None] * w1[:, None])   # [c, n, 12, 3]
        jac = jnp.einsum("cxj,cnjk->cnxk", weight, dv)    # [c, n, 3, 3]
        jac_w2i = jnp.einsum("cnjk,cnkx->cnjx", dv, _inv3(jac))
        jac_max = jnp.abs(jac_w2i).max(axis=2)            # [c, n, 3]
        return (1.0 / jac_max).mean(axis=1)               # [c, 3]

    @jax.jit
    def gen_pts(key, center, side):
        u = jax.random.uniform(key, (c, n, 3))
        return (u - 0.5) * side[:, None, None] + center[:, None, :]

    _FINISH_FNS[(c, n)] = (cov_fn, norm_fn, gen_pts)
    return _FINISH_FNS[(c, n)]


def finish_trans_batch(w2xz_all: np.ndarray, pts_all: np.ndarray = None,
                       centers: np.ndarray = None, sides: np.ndarray = None,
                       seed: int = 0, n_rand: int = 32768,
                       chunk: int = 16) -> np.ndarray:
    """Batched second half of ConstructTrans over L leaves: PCA of projected
    coords + mean-Jacobian step normalization (PersSampler.cpp:568-597).

    w2xz_all: [L, 12, 2, 4]. Either pass explicit in-node points
    (pts_all [L, n_pts, 3] — the cross-check/test path) or (centers, sides,
    seed) to generate them ON DEVICE — host->device point uploads dominate
    build time through a remote-TPU tunnel (measured: 12 min vs seconds).
    Returns weight [L, 3, 12] f32. Asserts all points sit in front of the
    virtual cameras (b < 0), like the single-leaf path.
    """
    import jax

    L = w2xz_all.shape[0]
    if L == 0:
        return np.zeros((0, 3, N_PROS), np.float32)
    n = n_rand if pts_all is None else pts_all.shape[1]
    chunk = min(chunk, L)
    cov_fn, norm_fn, gen_pts = _get_finish_fns(chunk, n)
    out = np.zeros((L, 3, N_PROS), np.float32)
    pending = []
    for i in range(0, L, chunk):
        m = min(chunk, L - i)
        w = np.zeros((chunk, N_PROS, 2, 4), np.float32)
        w[:m] = w2xz_all[i:i + m]
        w[m:] = w2xz_all[i]  # pad with a real leaf: keeps b < 0 everywhere
        if pts_all is None:
            cpad = np.zeros((chunk, 3), np.float32)
            spad = np.full((chunk,), 1e-3, np.float32)
            cpad[:m] = centers[i:i + m]
            spad[:m] = sides[i:i + m]
            cpad[m:] = centers[i]
            spad[m:] = sides[i]
            p = gen_pts(jax.random.PRNGKey(seed + i), cpad, spad)
        else:
            p = np.zeros((chunk, n, 3), np.float32)
            p[:m] = pts_all[i:i + m]
            p[m:] = pts_all[i]
        # dispatch all cov computations first (pipelines tunnel round trips)
        pending.append((i, m, w, p, cov_fn(w, p)))
    for i, m, w, p, (cov, max_b) in pending:
        cov, max_b = np.asarray(cov), np.asarray(max_b)
        assert max_b.max() < 0.0, \
            "points must be in front of the virtual cameras"
        # host eigh in f64: top-3 eigenvectors as rows (reference PCA,
        # PersSampler.cpp:423-435)
        lam, vec = np.linalg.eigh(cov.astype(np.float64))
        weight = vec[:, :, ::-1][:, :, :3].transpose(0, 2, 1)  # [c, 3, 12]
        mean_step = np.asarray(norm_fn(w, p, weight.astype(np.float32)),
                               np.float64)
        out[i:i + m] = (weight / mean_step[:, :, None])[:m].astype(np.float32)
    return out


def apply_warp_np(trans: dict, pts: np.ndarray) -> np.ndarray:
    """Numpy warp application (test helper; device version in device.py).

    Matches QueryFrameTransform (PersSampler.cu:155-168): v_i = a_i/b_i,
    out = weight @ v.
    """
    pts = np.asarray(pts, np.float64)
    a = pts @ trans["w2xz"][:, 0, :3].T.astype(np.float64) + trans["w2xz"][:, 0, 3]
    b = pts @ trans["w2xz"][:, 1, :3].T.astype(np.float64) + trans["w2xz"][:, 1, 3]
    v = a / b
    return (v @ np.asarray(trans["weight"], np.float64).T).astype(np.float32)
