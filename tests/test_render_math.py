"""Golden tests for the volume-rendering math and tooling converters."""

import numpy as np
import jax.numpy as jnp

from f2nerf_tpu.ops.segment import (first_flags_from_ray_id, local_index,
                                    segment_cumsum, segment_sum)


def test_alpha_compositing_matches_direct():
    """The segmented-scan compositing (Renderer.cpp:196-208 semantics) must
    match a direct per-ray python evaluation."""
    rng = np.random.RandomState(0)
    counts = np.array([5, 0, 3, 7], np.int32)
    n_rays, cap = 4, 20
    ray_id = np.full(cap, n_rays, np.int32)
    k = 0
    for r, c in enumerate(counts):
        ray_id[k:k + c] = r
        k += c
    sigma = rng.uniform(0, 3, cap).astype(np.float32)
    dt = rng.uniform(0.01, 0.1, cap).astype(np.float32)
    rgb = rng.uniform(0, 1, (cap, 3)).astype(np.float32)
    tvals = np.cumsum(dt) + 0.5
    valid = ray_id < n_rays
    sigma[~valid] = 0
    bg = rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)

    rid = jnp.asarray(ray_id)
    sec = jnp.asarray(sigma * dt)
    first = first_flags_from_ray_id(rid, n_rays)
    acc = segment_cumsum(sec, first, exclusive=True)
    trans = jnp.exp(-acc)
    alpha = 1.0 - jnp.exp(-sec)
    w = jnp.where(rid < n_rays, trans * alpha, 0.0)
    last_trans = jnp.exp(-segment_sum(sec, rid, n_rays))
    colors = segment_sum(w[:, None] * jnp.asarray(rgb), rid, n_rays) \
        + last_trans[:, None] * jnp.asarray(bg)
    st = jnp.asarray(tvals) + 1e-2
    disparity = segment_sum(w / st, rid, n_rays)

    # direct
    k = 0
    for r, c in enumerate(counts):
        T = 1.0
        col = np.zeros(3)
        disp = 0.0
        for i in range(k, k + c):
            a = 1.0 - np.exp(-sigma[i] * dt[i])
            wi = T * a
            col += wi * rgb[i]
            disp += wi / (tvals[i] + 1e-2)
            T *= np.exp(-sigma[i] * dt[i])
        col += T * bg[r]
        np.testing.assert_allclose(np.asarray(colors)[r], col, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(last_trans)[r], T, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(disparity)[r], disp, rtol=2e-4, atol=1e-6)
        k += c


def test_inter_poses_smooth_and_valid():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from inter_poses import inter_poses
    from tests.test_sampler import synthetic_rig
    c2w, _, _, _ = synthetic_rig(n_cams=8)
    out = inter_poses(c2w.astype(np.float64), 30)
    assert out.shape == (30, 3, 4)
    for p in out:
        r = p[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # translations stay within the key-pose bounding box (plus slack)
    lo, hi = c2w[:, :3, 3].min(0) - 0.5, c2w[:, :3, 3].max(0) + 0.5
    assert (out[:, :3, 3] >= lo).all() and (out[:, :3, 3] <= hi).all()


def test_llff_converter():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from llff2poses import llff_to_cams_meta
    rng = np.random.RandomState(1)
    n = 5
    pb = np.zeros((n, 17))
    for i in range(n):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        m = np.zeros((3, 5))
        m[:3, :3] = q
        m[:3, 3] = rng.randn(3)
        m[:, 4] = [480, 640, 500.0]  # h, w, f
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [1.0, 10.0]
    cams = llff_to_cams_meta(pb)
    assert cams.shape == (n, 27)
    intri = cams[:, 12:21].reshape(n, 3, 3)
    np.testing.assert_allclose(intri[:, 0, 0], 500.0)
    np.testing.assert_allclose(intri[:, 0, 2], 320.0)
    np.testing.assert_allclose(intri[:, 1, 2], 240.0)
    np.testing.assert_allclose(cams[:, 25:], [[1.0, 10.0]] * n)
    # rotations remain orthonormal after the axis permutation
    poses = cams[:, :12].reshape(n, 3, 4)
    for p in poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-6)


def test_colmap_text_roundtrip(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import colmap2poses as cp
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    # one OPENCV camera, two images, three points
    (sparse / "cameras.txt").write_text(
        "# comment\n1 OPENCV 640 480 500 505 320 240 0.01 -0.02 0.001 0.002\n")
    q = np.array([1.0, 0.0, 0.0, 0.0])
    (sparse / "images.txt").write_text(
        "1 1 0 0 0 0 0 2 1 a.png\n10 10 1 20 20 2\n"
        "2 1 0 0 0 0.5 0 2 1 b.png\n10 10 2 20 20 3\n")
    # COLMAP cameras look along +z: points in front have positive depth
    (sparse / "points3D.txt").write_text(
        "1 0 0 3 255 0 0 0.1 1 0\n2 0.5 0 4 0 255 0 0.1 1 0\n"
        "3 0 0.5 5 0 0 255 0.1 2 0\n")
    cams = cp.colmap_to_cams_meta(str(sparse))
    assert cams.shape == (2, 27)
    intri = cams[0, 12:21].reshape(3, 3)
    np.testing.assert_allclose([intri[0, 0], intri[1, 1]], [500, 505])
    np.testing.assert_allclose(cams[0, 21:25], [0.01, -0.02, 0.001, 0.002])
    poses = cams[:, :12].reshape(2, 3, 4)
    for p in poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-6)
    assert (cams[:, 25] > 0).all() and (cams[:, 26] > cams[:, 25]).all()


def test_compact_rowpacked_matches_nonzero_compact():
    """_compact_rowpacked (scatter-free fast path for the marcher's
    row-packed output) must be bit-identical to the generic nonzero-based
    _compact across: empty rays, trailing empty rays, overflow (total >
    cap), underflow, and ray counts not divisible by the group size."""
    from f2nerf_tpu.render.renderer import _compact, _compact_rowpacked

    rng = np.random.default_rng(7)
    for n_rays, max_s, cap in [(8, 16, 64), (100, 32, 512), (100, 32, 128),
                               (130, 8, 1024), (64, 4, 16)]:
        n_s = rng.integers(0, max_s + 1, n_rays).astype(np.int32)
        n_s[rng.integers(0, n_rays, 3)] = 0            # empty rays
        n_s[-2:] = 0                                   # trailing empties
        t = rng.random((n_rays, max_s)).astype(np.float32)
        node = rng.integers(0, 999, (n_rays, max_s)).astype(np.int32)
        # row-packed invariant: only the first n_s[r] slots are valid;
        # invalid slots must not leak into the output regardless of value
        fields = dict(t=jnp.asarray(t.reshape(-1)),
                      node=jnp.asarray(node.reshape(-1)))

        pos = np.arange(max_s, dtype=np.int32)
        valid = jnp.asarray((pos[None, :] < n_s[:, None]).reshape(-1))
        ref, rid_ref, ok_ref, _ = _compact(valid, cap, fields, n_rays,
                                           max_s=max_s)
        out, rid, ok, _ = _compact_rowpacked(jnp.asarray(n_s), cap, fields,
                                             n_rays, max_s)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
        np.testing.assert_array_equal(np.asarray(rid), np.asarray(rid_ref))
        for k in fields:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(ref[k]))
