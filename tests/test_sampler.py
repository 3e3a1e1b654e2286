"""Sampler tests: warp construction invariants, octree build/maintenance,
device traversal vs. brute-force, ray marching behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f2nerf_tpu.sampler import octree as oc
from f2nerf_tpu.sampler import device as dv
from f2nerf_tpu.sampler import warp as wp


def synthetic_rig(n_cams=24, radius=2.0, target=(0, 0, 0), seed=0):
    """Cameras on a ring looking at the origin (OpenGL convention:
    camera -z axis points at the target)."""
    rng = np.random.RandomState(seed)
    c2w = np.zeros((n_cams, 3, 4), np.float32)
    for k in range(n_cams):
        ang = 2 * np.pi * k / n_cams
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang),
                        0.5 + 0.1 * rng.randn()])
        fwd = np.asarray(target) - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        # columns: x=right, y=up, z=-forward (so -z looks at target)
        c2w[k, :3, 0] = right
        c2w[k, :3, 1] = up2
        c2w[k, :3, 2] = -fwd
        c2w[k, :3, 3] = pos
    intri = np.tile(np.array([[200.0, 0, 160], [0, 200, 120], [0, 0, 1]],
                             np.float32), (n_cams, 1, 1))
    bounds = np.tile(np.array([0.1, 10.0], np.float32), (n_cams, 1))
    w2c = np.zeros_like(c2w)
    for k in range(n_cams):
        full = np.eye(4, dtype=np.float32)
        full[:3] = c2w[k]
        w2c[k] = np.linalg.inv(full)[:3]
    return c2w, w2c, intri, bounds


CFG = dict(bbox_levels=6, max_level=5, split_dist_thres=1.5,
           sub_div_milestones=[2000, 4000, 6000, 8000, 10000])


@pytest.fixture(scope="module")
def tree():
    c2w, w2c, intri, bounds = synthetic_rig()
    return oc.build_octree(c2w, w2c, intri, bounds, CFG, seed=0)


def test_build_octree_invariants(tree):
    assert tree.n_nodes > 1
    assert tree.n_trans > 0
    # parent/child consistency
    for u in range(tree.n_nodes):
        for st in range(8):
            c = tree.childs[u, st]
            if c >= 0:
                assert tree.parent[c] == u
    # leaves have no children; internal nodes have trans_idx -1
    leaf = tree.is_leaf
    assert (tree.childs[leaf] < 0).all()
    assert (tree.trans_idx[~leaf] == -1).all()
    # children live inside parents
    for u in range(tree.n_nodes):
        p = tree.parent[u]
        if p >= 0:
            assert (np.abs(tree.center[u] - tree.center[p])
                    <= tree.side[p] / 2).all()


def test_warp_construction_invariants(tree):
    # unit Jacobian normalization: mean per-axis step magnitude ~ 1
    rng = np.random.RandomState(1)
    valid = np.nonzero(tree.trans_idx >= 0)[0]
    u = valid[0]
    ti = tree.trans_idx[u]
    trans = dict(w2xz=tree.w2xz[ti], weight=tree.weight[ti])
    pts = (rng.rand(4096, 3) - 0.5) * tree.side[u] + tree.center[u]
    warped = wp.apply_warp_np(trans, pts)
    assert np.isfinite(warped).all()
    # warp must be locally injective: numeric Jacobian non-singular
    e = 1e-3 * tree.side[u]
    p0 = tree.center[u][None]
    j = np.stack([
        (wp.apply_warp_np(trans, p0 + np.eye(3)[k] * e)[0]
         - wp.apply_warp_np(trans, p0 - np.eye(3)[k] * e)[0]) / (2 * e)
        for k in range(3)], axis=1)
    assert abs(np.linalg.det(j)) > 1e-6


def test_distance_summary():
    d = np.array([1.0, 1.0, 1.0, 100.0])
    # quartile of logs ~ log(1); mask selects nothing below -> fallback mean
    s = wp.distance_summary(d)
    assert 0.5 < s < 100.0
    assert wp.distance_summary(np.array([])) == 1e8


def _brute_force_hits(tree, o, d, near, far):
    """All valid leaves intersected by the ray, sorted by entry t."""
    hits = []
    for u in range(tree.n_nodes):
        if not tree.is_leaf[u] or tree.trans_idx[u] < 0:
            continue
        lo = tree.center[u] - tree.side[u] / 2
        hi = tree.center[u] + tree.side[u] / 2
        with np.errstate(divide="ignore"):
            t0 = (lo - o) / d
            t1 = (hi - o) / d
        tn = max(np.minimum(t0, t1).max(), near)
        tf = min(np.maximum(t0, t1).min(), far)
        if tn < tf:
            hits.append((tn, tf, u))
    hits.sort()
    return hits


def test_traversal_matches_brute_force(tree):
    dtree = dv.to_device_tree(tree, 4096, 512, 65536)
    rng = np.random.RandomState(2)
    R = 64
    o = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = rng.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full(R, 0.05, np.float32)
    far = np.full(R, 1e8, np.float32)
    hit_idx, hit_near, hit_far, n_hits, trunc = dv.traverse(
        dtree, jnp.asarray(o), jnp.asarray(d), jnp.asarray(near),
        jnp.asarray(far), max_hits=64)
    hit_idx, hit_near, hit_far, n_hits = map(np.asarray, (hit_idx, hit_near, hit_far, n_hits))
    assert not np.asarray(trunc).any()
    for r in range(R):
        bf = _brute_force_hits(tree, o[r], d[r], near[r], far[r])
        got = [(hit_near[r, k], hit_far[r, k], hit_idx[r, k])
               for k in range(n_hits[r])]
        assert len(got) == len(bf), f"ray {r}: {len(got)} vs {len(bf)}"
        for (gn, gf, gu), (bn, bfar, bu) in zip(got, bf):
            assert gu == bu, f"ray {r}"
            np.testing.assert_allclose(gn, bn, atol=1e-3)
            np.testing.assert_allclose(gf, bfar, atol=1e-3)


def test_traversal_distant_origin_no_eps_stall(tree):
    """f32 eps-stall regression (r4 fox collapse): when ulp(t) exceeds
    leaf_side*1e-4 (origin ~1000+ sides from the scene), t + eps == t and a
    ray re-enters the same leaf forever — duplicate emits fill the hit
    buffer (persistent TravTrunc), geometry behind the stall point is lost,
    and the lockstep loop spins to max_iters. The ulp-proportional eps
    floor plus the last-leaf dedup guard must keep distant rays exact."""
    dtree = dv.to_device_tree(tree, 4096, 512, 65536)
    rng = np.random.RandomState(7)
    R = 32
    # origins far along the ray so t at the scene is ~4000 (ulp ~ 4.9e-4,
    # far above min leaf_side 1.0 * 1e-4)
    aim = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (aim - 4000.0 * d).astype(np.float32)
    near = np.full(R, 0.05, np.float32)
    far = np.full(R, 1e8, np.float32)
    hit_idx, hit_near, hit_far, n_hits, trunc = dv.traverse(
        dtree, jnp.asarray(o), jnp.asarray(d), jnp.asarray(near),
        jnp.asarray(far), max_hits=64)
    hit_idx, n_hits = np.asarray(hit_idx), np.asarray(n_hits)
    assert not np.asarray(trunc).any()
    for r in range(R):
        got = [hit_idx[r, k] for k in range(n_hits[r])]
        # no duplicate leaf emits (a ray crosses a convex leaf once)
        assert len(got) == len(set(got)), f"ray {r}: duplicate emits {got}"
        bf = [u for (_, _, u) in _brute_force_hits(tree, o[r], d[r],
                                                   near[r], far[r])]
        assert got == bf, f"ray {r}: {got} vs brute-force {bf}"


def test_ray_march_uniform_steps(tree):
    """With noise == 1 the warp-space step dt must equal sample_l (per
    RayMarchKernel: dt = exp_step * |J d| = sample_l * noise)."""
    dtree = dv.to_device_tree(tree, 4096, 512, 65536)
    rng = np.random.RandomState(3)
    R = 16
    o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full(R, 0.05, np.float32)
    far = np.full(R, 1e8, np.float32)
    hits = dv.traverse(dtree, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(near), jnp.asarray(far), max_hits=64)[:4]
    max_s = 256
    noise = jnp.ones((R + max_s + 16,))
    sample_l = 1.0 / 64
    out_t, out_dt, out_node, n_s, first_oct = dv.ray_march(
        dtree, jnp.asarray(o), jnp.asarray(d), *hits, noise, sample_l,
        False, max_s)
    out_t, out_dt, out_node, n_s = map(np.asarray, (out_t, out_dt, out_node, n_s))
    assert (n_s > 0).any()
    for r in range(R):
        k = n_s[r]
        if k == 0:
            continue
        # warp-space steps are sample_l exactly
        np.testing.assert_allclose(out_dt[r, :k], sample_l, rtol=1e-4)
        # t strictly increasing, all samples inside some emitted hit
        assert (np.diff(out_t[r, :k]) > 0).all()
        assert (out_node[r, :k] >= 0).all()
        hi, hn, hf, nh = map(np.asarray, hits)
        for s in range(k):
            u = out_node[r, s]
            j = list(hi[r, :nh[r]]).index(u)
            assert hn[r, j] - 1e-3 <= out_t[r, s] <= hf[r, j] + 1e-3


def test_proc_octree_compact_and_subdivide(tree):
    t2 = oc.proc_octree(tree, True, False, False)
    assert t2.n_nodes <= tree.n_nodes
    n_valid_before = (tree.trans_idx >= 0).sum()
    assert (t2.trans_idx >= 0).sum() == n_valid_before
    # invalidate half the leaves, compact again -> fewer nodes
    t3 = oc.proc_octree(t2, True, False, False)
    valid = np.nonzero(t3.trans_idx >= 0)[0]
    t3.trans_idx[valid[: len(valid) // 2]] = -1
    t4 = oc.proc_octree(t3, True, False, False)
    assert (t4.trans_idx >= 0).sum() == len(valid) - len(valid) // 2
    assert t4.n_nodes <= t3.n_nodes
    # brute-force subdivision grows the tree 8x per valid leaf
    t5 = oc.proc_octree(t2, True, True, True)
    assert t5.n_nodes > t2.n_nodes
    assert (t5.trans_idx >= 0).sum() == 8 * n_valid_before


def test_update_occupancy_invalidates_dead_nodes(tree):
    dtree = dv.to_device_tree(tree, 4096, 512, 65536)
    valid_nodes = np.nonzero(np.asarray(dtree.trans_idx) >= 0)[0]
    u_dead = int(valid_nodes[0])
    u_live = int(valid_nodes[1])
    n_rays, cap = 4, 64
    node_idx = np.full(cap, -1, np.int32)
    ray_id = np.full(cap, n_rays, np.int32)
    w = np.zeros(cap, np.float32)
    a = np.zeros(cap, np.float32)
    # ray 0 passes through dead node (tiny weights) then live node (big)
    node_idx[:8] = u_dead
    node_idx[8:16] = u_live
    ray_id[:16] = 0
    w[:8] = 1e-6
    a[:8] = 1e-6
    w[8:16] = 0.5
    a[8:16] = 0.5
    d2 = dtree
    for _ in range(1200):  # INIT_NODE_STAT=1000 decrements of -1
        d2 = dv.update_occupancy(d2, jnp.asarray(node_idx), jnp.asarray(ray_id),
                                 jnp.asarray(w), jnp.asarray(a), n_rays)
        if int(d2.trans_idx[u_dead]) < 0:
            break
    assert int(d2.trans_idx[u_dead]) == -1
    assert int(d2.trans_idx[u_live]) >= 0
    assert int(d2.weight_stats[u_live]) >= oc.INIT_NODE_STAT
    assert int(d2.visit_cnt[u_dead]) == 8


def test_edge_pool_and_sampling(tree):
    if tree.edge_t.shape[0] == 0:
        pytest.skip("no edges in synthetic tree")
    dtree = dv.to_device_tree(tree, 4096, 512, 65536)
    pts, idx = dv.sample_edges(dtree, jax.random.PRNGKey(0), 128)
    assert pts.shape == (128, 2, 3)
    assert np.isfinite(np.asarray(pts)).all()
    assert (np.asarray(idx) >= 0).all()


def test_maintain_runs(tree):
    c2w, w2c, intri, bounds = synthetic_rig()
    t = oc.proc_octree(tree, True, False, False)
    t.visit_cnt[:] = 100  # everything visited -> milestone subdivides
    n_milestones = len(t.milestones)
    t2, changed = oc.maintain(t, 2000, 1000, intri, w2c, bounds)
    assert changed
    assert len(t2.milestones) == n_milestones - 1
    assert t2.n_nodes >= t.n_nodes


def test_finish_trans_batch_matches_naive():
    """The batched device PCA/Jacobian finisher must agree with the naive
    single-leaf construct_trans (same rand_pts, same virtual cams)."""
    c2w, w2c, intri, bounds = synthetic_rig(n_cams=12)
    rng = np.random.default_rng(5)
    leaves = []
    for center, side in (((0.0, 0.0, 0.0), 0.8), ((0.3, -0.2, 0.1), 0.5),
                         ((-0.4, 0.4, 0.0), 0.6)):
        center = np.asarray(center)
        pts = (rng.random((4096, 3)) - 0.5) * side + center
        naive = wp.construct_trans(pts, c2w, intri[0], center, rng)
        leaves.append((naive, pts))
    w2xz = np.stack([n["w2xz"] for n, _ in leaves]).astype(np.float32)
    pts_all = np.stack([p for _, p in leaves]).astype(np.float32)
    weights = wp.finish_trans_batch(w2xz, pts_all, chunk=2)
    for (naive, _), got in zip(leaves, weights):
        want = naive["weight"]
        # eigenvector sign is arbitrary: compare per row up to sign
        for r in range(3):
            d = min(np.abs(got[r] - want[r]).max(),
                    np.abs(got[r] + want[r]).max())
            assert d < 5e-2 * np.abs(want[r]).max(), (r, d, want[r], got[r])


def test_ray_march_parallel_matches_reference_density(tree):
    """Parallel jittered-grid marcher: with jitter == 1 the samples must be
    exactly near_h + (k+1)*step_h inside each hit, dt == sample_l, and the
    per-hit counts must equal floor(span/step) (entry-Jacobian step)."""
    dtree = dv.to_device_tree(tree, 4096, 512, 65536)
    rng = np.random.RandomState(4)
    R = 16
    o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full(R, 0.05, np.float32)
    far = np.full(R, 1e8, np.float32)
    hit_idx, hit_near, hit_far, n_hits = dv.traverse(
        dtree, jnp.asarray(o), jnp.asarray(d), jnp.asarray(near),
        jnp.asarray(far), max_hits=64)[:4]
    max_s = 256
    sample_l = 1.0 / 64
    jit1 = jnp.ones((R, max_s))
    out_t, out_dt, out_node, n_s, first_oct = dv.ray_march_parallel(
        dtree, jnp.asarray(o), jnp.asarray(d), hit_idx, hit_near, hit_far,
        n_hits, jit1, jnp.asarray(1.0), sample_l, False, max_s)
    out_t, out_dt, out_node, n_s = map(
        np.asarray, (out_t, out_dt, out_node, n_s))
    hi, hn, hf, nh = map(np.asarray, (hit_idx, hit_near, hit_far, n_hits))
    assert (n_s > 0).any()
    for r in range(R):
        k = n_s[r]
        if k == 0:
            continue
        np.testing.assert_allclose(out_dt[r, :k], sample_l, rtol=1e-4)
        assert (np.diff(out_t[r, :k]) > 0).all()
        # every sample lies inside its hit interval
        for s in range(k):
            u = out_node[r, s]
            j = list(hi[r, :nh[r]]).index(u)
            assert hn[r, j] - 1e-4 <= out_t[r, s] <= hf[r, j] + 1e-4
    # train mode: jittered samples stay inside their intervals too
    jitr = jnp.asarray(rng.uniform(1e-4, 1.0, (R, max_s)).astype(np.float32))
    out_t2, _, out_node2, n_s2, _ = map(np.asarray, dv.ray_march_parallel(
        dtree, jnp.asarray(o), jnp.asarray(d), hit_idx, hit_near, hit_far,
        n_hits, jitr, jnp.asarray(1.0), sample_l, False, max_s))
    for r in range(R):
        for s in range(n_s2[r]):
            u = out_node2[r, s]
            j = list(hi[r, :nh[r]]).index(u)
            assert hn[r, j] - 1e-4 <= out_t2[r, s] <= hf[r, j] + 1e-4


def test_ray_march_parallel_degenerate_invalid_hits_stay_finite():
    """Regression: hit slots >= n_hits evaluate the warp at the camera
    origin through the root's clamped trans; if that warp degenerates
    (b = 0 there), the resulting nan step must NOT poison the ray's valid
    samples through slot_field's indicator-multiply reductions."""
    n = 1
    w2xz = np.zeros((1, 12, 2, 4), np.float32)
    w2xz[0, :, 0, :3] = [1.0, 0.0, 0.0]   # a = x
    w2xz[0, :, 1, :3] = [0.0, 0.0, 1.0]   # b = z  (=> b == 0 at the origin)
    weight = np.zeros((1, 3, 12), np.float32)
    weight[0, 0, 0] = 1.0
    weight[0, 1, 1] = 1.0
    weight[0, 2, 2] = 1.0
    host = oc.OctreeHost(
        center=np.array([[0.0, 0.0, -2.0]], np.float32),
        side=np.array([1.0], np.float32),
        parent=np.array([-1], np.int32),
        childs=np.full((1, 8), -1, np.int32),
        is_leaf=np.array([True]),
        trans_idx=np.array([0], np.int32),
        weight_stats=np.full(n, 1000, np.int32),
        alpha_stats=np.full(n, 1000, np.int32),
        visit_cnt=np.zeros(n, np.int32),
        w2xz=w2xz, weight=weight,
        t_center=np.array([[0.0, 0.0, -2.0]], np.float32),
        t_dis=np.array([1.0], np.float32),
        edge_t=np.zeros((0, 2), np.int32),
        edge_center=np.zeros((0, 3), np.float32),
        edge_dir0=np.zeros((0, 3), np.float32),
        edge_dir1=np.zeros((0, 3), np.float32),
        side_len=1.0,
    )
    dtree = dv.to_device_tree(host, 8, 8, 8)
    # ray from the origin through the leaf; only 1 valid hit, max_hits=4,
    # so 3 invalid slots evaluate the degenerate warp at the origin
    # origin on the b == 0 plane (off the projection center so the valid
    # hit's Jacobian is nonzero); invalid slots still evaluate nan there
    o = jnp.asarray([[0.3, 0.0, 0.0]], jnp.float32)
    dnp = np.array([[-0.05, 0.0, -1.0]], np.float32)
    d = jnp.asarray(dnp / np.linalg.norm(dnp))
    hit_idx, hit_near, hit_far, n_hits, _ = dv.traverse(
        dtree, o, d, jnp.asarray([0.01]), jnp.asarray([1e8]), max_hits=4)
    assert int(n_hits[0]) == 1
    max_s = 64
    out_t, out_dt, out_node, n_s, _ = dv.ray_march_parallel(
        dtree, o, d, hit_idx, hit_near, hit_far, n_hits,
        jnp.ones((1, max_s)), jnp.asarray(1.0), 1.0 / 16, False, max_s)
    out_t, out_dt, n_s = map(np.asarray, (out_t, out_dt, n_s))
    assert n_s[0] > 0
    assert np.isfinite(out_t).all() and np.isfinite(out_dt).all()
    np.testing.assert_allclose(out_dt[0, : n_s[0]], 1.0 / 16, rtol=1e-4)


def test_traversal_grazing_ray_stalls_escalate(tree):
    """r5 regression (the r4 post-milestone IPS collapse + residual
    TravTrunc): rays nearly parallel to a cell face (|d_axis| ~ 1e-6),
    positioned so position rounding swallows eps*|d_axis|, used to spin the
    lockstep while_loop to max_iters — billing the whole batch every step.
    Two stall shapes existed: (a) a stall on an emit-INeligible culled leaf
    (the old escalation keyed on the last EMITTED leaf, which such a leaf
    never becomes), and (b) a corner cycle alternating between TWO leaves
    (any last-X check ping-pongs; the per-leaf eps reset even shrank eps
    each cycle). The fix escalates on NO T-PROGRESS leaf visits, which
    subsumes both. Pre-fix, 141/430 of these rays truncate at
    max_iters=600; post-fix all 430 must finish with no duplicate emits
    and hits in brute-force order (grazing slivers may be skipped by the
    escalation — acceptable only on these measure-zero alignments; exact
    parity for generic rays is pinned by the two tests above)."""
    import dataclasses
    culled = dataclasses.replace(tree)
    culled.trans_idx = tree.trans_idx.copy()
    rng = np.random.RandomState(11)
    valid = np.nonzero(culled.trans_idx >= 0)[0]
    # cull 60% of valid leaves, as mid-window occupancy voting does
    kill = rng.choice(valid, size=int(0.6 * len(valid)), replace=False)
    culled.trans_idx[kill] = -1
    dtree = dv.to_device_tree(culled, 4096, 512, 65536)

    culled_leaves = [u for u in kill if culled.is_leaf[u]]
    os_, ds_ = [], []
    for u in culled_leaves[:256]:
        c = culled.center[u].astype(np.float64)
        s = float(culled.side[u])
        for dz in (1e-6, 1e-5, 1e-4, -1e-6, -1e-5):
            d = np.array([1.0, 0.0, dz])
            d /= np.linalg.norm(d)
            t_entry = 5.0
            face = c[2] + s / 2 if dz > 0 else c[2] - s / 2
            os_.append(np.array([c[0] - t_entry, c[1],
                                 face - np.sign(dz) * 3e-6 - d[2] * t_entry]))
            ds_.append(d)
    o = np.asarray(os_, np.float32)
    d = np.asarray(ds_, np.float32)
    R = o.shape[0]
    near = np.full(R, 0.05, np.float32)
    far = np.full(R, 1e8, np.float32)
    # tight iteration budget: a single non-escalating stall blows it and
    # surfaces as trunc (~done at max_iters)
    hit_idx, hit_near, hit_far, n_hits, trunc = dv.traverse(
        dtree, jnp.asarray(o), jnp.asarray(d), jnp.asarray(near),
        jnp.asarray(far), max_hits=64, max_iters=600)
    hit_idx, n_hits = np.asarray(hit_idx), np.asarray(n_hits)
    assert not np.asarray(trunc).any(), \
        f"{int(np.asarray(trunc).sum())}/{R} grazing rays stalled"
    for r in range(R):
        got = [hit_idx[r, k] for k in range(n_hits[r])]
        assert len(got) == len(set(got)), f"ray {r}: duplicate emits {got}"
        bf = [u for (_, _, u) in _brute_force_hits(culled, o[r], d[r],
                                                   near[r], far[r])]
        it = iter(bf)
        assert all(g in it for g in got), \
            f"ray {r}: {got} not a subsequence of brute-force {bf}"
