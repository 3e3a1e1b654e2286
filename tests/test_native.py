"""Native C++ octree-ops: build check + parity with the numpy reference."""

import numpy as np
import pytest

from f2nerf_tpu import native
from f2nerf_tpu.sampler import octree as oc
from tests.test_sampler import synthetic_rig, CFG


@pytest.fixture(scope="module")
def tree():
    c2w, w2c, intri, bounds = synthetic_rig()
    return oc.build_octree(c2w, w2c, intri, bounds, CFG, seed=0)


def test_native_builds():
    assert native.available(), "C++ octree ops failed to compile"


def _assert_trees_equal(a, b):
    np.testing.assert_array_equal(a.side, b.side)
    np.testing.assert_allclose(a.center, b.center, atol=1e-6)
    np.testing.assert_array_equal(a.parent, b.parent)
    np.testing.assert_array_equal(a.childs, b.childs)
    np.testing.assert_array_equal(a.is_leaf, b.is_leaf)
    np.testing.assert_array_equal(a.trans_idx, b.trans_idx)
    np.testing.assert_array_equal(a.weight_stats, b.weight_stats)
    np.testing.assert_array_equal(a.alpha_stats, b.alpha_stats)


@pytest.mark.parametrize("subdivide,brute", [(False, False), (True, True)])
def test_proc_octree_parity(tree, subdivide, brute):
    if not native.available():
        pytest.skip("no native lib")
    t = oc._proc_octree_np(tree, True, False, False)
    t.visit_cnt[:] = 100
    got = native.proc_octree(t, True, subdivide, brute)
    want = oc._proc_octree_np(t, True, subdivide, brute)
    assert got.n_nodes == want.n_nodes
    _assert_trees_equal(got, want)


def test_proc_octree_parity_after_culling(tree):
    if not native.available():
        pytest.skip("no native lib")
    t = oc._proc_octree_np(tree, True, False, False)
    rng = np.random.RandomState(0)
    valid = np.nonzero(t.trans_idx >= 0)[0]
    kill = rng.choice(valid, len(valid) // 2, replace=False)
    t.trans_idx[kill] = -1
    got = native.proc_octree(t, True, False, False)
    want = oc._proc_octree_np(t, True, False, False)
    assert got.n_nodes == want.n_nodes
    _assert_trees_equal(got, want)


def test_edge_pool_parity(tree):
    if not native.available():
        pytest.skip("no native lib")
    import copy
    t1 = copy.deepcopy(tree)
    native.edge_pool(t1)
    t2 = copy.deepcopy(tree)
    oc.construct_edge_pool(t2)
    assert t1.edge_t.shape == t2.edge_t.shape
    # same multiset of edges (construction order may differ)
    def key(t):
        arr = np.concatenate([t.edge_t.astype(np.float32), t.edge_center,
                              t.edge_dir0, t.edge_dir1], axis=1)
        return arr[np.lexsort(arr.T)]
    np.testing.assert_allclose(key(t1), key(t2), atol=1e-6)


def test_sample_pixels():
    if not native.available():
        pytest.skip("no native lib")
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (3, 8, 10, 3), dtype=np.uint8)
    k = 64
    ii = rng.randint(0, 3, k).astype(np.int32)
    ys = rng.randint(0, 8, k).astype(np.int32)
    xs = rng.randint(0, 10, k).astype(np.int32)
    out = native.sample_pixels(imgs, ii, ys, xs)
    want = imgs[ii, ys, xs].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, want, atol=1e-6)
