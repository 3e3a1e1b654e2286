"""Native (C++) runtime components, loaded via ctypes.

Build is lazy: the first import compiles octree_ops.cpp with the system
compiler into native/build/ (cached by source mtime). Everything here has a
numpy reference implementation in sampler/octree.py — `available()` gates
usage so the framework runs (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "octree_ops.cpp")
_BUILD = os.path.join(_DIR, "build")
_LIB_PATH = os.path.join(_BUILD, "libf2octree.so")

_lib = None
_tried = False


def _compile() -> str | None:
    os.makedirs(_BUILD, exist_ok=True)
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=300)
            return _LIB_PATH
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired) as e:
            err = getattr(e, "stderr", b"")
            if err:
                print(f"[f2nerf_tpu.native] {cc} failed:\n"
                      f"{err.decode()[:2000]}", file=sys.stderr)
            continue
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _compile()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.f2_proc_octree.restype = ctypes.c_int
    lib.f2_proc_octree.argtypes = [
        ctypes.c_int, f32p, f32p, i32p, i32p, u8p, i32p, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, u8p, i32p, i32p, i32p]
    lib.f2_edge_pool.restype = ctypes.c_long
    lib.f2_edge_pool.argtypes = [
        ctypes.c_int, f32p, f32p, i32p, ctypes.c_long, i32p, f32p, f32p, f32p]
    lib.f2_sample_pixels.restype = None
    lib.f2_sample_pixels.argtypes = [
        u8p, ctypes.c_long, ctypes.c_long, i32p, i32p, i32p, ctypes.c_long, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def proc_octree(tree, compact: bool, subdivide: bool, brute_force: bool,
                max_out: int = 1 << 21):
    """Native ProcOctree; returns a new OctreeHost (same semantics as
    sampler.octree.proc_octree) or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..sampler.octree import OctreeHost
    n = tree.n_nodes
    o_center = np.empty((max_out, 3), np.float32)
    o_side = np.empty(max_out, np.float32)
    o_parent = np.empty(max_out, np.int32)
    o_childs = np.empty((max_out, 8), np.int32)
    o_leaf = np.empty(max_out, np.uint8)
    o_trans = np.empty(max_out, np.int32)
    o_wstat = np.empty(max_out, np.int32)
    o_astat = np.empty(max_out, np.int32)
    nn = lib.f2_proc_octree(
        n,
        np.ascontiguousarray(tree.center, np.float32),
        np.ascontiguousarray(tree.side, np.float32),
        np.ascontiguousarray(tree.parent, np.int32),
        np.ascontiguousarray(tree.childs, np.int32),
        np.ascontiguousarray(tree.is_leaf, np.uint8),
        np.ascontiguousarray(tree.trans_idx, np.int32),
        np.ascontiguousarray(tree.weight_stats, np.int32),
        np.ascontiguousarray(tree.alpha_stats, np.int32),
        np.ascontiguousarray(tree.visit_cnt, np.int32),
        int(compact), int(subdivide), int(brute_force), max_out,
        o_center, o_side, o_parent, o_childs, o_leaf, o_trans,
        o_wstat, o_astat)
    if nn < 0:
        raise RuntimeError("f2_proc_octree: output exceeds max_out")
    return OctreeHost(
        center=o_center[:nn].copy(), side=o_side[:nn].copy(),
        parent=o_parent[:nn].copy(), childs=o_childs[:nn].copy(),
        is_leaf=o_leaf[:nn].astype(bool), trans_idx=o_trans[:nn].copy(),
        weight_stats=o_wstat[:nn].copy(), alpha_stats=o_astat[:nn].copy(),
        visit_cnt=np.zeros(nn, np.int32),
        w2xz=tree.w2xz, weight=tree.weight, t_center=tree.t_center,
        t_dis=tree.t_dis, edge_t=tree.edge_t, edge_center=tree.edge_center,
        edge_dir0=tree.edge_dir0, edge_dir1=tree.edge_dir1,
        side_len=tree.side_len, milestones=list(tree.milestones))


def edge_pool(tree, max_edges: int = 1 << 20):
    """Native ConstructEdgePool; fills the tree's edge arrays in place.
    Returns False if the library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    e_t = np.empty((max_edges, 2), np.int32)
    e_c = np.empty((max_edges, 3), np.float32)
    e_0 = np.empty((max_edges, 3), np.float32)
    e_1 = np.empty((max_edges, 3), np.float32)
    cnt = lib.f2_edge_pool(
        tree.n_nodes,
        np.ascontiguousarray(tree.center, np.float32),
        np.ascontiguousarray(tree.side, np.float32),
        np.ascontiguousarray(tree.trans_idx, np.int32),
        max_edges, e_t, e_c, e_0, e_1)
    if cnt < 0:
        raise RuntimeError("f2_edge_pool: exceeds max_edges")
    tree.edge_t = e_t[:cnt].copy()
    tree.edge_center = e_c[:cnt].copy()
    tree.edge_dir0 = e_0[:cnt].copy()
    tree.edge_dir1 = e_1[:cnt].copy()
    return True


def sample_pixels(images: np.ndarray, img_idx: np.ndarray, ys: np.ndarray,
                  xs: np.ndarray) -> np.ndarray | None:
    """Multithreaded gt-pixel gather for host-side data loading."""
    lib = _load()
    if lib is None:
        return None
    k = len(img_idx)
    out = np.empty((k, 3), np.float32)
    lib.f2_sample_pixels(
        np.ascontiguousarray(images, np.uint8),
        images.shape[1], images.shape[2],
        np.ascontiguousarray(img_idx, np.int32),
        np.ascontiguousarray(ys, np.int32),
        np.ascontiguousarray(xs, np.int32), k, out)
    return out
