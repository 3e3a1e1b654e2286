"""Device-side octree sampling: traversal, ray marching, warping, occupancy.

TPU-native replacement for the reference's divergent CUDA kernels
(PersSampler.cu):

  * FindRayOctreeIntersectionKernel (:53-152) — a per-thread DFS with a
    48-entry stack — becomes a lockstep *restart traversal*: every ray
    repeatedly point-locates o + t*d from the root (<= tree depth gathers)
    and skips empty regions analytically. All rays advance in one
    `lax.while_loop`; hits come out sorted along the ray by construction.
    Per-ray output is a fixed [MAX_HITS] buffer + count (the reference's
    two-phase count/fill + atomic prefix allocation is unnecessary with
    fixed shapes).

  * RayMarchKernel (:189-314) — becomes a lockstep state machine emitting at
    most one sample per iteration into dense [n_rays, MAX_S] buffers
    (EMIT/ADVANCE phases mirror the reference's outer loop + inner
    hit-advance while). Warp-space step dt = sample_l * noise / |J d|
    (optionally scaled by the clamped camera-distance ratio).

  * occupancy-stat update (:436-615) — atomics become `.at[].max()/.add()`
    scatters keyed by node index.

The tree lives on device as a pytree of fixed-capacity padded arrays
(`DeviceTree`), so milestone rebuilds on host never change shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .octree import OctreeHost, build_ropes
from .warp import N_PROS

# occupancy constants (reference PersSampler.cu:11-17)
OCC_WEIGHT_BASE = 512
ABS_WEIGHT_THRES = 0.01
REL_WEIGHT_THRES = 0.1
OCC_ALPHA_BASE = 32
ABS_ALPHA_THRES = 0.02
REL_ALPHA_THRES = 0.1


class DeviceTree(NamedTuple):
    """Padded SoA octree + warp table + edge pool on device."""
    center: jnp.ndarray      # [N, 3]
    side: jnp.ndarray        # [N]
    child: jnp.ndarray       # [N, 8] i32
    parent: jnp.ndarray      # [N] i32 (-1 at root)
    is_leaf: jnp.ndarray     # [N] bool
    trans_idx: jnp.ndarray   # [N] i32 (mutated by occupancy culling)
    rope: jnp.ndarray        # [N, 6] i32 face neighbors (leaves; -1 = border)
    # packed per-node traversal row [N, 64] f32 (see PACK_* lane map): the
    # while_loop body fetches ALL node state in ONE 64-lane row gather
    # (~300 M rows/s measured) instead of ~8 scattered gathers per
    # iteration. Node ids < 2^24 are exact in f32. Lane 5 mirrors
    # trans_idx and is refreshed by apply_occupancy_adders.
    pack: jnp.ndarray        # [N, 64] f32
    weight_stats: jnp.ndarray  # [N] i32
    alpha_stats: jnp.ndarray   # [N] i32
    visit_cnt: jnp.ndarray     # [N] i32
    # warp tables, stored FLAT: a gathered [n, 12, 2, 4] tensor would pad
    # its minor dims to (8, 128) on TPU (~128x memory bloat); [n, 96] rows
    # pad only 96 -> 128. Layout: w2xz[m, 8k + 4r + c] = matrix k, row r,
    # col c; weight[m, 12a + k] = output axis a, projection k.
    w2xz: jnp.ndarray        # [M, 96]
    weight: jnp.ndarray      # [M, 36]
    t_center: jnp.ndarray    # [M, 3]
    t_dis: jnp.ndarray       # [M]
    edge_t: jnp.ndarray      # [E, 2] i32
    edge_center: jnp.ndarray  # [E, 3]
    edge_dir0: jnp.ndarray   # [E, 3]
    edge_dir1: jnp.ndarray   # [E, 3]
    n_edges: jnp.ndarray     # [] i32


def _pad(x: np.ndarray, n: int, fill=0):
    out = np.full((n,) + x.shape[1:], fill, x.dtype)
    out[: x.shape[0]] = x
    return out


# pack lane map (traversal row): 0:3 center, 3 side, 4 is_leaf, 5 trans_idx,
# 6:12 rope, 12:20 child idx, 20:44 child centers (20+3*st+ax), 44:52 child
# sides, 52:64 zero padding (a 64-lane row costs the same gather as 52)
PACK_W = 64


def _pack_nodes(tree: OctreeHost, ropes: np.ndarray, max_nodes: int) -> np.ndarray:
    n = tree.n_nodes
    pack = np.zeros((max_nodes, PACK_W), np.float32)
    pack[:, 4] = 1.0   # padding reads as an invalid leaf
    pack[:, 5] = -1.0
    pack[:, 6:20] = -1.0
    pk = pack[:n]
    pk[:, 0:3] = tree.center
    pk[:, 3] = tree.side
    pk[:, 4] = tree.is_leaf.astype(np.float32)
    pk[:, 5] = tree.trans_idx
    pk[:, 6:12] = ropes[:n]
    ch = tree.childs[:n]
    pk[:, 12:20] = ch
    chc = np.maximum(ch, 0)
    pk[:, 20:44] = tree.center[chc].reshape(n, 24)
    pk[:, 44:52] = tree.side[chc]
    return pack


def to_device_tree(tree: OctreeHost, max_nodes: int, max_trans: int,
                   max_edges: int) -> DeviceTree:
    assert tree.n_nodes <= max_nodes, (tree.n_nodes, max_nodes)
    assert tree.n_trans <= max_trans, (tree.n_trans, max_trans)
    assert tree.edge_t.shape[0] <= max_edges, (tree.edge_t.shape[0], max_edges)
    ropes = _pad(build_ropes(tree), max_nodes, -1)
    return DeviceTree(
        center=jnp.asarray(_pad(tree.center, max_nodes)),
        side=jnp.asarray(_pad(tree.side, max_nodes)),
        child=jnp.asarray(_pad(tree.childs, max_nodes, -1)),
        parent=jnp.asarray(_pad(tree.parent, max_nodes, -1)),
        is_leaf=jnp.asarray(_pad(tree.is_leaf.astype(np.int8), max_nodes, 1) > 0),
        trans_idx=jnp.asarray(_pad(tree.trans_idx, max_nodes, -1)),
        rope=jnp.asarray(ropes),
        pack=jnp.asarray(_pack_nodes(tree, ropes, max_nodes)),
        weight_stats=jnp.asarray(_pad(tree.weight_stats, max_nodes)),
        alpha_stats=jnp.asarray(_pad(tree.alpha_stats, max_nodes)),
        visit_cnt=jnp.asarray(_pad(tree.visit_cnt, max_nodes)),
        w2xz=jnp.asarray(_pad(tree.w2xz.reshape(-1, 96), max_trans)),
        weight=jnp.asarray(_pad(tree.weight.reshape(-1, 36), max_trans)),
        t_center=jnp.asarray(_pad(tree.t_center, max_trans)),
        t_dis=jnp.asarray(_pad(tree.t_dis, max_trans, 1.0)),
        edge_t=jnp.asarray(_pad(tree.edge_t, max_edges)),
        edge_center=jnp.asarray(_pad(tree.edge_center, max_edges)),
        edge_dir0=jnp.asarray(_pad(tree.edge_dir0, max_edges)),
        edge_dir1=jnp.asarray(_pad(tree.edge_dir1, max_edges)),
        n_edges=jnp.asarray(tree.edge_t.shape[0], jnp.int32),
    )


def sync_host_tree(tree: OctreeHost, dtree: DeviceTree) -> OctreeHost:
    """Pull device-mutated state (trans_idx culling + occupancy stats) back
    into the host tree before maintenance."""
    n = tree.n_nodes
    tree.trans_idx = np.asarray(dtree.trans_idx[:n])
    tree.weight_stats = np.asarray(dtree.weight_stats[:n])
    tree.alpha_stats = np.asarray(dtree.alpha_stats[:n])
    tree.visit_cnt = np.asarray(dtree.visit_cnt[:n])
    return tree


# ----------------------------------------------------------- geometry helpers

def _slab(center, side, o, d, big=1e6):
    """Ray-AABB intersection, matching GetIntersection (PersSampler.cu:21-51)
    including the |d| < 1e-6 inside/outside convention. center/side
    broadcastable against o/d [..., 3]. Returns (near, far)."""
    hf = side[..., None] * 0.5
    lo = center - hf
    hi = center + hf
    safe_d = jnp.where(jnp.abs(d) < 1e-6, 1.0, d)
    t0 = (lo - o) / safe_d
    t1 = (hi - o) / safe_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    degenerate = jnp.abs(d) < 1e-6
    inside = (o > lo) & (o < hi)
    tn = jnp.where(degenerate, jnp.where(inside, -big, big), tn)
    tf = jnp.where(degenerate, jnp.where(inside, big, -big), tf)
    return tn.max(axis=-1), tf.min(axis=-1)


def _rows(mat_t):
    """[cols, n] transposed gather -> list of [n] row vectors (sublane
    slices are cheap; lane slices of [n, cols] are not)."""
    return [mat_t[i] for i in range(mat_t.shape[0])]


def _warp_rows(tree: DeviceTree, trans_idx: jnp.ndarray):
    """Gather + transpose the warp tables for per-point indices, with an
    optimization barrier between the gather and its ~130 elementwise
    consumers. Without the barrier XLA fuses the gather INTO each consumer
    and re-executes it per op — measured 46.7 ms vs 9.2 ms for the same
    apply_warp at 393k points (benchmarks/probe_compact_warp.py)."""
    m = jax.lax.optimization_barrier(tree.w2xz[trans_idx].T)   # [96, n]
    w = jax.lax.optimization_barrier(tree.weight[trans_idx].T)  # [36, n]
    return _rows(m), _rows(w)


def apply_warp(tree: DeviceTree, trans_idx: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Warp world points [n, 3] through per-point leaf warps
    (QueryFrameTransform, PersSampler.cu:155-168). All math on flat [n]
    vectors (see the DeviceTree layout note)."""
    m, w = _warp_rows(tree, trans_idx)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    out = [0.0, 0.0, 0.0]
    for k in range(N_PROS):
        a = m[8 * k] * x + m[8 * k + 1] * y + m[8 * k + 2] * z + m[8 * k + 3]
        b = m[8 * k + 4] * x + m[8 * k + 5] * y + m[8 * k + 6] * z + m[8 * k + 7]
        v = a / b
        for ax in range(3):
            out[ax] = out[ax] + w[12 * ax + k] * v
    return jnp.stack(out, axis=-1)


def warp_jac_dir(w2xz_rows, weight_rows, pts, dirs):
    """|J(x) @ d| per ray, with J the warp Jacobian
    (QueryFrameTransformJac, PersSampler.cu:170-187).
    w2xz_rows: 96 x [n], weight_rows: 36 x [n] (from _rows of transposed
    gathers), pts/dirs [n, 3]."""
    m, w = w2xz_rows, weight_rows
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    dx, dy, dz = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    jd = [0.0, 0.0, 0.0]
    for k in range(N_PROS):
        a = m[8 * k] * x + m[8 * k + 1] * y + m[8 * k + 2] * z + m[8 * k + 3]
        b = m[8 * k + 4] * x + m[8 * k + 5] * y + m[8 * k + 6] * z + m[8 * k + 7]
        r0d = m[8 * k] * dx + m[8 * k + 1] * dy + m[8 * k + 2] * dz
        r1d = m[8 * k + 4] * dx + m[8 * k + 5] * dy + m[8 * k + 6] * dz
        dvd = r0d / b - (a / (b * b)) * r1d   # dv_k/dxyz . d
        for ax in range(3):
            jd[ax] = jd[ax] + w[12 * ax + k] * dvd
    return jnp.sqrt(jd[0] ** 2 + jd[1] ** 2 + jd[2] ** 2)


# ----------------------------------------------------------------- traversal

@partial(jax.jit, static_argnames=("max_hits", "max_iters"))
def traverse(tree: DeviceTree, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
             near: jnp.ndarray, far: jnp.ndarray,
             max_hits: int, max_iters: int = 4096):
    """Ordered leaf intersections per ray via rope traversal.

    Returns (hit_idx [R, H] i32, hit_near [R, H], hit_far [R, H],
    n_hits [R] i32, trunc [R] bool). Replaces FindRayOctreeIntersectionKernel
    (PersSampler.cu:53-152); ordering along the ray is identical to the
    reference's direction-ordered DFS because leaf cells are disjoint.

    Lockstep loop: internal nodes point-locate one level down per
    iteration; on leaf exit the ray follows the precomputed face-neighbor
    rope (build_ropes) to the adjacent same-or-coarser node in ONE step
    instead of restarting from the root (~tree-depth gathers per leaf, the
    round-1 scheme — rope traversal cut the loop's iteration count ~3x).
    Corner exits that land in a diagonal neighbor fail the containment
    check and bounce to a root restart (rare, costs one extra descent).

    trunc marks rays whose traversal was cut short — the hit buffer filled
    (cnt hit max_hits) or the lockstep loop hit max_iters — i.e. hits may
    have been silently dropped. The reference CHECK-crashes on the analogous
    overflow (PersSampler.cu:330-337); here the caller surfaces the count as
    a stat so pathological trees are observable instead of fatal.
    """
    R = rays_o.shape[0]
    root_side = tree.side[0]
    eps0 = root_side * 1e-6

    t_root_n, t_root_f = _slab(tree.center[0], root_side, rays_o, rays_d)
    t0 = jnp.maximum(t_root_n, near)
    t_end = jnp.minimum(t_root_f, far)

    state = dict(
        t=t0,
        u=jnp.zeros((R,), jnp.int32),
        cnt=jnp.zeros((R,), jnp.int32),
        done=t0 >= t_end,
        # the ulp floor (see leaf_eps below) applies to the INITIAL eps too:
        # with eps < ulp(t0), p sits exactly on the root entry plane and f32
        # rounding can land it outside the child octant — the skip branch
        # then jumps the whole octant (f_o), silently dropping every leaf in
        # it (distant-origin rays lost their first ~20 units of geometry)
        eps=jnp.maximum(jnp.full((R,), eps0), jnp.abs(t0) * 5e-7),
        last=jnp.full((R,), -1, jnp.int32),
        trunc=jnp.zeros((R,), bool),
        hit_idx=jnp.full((R, max_hits), -1, jnp.int32),
        hit_near=jnp.zeros((R, max_hits)),
        hit_far=jnp.zeros((R, max_hits)),
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return jnp.logical_and(jnp.any(~s["done"]), s["it"] < max_iters)

    ox, oy, oz = rays_o[:, 0], rays_o[:, 1], rays_o[:, 2]
    dx, dy, dz = rays_d[:, 0], rays_d[:, 1], rays_d[:, 2]

    def body(s):
        t, u, cnt, done, eps = s["t"], s["u"], s["cnt"], s["done"], s["eps"]
        p = rays_o + rays_d * (t + eps)[:, None]

        # ONE packed row gather per iteration (see PACK_W lane map), then a
        # transpose so every lane becomes a cheap [R] sublane slice — the
        # previous body issued ~8 separate gathers (center/side/leaf/trans/
        # rope/child/child-center/child-side), each billed at the same
        # per-row cost as this single one.
        row = jax.lax.optimization_barrier(tree.pack[u].T)   # [64, R]
        c_u = jnp.stack([row[0], row[1], row[2]], axis=-1)
        s_u = row[3]
        leaf_u = row[4] > 0.5
        tr_u = row[5]

        # rope/skip targets may not contain p (corner exits into a diagonal
        # neighbor): bounce to a root restart with t unchanged
        outside_u = (jnp.abs(p - c_u).max(axis=-1) > s_u * 0.5) & (u != 0)

        # ---- leaf: emit (if valid) and follow the exit-face rope
        n_l, f_l = _slab(c_u, s_u, rays_o, rays_d)
        n_l = jnp.maximum(n_l, near)
        f_l = jnp.minimum(f_l, far)
        # a ray crosses a convex leaf exactly once, so re-seeing the last
        # emitted node (corner-bounce root restart, or an eps stall the
        # ulp floor below didn't cover) is always a duplicate — skip it.
        # `f_l > t` additionally gates emission on forward progress: in a
        # multi-leaf stall cycle (see leaf_progress below) a valid leaf
        # already passed (f_l <= t) would otherwise re-emit every cycle
        # because `last` ping-pongs between the cycle's leaves.
        leaf_progress = f_l > t
        emit = (~done) & (~outside_u) & leaf_u & (tr_u >= 0) & (n_l < f_l) \
            & leaf_progress & (cnt < max_hits) & (u != s["last"])
        rows = jnp.arange(R)
        slot = jnp.minimum(cnt, max_hits - 1)
        hit_idx = s["hit_idx"].at[rows, slot].set(
            jnp.where(emit, u, s["hit_idx"][rows, slot]))
        hit_near = s["hit_near"].at[rows, slot].set(
            jnp.where(emit, n_l, s["hit_near"][rows, slot]))
        hit_far = s["hit_far"].at[rows, slot].set(
            jnp.where(emit, f_l, s["hit_far"][rows, slot]))
        cnt = cnt + emit.astype(jnp.int32)

        # exit face = the axis whose outgoing slab plane realizes f_l
        safe_d = jnp.where(jnp.abs(rays_d) < 1e-6, 1.0, rays_d)
        t_ax = (c_u + jnp.sign(safe_d) * s_u[:, None] * 0.5 - rays_o) / safe_d
        t_ax = jnp.where(jnp.abs(rays_d) < 1e-6, 1e9, t_ax)
        face_ax = jnp.argmin(t_ax, axis=-1)
        face = face_ax * 2 + (jnp.take_along_axis(
            rays_d, face_ax[:, None], axis=-1)[:, 0] > 0).astype(jnp.int32)
        # dynamic-lane picks are indicator sums over the 6 static rope lanes
        # (take_along_axis-style lane gathers serialize on TPU)
        rope_u = sum(jnp.where(face == f, row[6 + f], 0.0)
                     for f in range(6)).astype(jnp.int32)
        leaf_t = jnp.maximum(f_l, t)
        # eps must stay above the f32 ulp of t: deep-subdivided leaves make
        # s_u*1e-4 smaller than ulp(t) for t beyond ~10, so t+eps == t and
        # the ray re-enters the same leaf forever — duplicate emits fill the
        # hit buffer (persistent TravTrunc), geometry beyond the stall point
        # is lost, and the lockstep loop pays max_hits iterations per batch
        # (the r4 fox run's IPS collapse). 5e-7 ~ 8 ulps of f32.
        leaf_eps = jnp.maximum(jnp.maximum(s_u * 1e-4, eps0),
                               jnp.abs(leaf_t) * 5e-7)
        # A leaf visit with NO t-progress (f_l <= t: the slab says the ray
        # already passed this leaf, yet position rounding point-located p
        # back inside it) means the previous eps failed to carry p across
        # the stall plane (grazing ray: eps*|d_axis| below ulp(p_axis)) —
        # escalate geometrically, and never below the carried eps, so the
        # ray escapes in O(log) iterations instead of spinning to
        # max_iters. Keying escalation on no-progress (rather than on
        # re-seeing the last emitted/visited leaf) is what handles BOTH
        # observed stall shapes: (a) a stall on an emit-ineligible culled
        # leaf, which never updates `last` (the r4 fox post-milestone IPS
        # collapse, 3.9 -> 0.55 by iter 8500, and its residual TravTrunc),
        # and (b) a corner cycle alternating between TWO leaves, where any
        # last-X check ping-pongs and a per-leaf eps reset even shrinks eps
        # each cycle (tests/test_sampler.py grazing-ray regression).
        leaf_eps = jnp.where(leaf_progress, leaf_eps,
                             jnp.maximum(leaf_eps, eps * 4.0))

        # ---- internal: descend or skip empty region
        gex = (p[:, 0] >= row[0]).astype(jnp.int32)
        gey = (p[:, 1] >= row[1]).astype(jnp.int32)
        gez = (p[:, 2] >= row[2]).astype(jnp.int32)
        ge = jnp.stack([gex, gey, gez], axis=-1)
        st = (gex << 2) | (gey << 1) | gez
        sel = [st == k for k in range(8)]
        c_f = sum(jnp.where(sel[k], row[12 + k], 0.0) for k in range(8))
        c = c_f.astype(jnp.int32)
        c_center = jnp.stack(
            [sum(jnp.where(sel[k], row[20 + 3 * k + ax], 0.0)
                 for k in range(8)) for ax in range(3)], axis=-1)
        c_side = sum(jnp.where(sel[k], row[44 + k], 0.0) for k in range(8))
        inside_c = (c >= 0) & \
            (jnp.abs(p - c_center).max(axis=-1) <= c_side * 0.5)

        oct_center = c_u + (ge.astype(jnp.float32) - 0.5) * s_u[:, None] * 0.5
        oct_side = s_u * 0.5
        _, f_o = _slab(oct_center, oct_side, rays_o, rays_d)
        n_c, f_c = _slab(c_center, c_side, rays_o, rays_d)
        hit_ahead = (c >= 0) & (n_c > t) & (n_c < f_o) & (n_c < f_c)
        skip_t = jnp.where(hit_ahead, n_c, f_o)
        skip_t = jnp.maximum(skip_t, t)
        skip_eps = jnp.maximum(jnp.maximum(
            jnp.where(hit_ahead, c_side, oct_side) * 1e-4, eps0),
            jnp.abs(skip_t) * 5e-7)

        # ---- merge branches. Leaves exit along their rope (-1 = left the
        # domain); empty-octant skips relocate from u itself (the skip point
        # usually stays inside u; the containment check above catches the
        # rest). An unconditional up-walk variant livelocked on deep trees.
        new_t = jnp.where(done | outside_u, t,
                          jnp.where(leaf_u, leaf_t,
                                    jnp.where(inside_c, t, skip_t)))
        new_u = jnp.where(done, u,
                          jnp.where(outside_u, 0,
                                    jnp.where(leaf_u, jnp.maximum(rope_u, 0),
                                              jnp.where(inside_c, c, u))))
        new_eps = jnp.where(done | outside_u | inside_c, eps,
                            jnp.where(leaf_u, leaf_eps, skip_eps))
        # internal-skip stall: staying at the same internal node with t
        # unmoved (f_o <= t from fp rounding past the octant exit) would
        # otherwise creep at the ulp floor — escalate geometrically too
        skip_stall = (~done) & (~outside_u) & (~leaf_u) & (~inside_c) & \
            (new_t <= t)
        new_eps = jnp.where(skip_stall, jnp.maximum(new_eps, eps * 4.0),
                            new_eps)
        rope_end = (~done) & (~outside_u) & leaf_u & (rope_u < 0)
        reached_end = ~inside_c & ~outside_u & ((new_t + new_eps) >= t_end)
        cap_hit = cnt >= max_hits
        new_done = done | rope_end | reached_end | cap_hit
        # buffer filled with ray not at its exit: hits beyond this are lost
        trunc = s["trunc"] | (~done & cap_hit & ~reached_end & ~rope_end)

        new_last = jnp.where(emit, u, s["last"])
        return dict(t=new_t, u=new_u, cnt=cnt, done=new_done, eps=new_eps,
                    last=new_last, trunc=trunc, hit_idx=hit_idx,
                    hit_near=hit_near, hit_far=hit_far, it=s["it"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    trunc = out["trunc"] | ~out["done"]  # ~done at exit == hit max_iters
    return out["hit_idx"], out["hit_near"], out["hit_far"], out["cnt"], trunc


# ------------------------------------------------------------------ marching

@partial(jax.jit, static_argnames=("max_s", "scale_by_dis", "max_iters"))
def ray_march(tree: DeviceTree, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
              hit_idx, hit_near, hit_far, n_hits,
              noise: jnp.ndarray, sample_l: float | jnp.ndarray,
              scale_by_dis: bool, max_s: int, max_iters: int = 0):
    """March rays through their hit lists, mirroring RayMarchKernel
    (PersSampler.cu:189-314) as an EMIT/ADVANCE lockstep state machine.

    noise: [R + max_s + 16] per-step step-length multipliers (already times
    ray_march_fineness; all-ones in eval — Renderer VALIDATE mode).
    Returns dense per-ray buffers:
      out_t [R, max_s], out_dt [R, max_s], out_node [R, max_s] i32,
      n_samples [R] i32, first_oct_dis [R].
    """
    R = rays_o.shape[0]
    H = hit_idx.shape[1]
    if max_iters == 0:
        max_iters = max_s + H + 8

    first_oct = jnp.where(n_hits > 0, hit_near[:, 0], 1e9)
    rows = jnp.arange(R)

    state = dict(
        oct_ptr=jnp.zeros((R,), jnp.int32),
        t=hit_near[:, 0],
        exp_step=jnp.ones((R,)),
        march_step=jnp.zeros((R,)),
        first=jnp.ones((R,), bool),
        n_out=jnp.zeros((R,), jnp.int32),
        advance=jnp.zeros((R,), bool),
        done=n_hits <= 0,
        out_t=jnp.zeros((R, max_s)),
        out_dt=jnp.zeros((R, max_s)),
        out_node=jnp.full((R, max_s), -1, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return jnp.logical_and(jnp.any(~s["done"]), s["it"] < max_iters)

    def body(s):
        t, ptr = s["t"], s["oct_ptr"]
        done, adv, first = s["done"], s["advance"], s["first"]
        n_out = s["n_out"]

        ptr_c = jnp.minimum(ptr, H - 1)
        node = hit_idx[rows, ptr_c]
        cur_far = hit_far[rows, ptr_c]
        cur_near = hit_near[rows, ptr_c]

        # ---------- EMIT branch: evaluate warp Jacobian, maybe emit sample
        tr = jnp.maximum(tree.trans_idx[jnp.maximum(node, 0)], 0)
        xyz = rays_o + rays_d * t[:, None]
        m_rows, w_rows = _warp_rows(tree, tr)
        pnorm = warp_jac_dir(m_rows, w_rows, xyz, rays_d) + 1e-6
        radius = jnp.linalg.norm(rays_o - tree.t_center[tr], axis=-1) / tree.t_dis[tr]
        radius_clip = jnp.maximum(radius, 1.0)
        step_noise = noise[rows + n_out]
        exp_step_new = sample_l * step_noise / pnorm
        if scale_by_dis:
            exp_step_new = exp_step_new * radius_clip
        emit_mask = (~done) & (~adv) & (~first) & (n_out < max_s)
        slot = jnp.minimum(n_out, max_s - 1)
        out_t = s["out_t"].at[rows, slot].set(
            jnp.where(emit_mask, t, s["out_t"][rows, slot]))
        out_dt = s["out_dt"].at[rows, slot].set(
            jnp.where(emit_mask, exp_step_new * pnorm, s["out_dt"][rows, slot]))
        out_node = s["out_node"].at[rows, slot].set(
            jnp.where(emit_mask, node, s["out_node"][rows, slot]))
        n_out = n_out + emit_mask.astype(jnp.int32)

        # ---------- ADVANCE branch: move to next hit, re-phase the step
        ptr_a = ptr + 1
        ptr_ac = jnp.minimum(ptr_a, H - 1)
        a_near = hit_near[rows, ptr_ac]
        a_far = hit_far[rows, ptr_ac]
        exp_step = jnp.where(adv, s["exp_step"], exp_step_new)
        ex_steps = jnp.ceil(jnp.maximum((a_near - t) / exp_step, 1.0))
        adv_step = exp_step * ex_steps

        in_emit = (~done) & (~adv)
        in_adv = (~done) & adv

        # EMIT result: either t += step (stay) or switch to ADVANCE
        emit_fits = t + exp_step_new <= cur_far
        # ADVANCE result: ptr++, maybe done, else check fit
        adv_exhausted = ptr_a >= n_hits
        adv_fits = t + adv_step <= a_far

        new_done = done | (in_adv & adv_exhausted) | \
            (in_emit & (n_out >= max_s))
        new_ptr = jnp.where(in_adv, ptr_a, ptr)
        new_t = jnp.where(in_emit & emit_fits, t + exp_step_new,
                          jnp.where(in_adv & (~adv_exhausted) & adv_fits,
                                    t + adv_step, t))
        new_adv = jnp.where(in_emit, ~emit_fits,
                            jnp.where(in_adv, (~adv_exhausted) & (~adv_fits), adv))
        new_exp = jnp.where(in_emit, exp_step_new, s["exp_step"])
        # `first` clears after the first EMIT evaluation (the reference skips
        # emitting the very first point: it has no step randomness)
        new_first = jnp.where(in_emit, False, first)

        return dict(oct_ptr=new_ptr, t=new_t, exp_step=new_exp,
                    march_step=adv_step, first=new_first, n_out=n_out,
                    advance=new_adv, done=new_done,
                    out_t=out_t, out_dt=out_dt, out_node=out_node,
                    it=s["it"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    return out["out_t"], out["out_dt"], out["out_node"], out["n_out"], first_oct


@partial(jax.jit, static_argnames=("max_s", "scale_by_dis"))
def ray_march_parallel(tree: DeviceTree, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       hit_idx, hit_near, hit_far, n_hits,
                       jitter: jnp.ndarray, fineness: jnp.ndarray,
                       sample_l: float, scale_by_dis: bool, max_s: int):
    """Fully parallel ray marching: no while_loop at all.

    The reference's RayMarchKernel (PersSampler.cu:189-314) steps each ray
    sequentially because dt depends on the warp Jacobian at the current
    point. On TPU that lockstep loop costs ~max_s tiny fused iterations; this
    redesign evaluates the Jacobian ONCE per (ray, hit-interval) at the
    interval's entry (leaves are small, J varies smoothly inside one leaf)
    and replaces the sequential noise random-walk with stratified
    jittered-grid sampling (same expected density):

      per hit h:  step_h = sample_l * fineness / |J(entry) d|
                  n_h    = floor((far_h - near_h) / step_h)
      sample k of hit h:  t = near_h + (k + u) * step_h,  u in (0, 1]

    Slots map to hits with two fused compare-weighted reductions over the
    hit axis (no [R, max_s, H] tensor is materialized — XLA input-fuses the
    broadcasts into the reduces).

    jitter: [R, max_s] in (0, 1] (all-ones for eval: t = near + (k+1)*step,
    the reference's noise==1 spacing).
    Returns the same dense buffers as ``ray_march``:
      out_t [R, max_s], out_dt [R, max_s] (warp-space dt = sample_l *
      fineness [* radius_clip]), out_node [R, max_s] i32, n_samples [R],
      first_oct_dis [R].
    """
    R, H = hit_idx.shape
    first_oct = jnp.where(n_hits > 0, hit_near[:, 0], 1e9)

    valid_hit = jnp.arange(H, dtype=jnp.int32)[None, :] < n_hits[:, None]
    node_c = jnp.maximum(hit_idx, 0)
    tr = jnp.maximum(tree.trans_idx[node_c.reshape(-1)], 0)       # [R*H]

    # entry-point warp Jacobian per (ray, hit)
    o_rep = jnp.repeat(rays_o, H, axis=0)
    d_rep = jnp.repeat(rays_d, H, axis=0)
    xyz = o_rep + d_rep * hit_near.reshape(-1)[:, None]
    m_rows, w_rows = _warp_rows(tree, tr)
    pnorm = warp_jac_dir(m_rows, w_rows, xyz, d_rep) + 1e-6        # [R*H]
    dt_warp = sample_l * fineness * jnp.ones_like(pnorm)
    if scale_by_dis:
        radius = jnp.linalg.norm(o_rep - tree.t_center[tr], axis=-1) / \
            tree.t_dis[tr]
        dt_warp = dt_warp * jnp.maximum(radius, 1.0)
    step = (dt_warp / pnorm).reshape(R, H)                         # world
    dt_warp = dt_warp.reshape(R, H)

    # Invalid hit slots (>= n_hits) evaluate the warp at the camera origin
    # through the root's clamped trans and can yield nan/inf pnorm; any
    # non-finite per-hit value would poison EVERY slot of the ray inside
    # slot_field (nan * 0-indicator = nan), so zero them before reducing.
    good = valid_hit & jnp.isfinite(step) & (step > 0)
    step = jnp.where(good, step, 0.0)
    dt_warp = jnp.where(good, dt_warp, 0.0)

    span = jnp.maximum(hit_far - hit_near, 0.0)
    n_steps = jnp.where(good,
                        jnp.floor(span / jnp.maximum(step, 1e-12)), 0.0)
    n_steps = jnp.minimum(n_steps, float(max_s)).astype(jnp.int32)

    ends = jnp.cumsum(n_steps, axis=1)                             # [R, H]
    starts = ends - n_steps
    total = ends[:, -1]
    n_samples = jnp.minimum(total, max_s)

    slots = jnp.arange(max_s, dtype=jnp.int32)                     # [S]

    def slot_field(f):
        """f [R, H] -> per-slot value [R, S] of the hit containing each
        slot: sum_h f * (1[s < end_h] - 1[s < start_h]). Fused reduces."""
        lt_end = slots[None, None, :] < ends[:, :, None]
        lt_start = slots[None, None, :] < starts[:, :, None]
        contrib = f[:, :, None] * (lt_end.astype(f.dtype)
                                   - lt_start.astype(f.dtype))
        return contrib.sum(axis=1)

    near_s = slot_field(hit_near)
    step_s = slot_field(step)
    start_s = slot_field(starts.astype(jnp.float32))
    dt_s = slot_field(dt_warp)
    node_s = slot_field(hit_idx.astype(jnp.float32))  # ids < 2^24: exact

    valid_s = slots[None, :] < n_samples[:, None]
    k_s = slots[None, :].astype(jnp.float32) - start_s
    out_t = near_s + (k_s + jitter) * step_s
    out_t = jnp.where(valid_s, out_t, 0.0)
    out_dt = jnp.where(valid_s, dt_s, 0.0)
    out_node = jnp.where(valid_s, node_s.astype(jnp.int32), -1)
    # barrier: the slot_field indicator-reductions must materialize HERE —
    # otherwise XLA fuses them into the downstream compaction gathers and
    # re-executes the [R, H, S] reduction once per consumer (the
    # compactA+warp phase measured 80 ms instead of ~25 ms without this)
    return jax.lax.optimization_barrier(
        (out_t, out_dt, out_node, n_samples, first_oct))


# --------------------------------------------------------------- edge samples

def sample_edges(tree: DeviceTree, key: jax.Array, n_pts: int):
    """Random points on leaf-face adjacencies, warped into both neighbor
    frames (GetEdgeSamplesKernel, PersSampler.cu:436-473).
    Returns (pts [n_pts, 2, 3] warp coords, trans idx [n_pts, 2])."""
    k1, k2 = jax.random.split(key)
    e = jax.random.randint(k1, (n_pts,), 0, jnp.maximum(tree.n_edges, 1))
    coord = jax.random.uniform(k2, (n_pts, 2)) * 2.0 - 1.0
    world = tree.edge_center[e] + tree.edge_dir0[e] * coord[:, :1] + \
        tree.edge_dir1[e] * coord[:, 1:]
    ta = tree.edge_t[e, 0]
    tb = tree.edge_t[e, 1]
    pa = apply_warp(tree, ta, world)
    pb = apply_warp(tree, tb, world)
    return jnp.stack([pa, pb], axis=1), jnp.stack([ta, tb], axis=1)


# ---------------------------------------------------------- occupancy update

def compute_occupancy_adders(tree: DeviceTree, node_idx: jnp.ndarray,
                             ray_id: jnp.ndarray, weights: jnp.ndarray,
                             alphas: jnp.ndarray, n_rays: int) -> dict:
    """Per-batch occupancy vote tensors (MarkVistNodeKernel,
    PersSampler.cu:475-534).

    node_idx/ray_id: [cap] flat sample buffer (padding: ray_id == n_rays,
    node_idx == -1). weights/alphas: pre-filter per-sample values.

    Returns max-combinable [n_nodes] arrays (adder_w, adder_a, mark,
    visit_max) — data-parallel shards combine them with lax.pmax before
    ``apply_occupancy_adders`` (the reference's atomicMax semantics).
    """
    from ..ops.segment import segment_max

    n_nodes = tree.trans_idx.shape[0]
    valid = (ray_id < n_rays) & (node_idx >= 0)
    rid = jnp.where(valid, ray_id, n_rays)
    nid = jnp.where(valid, node_idx, n_nodes)

    w = jnp.where(valid, weights, 0.0)
    a = jnp.where(valid, alphas, 0.0)
    ray_max_w = segment_max(w, rid, n_rays)
    ray_max_a = segment_max(a, rid, n_rays)
    thres_w = jnp.minimum(ray_max_w * REL_WEIGHT_THRES, ABS_WEIGHT_THRES)
    thres_a = jnp.minimum(ray_max_a * REL_ALPHA_THRES, ABS_ALPHA_THRES)
    rid_c = jnp.minimum(rid, n_rays - 1)
    vote_w = valid & (w > thres_w[rid_c])
    vote_a = valid & (a > thres_a[rid_c])

    adder_w = jnp.full((n_nodes + 1,), -1, jnp.int32)
    adder_w = adder_w.at[nid].max(jnp.where(vote_w, OCC_WEIGHT_BASE, -1))
    adder_a = jnp.full((n_nodes + 1,), -1, jnp.int32)
    adder_a = adder_a.at[nid].max(jnp.where(vote_a, OCC_ALPHA_BASE, -1))
    mark = jnp.zeros((n_nodes + 1,), jnp.int32).at[nid].max(valid.astype(jnp.int32))

    # per-(ray, node) run lengths -> visit_cnt (atomicMax in reference)
    prev_n = jnp.concatenate([jnp.full((1,), -2, nid.dtype), nid[:-1]])
    prev_r = jnp.concatenate([jnp.full((1,), -2, rid.dtype), rid[:-1]])
    run_first = (nid != prev_n) | (rid != prev_r)
    run_id = jnp.cumsum(run_first.astype(jnp.int32)) - 1
    cap = node_idx.shape[0]
    run_len = jax.ops.segment_sum(valid.astype(jnp.int32), run_id,
                                  num_segments=cap, indices_are_sorted=True)
    per_sample_len = run_len[run_id]
    visit_max = jnp.zeros((n_nodes + 1,), jnp.int32)
    visit_max = visit_max.at[jnp.where(valid & run_first, nid, n_nodes)].max(per_sample_len)

    return dict(adder_w=adder_w[:-1], adder_a=adder_a[:-1], mark=mark[:-1],
                visit_max=visit_max[:-1])


def apply_occupancy_adders(tree: DeviceTree, occ: dict) -> DeviceTree:
    """Fold vote tensors into the hysteresis counters and cull dead nodes
    (UpdateOctNodes host formulas + MarkInvalidNodes,
    PersSampler.cu:536-615)."""
    adder_w, adder_a = occ["adder_w"], occ["adder_a"]
    mark = occ["mark"]
    occ_w = (adder_w > 0).astype(jnp.int32)
    wstats = jnp.maximum(tree.weight_stats, occ_w * adder_w)
    wstats = wstats + mark * (1 - occ_w) * adder_w
    wstats = jnp.clip(wstats, -100, 1 << 20)
    occ_a = (adder_a > 0).astype(jnp.int32)
    astats = jnp.maximum(tree.alpha_stats, occ_a * adder_a)
    astats = astats + mark * (1 - occ_a) * adder_a
    astats = jnp.clip(astats, -100, 1 << 20)

    trans_idx = jnp.where((wstats < 0) | (astats < 0), -1, tree.trans_idx)
    visit_cnt = jnp.maximum(tree.visit_cnt, occ["visit_max"])
    # mirror culling into the packed traversal row (lane 5 = trans_idx)
    pack = tree.pack.at[:, 5].set(trans_idx.astype(jnp.float32))

    return tree._replace(weight_stats=wstats, alpha_stats=astats,
                         visit_cnt=visit_cnt, trans_idx=trans_idx, pack=pack)


def update_occupancy(tree: DeviceTree, node_idx: jnp.ndarray,
                     ray_id: jnp.ndarray, weights: jnp.ndarray,
                     alphas: jnp.ndarray, n_rays: int) -> DeviceTree:
    """Single-shard convenience: compute + apply in one go."""
    occ = compute_occupancy_adders(tree, node_idx, ray_id, weights, alphas, n_rays)
    return apply_occupancy_adders(tree, occ)
