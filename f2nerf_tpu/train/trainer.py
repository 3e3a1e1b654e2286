"""Training driver: the ExpRunner equivalent (reference ExpRunner.cpp).

One jitted ``train_step`` per ray-batch bucket runs the full pipeline:
random ray batch -> render (sample/prefilter/field/shader/composite) ->
losses -> grads -> NaN-guarded Adam -> occupancy update. The host loop
handles schedules, the adaptive batch-size controller, octree maintenance
at milestones, logging, and checkpoints.

Losses (ExpRunner.cpp:96-118):
  color: mean sqrt((pred-gt)^2 + 1e-4)       (charbonnier)
  disparity: mean disp^2 * disp_loss_weight
  tv: mean (edge_a - edge_b)^2 * tv_loss_weight
  var: mean sqrt(WeightVar + 1e-2) * scheduled weight

Optimizer (Hash3DAnchored.cpp:124-150, SHShader.cpp:44-56,
Renderer.cpp:238-258): Adam betas (0.9, 0.99), eps 1e-15; weight decay
1e-6 on MLPs and the appearance embedding, none on the feature pool; decay
added to the gradient before the moment update (torch semantics). The
reference's NaN skip (ExpRunner.cpp:131-137, fp16 loss-scale underflow) is
kept as a cheap all-finite guard even though bf16/f32 rarely needs it.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import dataset as ds
from ..fields import hash_block as hbk
from ..fields import hash_encoding as he
from ..fields.mlp import init_mlp
from ..ops.activations import weight_var
from ..render.renderer import RenderStatics, render
from ..sampler import device as dv
from ..sampler import octree as oc
from . import schedules

ADAM_KW = dict(b1=0.9, b2=0.99, eps=1e-15)
WEIGHT_DECAY = 1e-6

# batch-size buckets: ~sqrt(2) spacing keeps recompiles bounded while
# tracking the reference's adaptive ray count (ExpRunner.cpp:86)
BUCKETS = [512, 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192,
           12288, 16384, 24576, 32768]


def pick_bucket(n: float) -> int:
    for b in reversed(BUCKETS):
        if n >= b:
            return b
    return BUCKETS[0]


def pick_bucket_hysteresis(want: float, cur: int | None) -> int:
    """Bucket pick with a 5% dead band around the current bucket.

    When the meaningful-samples EMA sits right at a bucket boundary the raw
    pick flips every few steps (observed 2048<->3072 thrash on fox at
    meaningful/ray ~85), alternating between two compiled chunks. Only
    leave `cur` once `want` clears the boundary by 5% in the direction of
    travel. 5%, not the original 10%: at the fox steady state (meaningful
    ~20/ray -> want ~13107, the reference's ~13k-ray operating point,
    ExpRunner.cpp:86) a 10% band pinned the controller at 8192 forever
    (13107 < 1.1 * 12288), costing ~35% of the steady-state batch; the up
    (1.05 * next) and down (0.95 * cur) thresholds can never overlap across
    a ~1.4x-spaced bucket ladder, so flapping stays impossible."""
    b = pick_bucket(want)
    if cur is not None and b != cur:
        if b > cur:
            # the band guards the first boundary above cur, so a decisive
            # multi-bucket jump still lands on the raw pick
            nxt = next((x for x in BUCKETS if x > cur), b)
            if want < 1.05 * nxt:
                b = cur
        elif want > 0.95 * cur:
            b = cur
    return b


def max_s_for(n_rays: int, pts_batch: int) -> int:
    """Per-ray sample cap for a bucket: bounded dense-buffer footprint.

    Floored at 512: per-ray sample need is a property of the marcher
    (sample_l, fineness decay, scene span — the reference statically allows
    1024 samples/ray regardless of batch, PersSampler.cu:8-9), NOT of the
    ray count. The previous 4*pts_batch/n_rays formula shrank the cap to
    256 when the controller reached the 4096-ray bucket mid fineness-decay
    on fox, truncating every ray's far geometry (train PSNR collapsed
    21.8 -> 14.0 at iter 5950 of the r4 full run; Samples EMA pinned at
    exactly max_s/2). The memory bound belongs to the flat caps (_caps),
    not to per-ray depth."""
    v = 4 * pts_batch // n_rays
    p = 512
    while p < v and p < 1024:
        p *= 2
    return p


def init_params(key: jax.Array, cfg: dict, n_images: int, n_volumes: int):
    """Trainable params + fixed buffers (field/shader/app_emb init per
    Hash3DAnchored.cpp:19-82, SHShader.cpp:10-21, Renderer.cpp:38-39)."""
    fcfg, scfg = cfg["field"], cfg["shader"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ftype = str(fcfg.get("type", "HashBlock"))
    if ftype == "HashBlock":
        feat_pool, prim_pool, bias_pool = hbk.init_block_state(
            k1, int(fcfg["log2_table_size"]), n_volumes,
            bool(fcfg["rand_bias"]))
    else:
        feat_pool, prim_pool, bias_pool = he.init_hash_state(
            k1, int(fcfg["log2_table_size"]), n_volumes,
            bool(fcfg["rand_bias"]))
    params = dict(
        feat_pool=feat_pool,
        field_mlp=init_mlp(k2, he.N_LEVELS * he.N_CHANNELS,
                           int(fcfg["mlp_out_dim"]), int(fcfg["mlp_hidden_dim"]),
                           int(fcfg["n_hidden_layers"])),
        shader_mlp=init_mlp(k3, int(scfg["d_in"]), int(scfg["d_out"]),
                            int(scfg["d_hidden"]), int(scfg["n_hiddens"])),
        app_emb=jax.random.normal(k4, (n_images, 16)) * 0.1,
    )
    consts = dict(prim_pool=prim_pool, bias_pool=bias_pool)
    return params, consts


def make_optimizer():
    def mask_decay(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not (path and getattr(path[0], "key", None) == "feat_pool"),
            params)

    return optax.chain(
        optax.masked(optax.add_decayed_weights(WEIGHT_DECAY), mask_decay),
        optax.scale_by_adam(**ADAM_KW),
    )


def grow_hit_cap(hit_cap: int, limit: int, ema_oct: float) -> int:
    """Traversal hit capacity: grow (never shrink — recompile hysteresis)
    while the oct-hits EMA approaches the cap, up to the configured
    max_oct_intersect_per_ray. The reference allocates its 1024 bound up
    front and CHECK-crashes on overflow (PersSampler.cu:8-9,330-337);
    here capacity adapts and observed truncation also doubles it
    (_ingest_aux)."""
    while hit_cap < limit and ema_oct > 0.75 * hit_cap:
        hit_cap = min(2 * hit_cap, limit)
    return hit_cap


def pow2ceil(x: float) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def cap_bucket(x: float) -> int:
    """Round up to quarter-power-of-two granularity (1, 1.25, 1.5, 1.75
    times a power of two): bounds padding waste at ~25% while keeping the
    jit-cache churn low."""
    p = max(pow2ceil(x) // 2, 4)
    for mult in (4, 5, 6, 7, 8):
        if p * mult // 4 >= x:
            return p * mult // 4
    return 2 * p


def flat_caps(n_rays: int, max_s: int, pts_local: int,
              ema_sampled: float, ema_meaningful: float,
              prev: tuple | None, lo: int, cap1_mult: int = 16):
    """EMA-driven flat-buffer capacities for one ray bucket.

    cap1 (the dense pre-prefilter buffer) is bounded only by the static
    worst case ``n_rays * max_s``: raw per-ray sample demand is a marcher
    property (sample_l, fineness, scene span), not a function of the point
    budget. An earlier ``2 * pts_batch`` ceiling pinned cap1 at 524,288 on
    fox: when the controller reached the 3072-ray bucket mid fineness-decay
    (~175 raw samples/ray wanted vs 524288/3072 = 170.7 allowed), every
    ray's far tail was truncated and train PSNR collapsed 30.9 -> 23.5 in
    ~700 iters — and because ``n_sampled`` is measured AFTER truncation,
    the demand EMA could never exceed cap1/n_rays, deadlocking the cap at
    the ceiling (the same cliff took the first full run from 28.7 to 16.9:
    its Samples EMA pinned at exactly 524288/4096 = 128). The reference
    has no flat cap at all — it allocates exact ragged buffers per step
    (PersSampler.cu:353-405).

    cap2 (the post-compact field/backward budget) stays bounded by
    ``pts_local``: that is the actual pts_batch_size training contract.

    ``prev`` (the memoized caps) is kept while it still fits with < 2x
    waste — every fresh (cap1, cap2) pair is a fresh jit key, and a step
    compile costs 30-45 s through the TPU tunnel.

    ``cap1_mult`` bounds cap1 absolutely at cap1_mult * pts_local: with no
    ceiling at all, pathological demand (~1.3 * demand * n_rays; worst case
    n_rays * max_s = 16.7M points at the 32768 bucket) could OOM the dense
    stage-A buffer + prefilter field eval. Demand above the ceiling now
    degrades OBSERVABLY (a warning + the overflow_a/TravTrunc stats)
    instead of unboundedly; the deadlock the old 2x ceiling caused cannot
    recur because the demand EMA is measured pre-truncation
    (overflow_a is added back in _ingest_aux).

    The default 16 is calibrated so the ceiling NEVER binds below the
    16384-ray bucket (there ``n_rays * max_s == 16 * pts_local`` exactly,
    since max_s floors at 512): behavior is identical to the pre-ceiling
    code in every regime observed on fox, while the 32768-ray worst case
    is still bounded 4x tighter (4.2M vs 16.7M points). An 8x default
    regressed the fox-240 gate: with the test's shrunk pts_batch (16384)
    the ceiling (131072) halved the dense buffer below early-fineness
    demand (~340k) and silently truncated every ray's far tail."""
    ceil_abs = max(cap1_mult * pts_local, lo)
    hi1 = min(n_rays * max_s, ceil_abs)
    raw_need1 = 1.3 * ema_sampled * n_rays
    need1 = float(np.clip(raw_need1, lo, hi1))
    need2 = float(np.clip(1.25 * ema_meaningful * n_rays, lo,
                          min(hi1, pts_local)))
    if prev and need1 <= prev[0] <= 2.0 * need1 \
            and need2 <= prev[1] <= 2.0 * need2:
        return prev
    # warn only on an actual cap rebuild (not every memoized call), and only
    # when the ABSOLUTE ceiling (not the natural n_rays*max_s bound) is what
    # truncates demand
    if raw_need1 > ceil_abs and ceil_abs < n_rays * max_s:
        print(f"[flat_caps] WARNING: sample demand {raw_need1:.0f} exceeds "
              f"the cap1 ceiling {ceil_abs} ({cap1_mult}x pts_batch); the "
              f"dense buffer will truncate observably (overflow_a stat).",
              flush=True)
    if ema_meaningful * n_rays > 1.5 * pts_local:
        # mild (<~25%) cap2 overshoot at bucket transitions is the designed
        # contract (the controller resizes n_rays next step); demand 1.5x
        # past the budget means the contract CANNOT be met at this bucket —
        # typically the 512-ray floor x per-ray demand exceeds a shrunk
        # pts_batch, and the grad pass then silently drops most geometry
        # (the root cause of the mis-calibrated fox-240 canary: 512 floor
        # x ~110 meaningful/ray vs pts_batch 16384 dropped 60% of every
        # step's samples, pinning training at ~10 dB for three rounds).
        print(f"[flat_caps] WARNING: meaningful-sample demand "
              f"{ema_meaningful * n_rays:.0f} far exceeds pts_batch "
              f"{pts_local} at the {n_rays}-ray bucket; grad-pass samples "
              f"will be dropped (overflow_b / GradTrunc). "
              f"Raise train.pts_batch_size.", flush=True)
    cap1 = int(min(cap_bucket(need1), hi1))
    cap2 = int(min(cap_bucket(need2), cap1, pts_local))
    return cap1, cap2


def render_statics(cfg: dict, n_rays: int, global_near: float,
                   train: bool, max_s: int | None = None,
                   cap1: int | None = None, cap2: int | None = None,
                   max_hits: int | None = None) -> RenderStatics:
    t, p, r, f, s = (cfg["train"], cfg["pts_sampler"], cfg["renderer"],
                     cfg["field"], cfg["shader"])
    pts_batch = int(t["pts_batch_size"])
    if max_s is None:
        max_s = max_s_for(n_rays, pts_batch)
    if cap1 is None:
        cap1 = min(n_rays * max_s, 2 * pts_batch)
    if cap2 is None:
        cap2 = min(cap1, pts_batch)
    if max_hits is None:
        # starting bucket; the Trainer grows it from the oct-hits EMA and on
        # observed truncation up to the configured bound (the reference
        # allocates MAX_OCT_INTERSECT_PER_RAY=1024 up front and CHECK-crashes
        # on overflow, PersSampler.cu:8-9,330-337 — here capacity adapts)
        max_hits = min(int(p["max_oct_intersect_per_ray"]), 64)
    return RenderStatics(
        max_hits=max_hits,
        max_s=max_s,
        cap1=cap1,
        cap2=cap2,
        n_edge=8192,
        log2_table_size=int(f["log2_table_size"]),
        field_type=str(f.get("type", "HashBlock")),
        sh_degree=int(s["degree"]),
        sample_l=float(p["sample_l"]),
        march_mode=str(p.get("march_mode", "parallel")),
        # GetSamples ignores per-ray dataset bounds and uses the sampler's
        # configured near (PersSampler.cu:322-325, PersSampler.cpp:678)
        global_near=float(p["near"]),
        scale_by_dis=bool(p["scale_by_dis"]),
        use_app_emb=bool(r["use_app_emb"]),
        bg_mode=str(r["bg_color"]),
        train=train,
    )


def compute_losses(result: dict, gt: jnp.ndarray, n_rays: int,
                   weights_cfg: dict, runtime: dict):
    pred = result["colors"]
    color_loss = jnp.mean(jnp.sqrt((pred - gt) ** 2 + 1e-4))
    disp_loss = jnp.mean(result["disparity"] ** 2)
    ef = result["edge_feats"]
    tv_loss = jnp.mean((ef[:, 0, :] - ef[:, 1, :]) ** 2) if ef is not None else 0.0
    var = weight_var(result["weights"], result["ray_id"], result["i_local"], n_rays)
    var_loss = jnp.mean(jnp.sqrt(var + 1e-2))
    loss = (color_loss
            + var_loss * runtime["var_loss_weight"]
            + disp_loss * weights_cfg["disp_loss_weight"]
            + tv_loss * weights_cfg["tv_loss_weight"])
    mse = jnp.mean((pred - gt) ** 2)
    return loss, dict(loss=loss, color_loss=color_loss, disp_loss=disp_loss,
                      tv_loss=tv_loss, var_loss=var_loss, mse=mse)


def make_core(cfg: dict, statics: RenderStatics, height: int, width: int,
              mesh=None):
    """The per-iteration step body shared by the single-step, chunked-scan,
    and SPMD paths: render -> losses -> grads -> (pmean) -> NaN-guarded
    Adam -> occupancy fold. Returns core(params, opt_state, tree, consts,
    data, key, runtime, host_batch, n_local)."""
    tcfg = cfg["train"]
    loss_w = dict(disp_loss_weight=float(tcfg["disp_loss_weight"]),
                  tv_loss_weight=float(tcfg["tv_loss_weight"]))
    tx = make_optimizer()
    fused = bool(tcfg.get("fused_adam", False))
    single_image = str(cfg["dataset"].get(
        "ray_sample_mode", "all_images")) == "single_image"
    # under a mesh, single_image picks one camera PER SHARD (a batch then
    # mixes n_shards images — the per-shard semantics stay the reference's)
    sampler = ds.sample_rays_single_image if single_image else ds.sample_rays

    def core(params, opt_state, tree, consts, data, key, runtime,
             host_batch, n_local):
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        k_rays, k_render = jax.random.split(key)
        if host_batch is None:
            rays_o, rays_d, bounds, gt, img_idx = sampler(
                data, k_rays, n_local, height, width)
        else:
            # data_at_gpu=false: pixels were gathered on host (native
            # multithreaded loader); rays still generated on device
            from ..core import camera as cam
            gt, img_idx, i, j = (host_batch["gt"], host_batch["img_idx"],
                                 host_batch["i"], host_batch["j"])
            rays_o, rays_d = cam.pixel_to_ray(
                data["poses"][img_idx], data["intri"][img_idx],
                data["dist"][img_idx], i + 0.5, j + 0.5)

        def loss_fn(p):
            result, occ = render(
                p, consts, tree, rays_o, rays_d, img_idx, k_render,
                runtime["fineness"], runtime["grad_progress"], statics)
            loss, aux = compute_losses(result, gt, n_local, loss_w, runtime)
            aux["stats"] = result["stats"]
            return loss, (aux, occ)

        grads, (aux, occ) = jax.grad(loss_fn, has_aux=True)(params)
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            occ = {k: jax.lax.pmax(v, "data") for k, v in occ.items()}
            # scalar metrics: losses averaged, count stats summed
            aux = dict(aux)
            stats = {k: (jax.lax.pmax(v, "data") if k == "max_oct_hits"
                         else jax.lax.psum(v, "data"))
                     for k, v in aux.pop("stats").items()}
            aux = {k: jax.lax.pmean(v, "data") for k, v in aux.items()}
            aux["stats"] = stats
        new_tree = dv.apply_occupancy_adders(tree, occ)

        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))

        def do_update(_):
            if fused:
                # one Pallas streaming pass over (p, m, v, g) for the pool
                # (ops/fused_adam.py); state layout stays the optax chain's
                from ..ops.fused_adam import apply_adam
                return apply_adam(params, opt_state, grads, runtime["lr"],
                                  weight_decay=WEIGHT_DECAY, **ADAM_KW)
            updates, new_opt = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(
                lambda u: -runtime["lr"] * u, updates)
            return optax.apply_updates(params, updates), new_opt

        def skip_update(_):
            return params, opt_state

        new_params, new_opt_state = jax.lax.cond(
            finite, do_update, skip_update, None)
        aux["grads_finite"] = finite
        return new_params, new_opt_state, new_tree, aux

    return core


def make_train_step(cfg: dict, statics: RenderStatics, height: int, width: int,
                    mesh=None):
    """Build the jitted train step for one ray-batch bucket.

    With ``mesh`` (a 1-D 'data' jax.sharding.Mesh) the SAME step body runs
    SPMD under shard_map: each shard samples rays from its own camera shard
    (key folded with the shard index), gradients are pmean'd over ICI,
    occupancy votes pmax'd, loss scalars pmean'd and count stats psum'd.
    ``n_rays`` is always the GLOBAL ray count; ``statics`` must be built for
    the per-shard count (n_rays // mesh size). The reference has no
    distributed layer (SURVEY.md §2.3) — this is the framework's own design.
    """
    core = make_core(cfg, statics, height, width, mesh=mesh)
    n_shards = 1 if mesh is None else int(mesh.devices.size)

    if mesh is None:
        @partial(jax.jit, static_argnames=("n_rays",), donate_argnums=(0, 1, 2))
        def step(params, opt_state, tree, consts, data, key, runtime, n_rays,
                 host_batch=None):
            return core(params, opt_state, tree, consts, data, key, runtime,
                        host_batch, n_rays)
        return step

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(jax.jit, static_argnames=("n_rays",), donate_argnums=(0, 1, 2))
    def step(params, opt_state, tree, consts, data, key, runtime, n_rays,
             host_batch=None):
        n_local = n_rays // n_shards
        data_spec = {k: P("data") if k in ("train_images", "train_ids")
                     else P() for k in data}
        in_specs = [P(), P(), P(), P(), data_spec, P(), P()]
        args = [params, opt_state, tree, consts, data, key, runtime]
        if host_batch is not None:
            in_specs.append({k: P("data") for k in host_batch})
            args.append(host_batch)
            fn = partial(core, n_local=n_local)
        else:
            fn = lambda *a: core(*a, host_batch=None, n_local=n_local)  # noqa: E731
        sm = shard_map(fn, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(P(), P(), P(), P()), check_vma=False)
        return sm(*args)

    return step


def make_train_chunk(cfg: dict, statics: RenderStatics, height: int,
                     width: int, chunk: int, mesh=None):
    """K = `chunk` train iterations fused into ONE jitted call via lax.scan.

    Through a high-latency host<->device link (the TPU tunnel bills ~45 ms
    per dispatch; probe_step_budget measured ~400 ms/step of host overhead
    unpipelined) per-iteration dispatch dominates the wall clock; the scan
    amortizes it K-fold. Per-iteration runtime scalars (LR/fineness/...)
    arrive as stacked [K] arrays; aux metrics come back stacked [K], so the
    host controller ingests the exact same per-iter series as the
    single-step path. The bucket, capacities, and tree shapes are fixed
    within a chunk (the Trainer aligns chunks to controller/milestone
    boundaries). The reference steps strictly one iteration at a time
    (ExpRunner.cpp:65-186); this is a TPU-first restructuring with identical
    training math.
    """
    core = make_core(cfg, statics, height, width, mesh=mesh)
    n_shards = 1 if mesh is None else int(mesh.devices.size)

    def scan_fn(params, opt_state, tree, consts, data, keys, runtimes,
                n_local):
        def body(carry, xs):
            p, o, t = carry
            key, runtime = xs
            p, o, t, aux = core(p, o, t, consts, data, key, runtime,
                                None, n_local)
            return (p, o, t), aux
        (p, o, t), auxs = jax.lax.scan(
            body, (params, opt_state, tree), (keys, runtimes))
        return p, o, t, auxs

    if mesh is None:
        @partial(jax.jit, static_argnames=("n_rays",), donate_argnums=(0, 1, 2))
        def step(params, opt_state, tree, consts, data, keys, runtimes,
                 n_rays):
            return scan_fn(params, opt_state, tree, consts, data, keys,
                           runtimes, n_rays)
        return step

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(jax.jit, static_argnames=("n_rays",), donate_argnums=(0, 1, 2))
    def step(params, opt_state, tree, consts, data, keys, runtimes, n_rays):
        n_local = n_rays // n_shards
        data_spec = {k: P("data") if k in ("train_images", "train_ids")
                     else P() for k in data}
        in_specs = (P(), P(), P(), P(), data_spec, P(), P())
        sm = shard_map(
            lambda *a: scan_fn(*a, n_local=n_local), mesh=mesh,
            in_specs=in_specs, out_specs=(P(), P(), P(), P()),
            check_vma=False)
        return sm(params, opt_state, tree, consts, data, keys, runtimes)

    return step


def make_render_fn(statics: RenderStatics):
    """Jitted no-grad chunk renderer for eval/vis (RenderWholeImage,
    ExpRunner.cpp:257-293). Also returns the per-chunk truncated-sample
    count so the caller can re-render saturated chunks at higher capacity."""

    @jax.jit
    def fn(params, consts, tree, rays_o, rays_d, fineness):
        result, _ = render(params, consts, tree, rays_o, rays_d,
                           jnp.zeros((rays_o.shape[0],), jnp.int32),
                           jax.random.PRNGKey(0), fineness,
                           jnp.asarray(1.0), statics)
        # truncation indicator: flat-buffer overflow OR any ray that hit the
        # dense per-ray cap (its tail samples were silently dropped)
        trunc = result["stats"]["overflow_a"] + result["stats"]["n_saturated"]
        return (result["colors"], result["disparity"],
                result["first_oct_dis"], trunc)

    return fn


def _path_keys(tree, prefix: str) -> list[str]:
    """Stable per-leaf npz keys derived from pytree paths (e.g.
    ``p:[0].mu['feat_pool']``), so an optax version bump or params-dict
    reorder loads by NAME instead of silently mis-assigning by position."""
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [prefix + ":" + jax.tree_util.keystr(p) for p, _ in paths]


def _named_flat(tree, prefix: str) -> dict:
    keys = _path_keys(tree, prefix)
    leaves = jax.tree_util.tree_leaves(tree)
    return {k: np.asarray(v) for k, v in zip(keys, leaves)}


def _named_unflatten(like, prefix: str, z) -> object:
    tdef = jax.tree_util.tree_structure(like)
    keys = _path_keys(like, prefix)
    if keys and keys[0] not in z:  # legacy position-keyed checkpoint
        keys = [f"{prefix}_{i}" for i in range(tdef.num_leaves)]
    return jax.tree_util.tree_unflatten(
        tdef, [jnp.asarray(z[k]) for k in keys])


class Trainer:
    """Host-side training orchestration (ExpRunner::Train)."""

    def __init__(self, cfg: dict, base_exp_dir: str, data_path: str,
                 seed: int = 2022, load_images: bool = True):
        self.cfg = cfg
        self.base_exp_dir = base_exp_dir
        os.makedirs(base_exp_dir, exist_ok=True)
        tcfg = cfg["train"]
        self.pts_batch = int(tcfg["pts_batch_size"])
        self.end_iter = int(tcfg["end_iter"])
        self.iter_step = 0

        self.dataset = ds.Dataset(data_path, cfg["dataset"], load_images=load_images)
        self.data_at_gpu = bool(cfg["dataset"].get("data_at_gpu", True))

        # data-parallel mesh: 'auto' (default) shards over all local devices
        # when more than one exists; 'off' forces single-device; an int pins
        # the mesh size. Reference has no distributed layer (SURVEY.md §2.3).
        dp_cfg = cfg["train"].get("data_parallel", "auto")
        if isinstance(dp_cfg, str):
            dp_cfg = dp_cfg.strip().lower()
        # bool check first: 1 == True, so an int pin of 1 must not read as
        # 'auto' (it means a single-shard mesh)
        if not isinstance(dp_cfg, bool) and isinstance(dp_cfg, int):
            want = int(dp_cfg)
        elif dp_cfg in ("auto", "on", None, True):  # YAML: on -> True
            want = len(jax.devices())
        elif dp_cfg in ("off", "none", False):      # YAML: off -> False
            want = 1
        else:
            want = int(dp_cfg)
        self.mesh = None
        self.n_shards = 1
        # multi-host (DCN): with `jax.distributed` initialized, the mesh
        # spans every process's devices and each process loads only its own
        # camera slice (SURVEY.md §2.3). All controller/host logic below
        # consumes only REPLICATED outputs (pmean'd aux, psum'd stats), so
        # every process walks identical bucket/cap schedules and compiles
        # identical jit keys — no cross-host control channel needed.
        self._multihost = jax.process_count() > 1
        if want > 1:
            from ..parallel import data_parallel as dpm
            if self._multihost:
                self.mesh = dpm.make_global_mesh()
            else:
                self.mesh = dpm.make_mesh(want)
            self.n_shards = int(self.mesh.devices.size)

        if self.mesh is not None and self._multihost:
            from ..parallel import data_parallel as dpm
            n_pad = len(self.dataset.train_set)
            if n_pad % self.n_shards:
                n_pad += self.n_shards - n_pad % self.n_shards
            per = n_pad // jax.process_count()
            rows = slice(jax.process_index() * per,
                         (jax.process_index() + 1) * per)
            local = self.dataset.device_arrays(n_shards=self.n_shards,
                                               process_rows=rows)
            self.data = dpm.shard_data_multihost(local, self.mesh)
        else:
            self.data = self.dataset.device_arrays(n_shards=self.n_shards)
            if self.mesh is not None:
                from ..parallel import data_parallel as dpm
                self.data = dpm.shard_data(self.data, self.mesh)
        if not self.data_at_gpu:
            # host data-loader mode: pixels gathered on host per batch
            # (native multithreaded path), only camera metadata on device
            self.data.pop("train_images", None)
            self._host_rng = np.random.default_rng(seed + 1)

        # octree over train cameras (PersSampler ctor, PersSampler.cpp:661-690)
        c2w, w2c, intri, bounds = self.dataset.train_arrays
        self.tree_host = oc.build_octree(c2w, w2c, intri, bounds,
                                         cfg["pts_sampler"], seed=seed)
        self.train_cams = (intri, w2c, bounds)
        self.n_volumes = self.tree_host.n_trans
        caps_cfg = cfg.get("capacity", {})
        # max_nodes 131072 crashed the r5full run at the iter-10000 fox
        # milestone (the final subdivision needs 255,892 nodes — no earlier
        # round ever crossed 10000 to see it). 393216 covers that with 1.5x
        # headroom; the packed node table at this size is ~100 MB of HBM.
        self.max_nodes = int(caps_cfg.get("max_nodes", 393216))
        self.max_trans = int(caps_cfg.get("max_trans", 32768))
        self.max_edges = int(caps_cfg.get("max_edges", 262144))
        self.tree = dv.to_device_tree(self.tree_host, self.max_nodes,
                                      self.max_trans, self.max_edges)

        key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(key)
        self.params, self.consts = init_params(
            k_init, cfg, self.dataset.n_images, max(self.n_volumes, 1))
        self.opt_state = make_optimizer().init(self.params)
        self._replicate_state()

        self.compact_freq = int(cfg["pts_sampler"]["compact_freq"])
        # EMA seeds (GlobalDataPool.h:23-25)
        self.ema_sampled = 512.0
        self.ema_meaningful = 512.0
        self.ema_oct = 16.0
        # traversal hit-buffer capacity: starts small, grows from the
        # oct-hits EMA and doubles whenever a step reports truncated rays,
        # honoring max_oct_intersect_per_ray (the reference's hard 1024
        # bound, PersSampler.cu:8-9) instead of the old silent 64 clamp
        self.hit_cap_limit = int(cfg["pts_sampler"]["max_oct_intersect_per_ray"])
        self.hit_cap = min(64, self.hit_cap_limit)
        self.oct_max = 0.0   # observed per-step max hits/ray (see _ingest_aux)
        self.trunc_ema = 0.0
        # freeze_controller(): stop the batch-size/capacity EMAs so a timing
        # window sees no bucket switches (no recompiles) — used by bench.py
        self.controller_frozen = False
        self._cur_bucket: int | None = None
        self.sat_ema = 0.0
        self.psnr_smooth = -1.0
        self.mse_records: list[float] = []
        self._step_cache: dict[tuple, object] = {}
        self._cap_memo: dict[int, tuple] = {}
        self._pending: list[tuple] = []
        self.pipeline_depth = 3
        # multi-step scan chunking (train.step_chunk, default 10): K
        # iterations fused into one dispatch — host dispatch latency through
        # the TPU tunnel otherwise costs ~as much as the device compute.
        # Unavailable for the host data-loader path (per-iter host batches).
        self.chunk_size = int(tcfg.get("step_chunk", 10))
        if not self.data_at_gpu:
            self.chunk_size = 1

    # ------------------------------------------------------------------ steps

    def _replicate_state(self):
        """Pin params/opt/consts/tree to the mesh (replicated) so sharded
        steps see consistent placements. No-op without a mesh."""
        if self.mesh is None:
            return
        from ..parallel import data_parallel as dpm
        self.params = dpm.replicate(self.params, self.mesh)
        self.opt_state = dpm.replicate(self.opt_state, self.mesh)
        self.consts = dpm.replicate(self.consts, self.mesh)
        self.tree = dpm.replicate(self.tree, self.mesh)

    def _caps(self, n_rays: int, max_s: int):
        """EMA-driven flat-buffer capacities (see flat_caps): with static
        shapes we bucket to quarter-power-of-two sizes over the running
        sample counts, so padding waste stays < ~2x while jit caches stay
        warm."""
        lo = max(16384 // self.n_shards, 2048)
        pts_local = self.pts_batch // self.n_shards
        caps = flat_caps(n_rays, max_s, pts_local,
                         self.ema_sampled, self.ema_meaningful,
                         self._cap_memo.get(n_rays), lo,
                         cap1_mult=int(self.cfg.get("capacity", {})
                                       .get("cap1_mult", 16)))
        self._cap_memo[n_rays] = caps
        return caps

    def _get_step(self, n_rays: int, chunk: int = 1):
        """n_rays is the GLOBAL bucket; statics/capacities are built for the
        per-shard count (identical with no mesh). chunk > 1 returns the
        fused k-iteration scan step."""
        n_local = n_rays // self.n_shards
        max_s = max_s_for(n_local, self.pts_batch // self.n_shards)
        cap1, cap2 = self._caps(n_local, max_s)
        # Single-pass rendering trades the prefilter forward pass for a
        # larger backward: on current XLA/TPU the hash-grid scatter-add in
        # the backward costs ~3x a forward query, so the trade only pays
        # when culling keeps < ~25% — off by default (A/B measured on
        # ngp_fox: 4.8 s/iter two-pass vs 5.7 s/iter single-pass).
        single_pass = bool(self.cfg["train"].get("single_pass", False)) and \
            self.ema_meaningful > 0.9 * self.ema_sampled
        if single_pass:
            cap2 = cap1
        if not self.controller_frozen:
            self.hit_cap = grow_hit_cap(self.hit_cap, self.hit_cap_limit,
                                        self.ema_oct)
        key = (n_rays, cap1, cap2, single_pass, self.hit_cap, chunk)
        if key not in self._step_cache:
            st = render_statics(self.cfg, n_local, self.dataset.near,
                                train=True, max_s=max_s, cap1=cap1, cap2=cap2,
                                max_hits=self.hit_cap)
            st = st._replace(single_pass=single_pass)
            if chunk == 1:
                fn = make_train_step(self.cfg, st, self.dataset.height,
                                     self.dataset.width, mesh=self.mesh)
            else:
                fn = make_train_chunk(self.cfg, st, self.dataset.height,
                                      self.dataset.width, chunk,
                                      mesh=self.mesh)
            self._step_cache[key] = (fn, st)
        return self._step_cache[key]

    def cur_batch_size(self) -> int:
        want = self.pts_batch / max(self.ema_meaningful, 1.0)
        b = pick_bucket_hysteresis(want, self._cur_bucket)
        self._cur_bucket = b
        return max(b // self.n_shards, 1) * self.n_shards

    def freeze_controller(self, frozen: bool = True):
        """Pin the adaptive batch-size/capacity controller: EMAs stop
        updating, so the bucket (and the jit cache entry) stays fixed."""
        self.controller_frozen = frozen

    def _ingest_aux(self, n_rays: int, aux):
        """Fold one step's (device-side) aux into host EMAs/records."""
        stats = aux["stats"]
        if not self.controller_frozen:
            # demand = landed + overflowed: when the flat dense buffer
            # saturates, n_sampled alone is capped at cap1 and the EMA
            # (hence cap1 itself) could never grow out of saturation —
            # overflow_a counts exactly the samples the marcher produced
            # but the buffer dropped (see flat_caps)
            self.ema_sampled = 0.9 * self.ema_sampled + \
                0.1 * float(stats["n_sampled"] +
                            stats.get("overflow_a", 0.0)) / n_rays
            self.ema_meaningful = 0.9 * self.ema_meaningful + \
                0.1 * float(stats["n_meaningful"]) / n_rays
            self.ema_oct = 0.9 * self.ema_oct + \
                0.1 * float(stats["n_oct_hits"]) / n_rays
            trunc = float(stats.get("n_trav_truncated", 0.0))
            self.trunc_ema = 0.9 * self.trunc_ema + 0.1 * trunc
            # observed worst-case hits/ray: grow the hit buffer BEFORE any
            # ray truncates (the after-the-fact doubling below is only the
            # backstop; a mid-run recompile while training is degraded was
            # the r4 failure mode)
            self.oct_max = max(self.oct_max,
                               float(stats.get("max_oct_hits", 0.0)))
            if self.oct_max > 0.9 * self.hit_cap and \
                    self.hit_cap < self.hit_cap_limit:
                self.hit_cap = min(2 * self.hit_cap, self.hit_cap_limit)
            # fraction of rays whose dense sample buffer hit max_s: any
            # sustained value means truncated geometry (the iter-5950 cliff
            # would have shown ~1.0 here) — surfaced in the report line
            self.sat_ema = 0.9 * self.sat_ema + \
                0.1 * float(stats.get("n_saturated", 0.0)) / n_rays
            # fraction of MEANINGFUL samples the cap2/pts_batch bound
            # dropped from the grad pass. Sustained value = the config
            # cannot satisfy the pts_batch contract at the bucket floor
            # (512 rays x demand > pts_batch) and quality silently
            # collapses toward region-mean color — exactly how the
            # fox-240 canary sat at ~10 dB for three rounds while every
            # e2e stat looked healthy (BENCHMARKS.md round-5 root-cause)
            n_keep = max(float(stats.get("n_meaningful", 0.0)), 1.0)
            self.b_trunc_ema = 0.9 * getattr(self, "b_trunc_ema", 0.0) + \
                0.1 * float(stats.get("overflow_b", 0.0)) / n_keep
            if trunc > 0 and self.hit_cap < self.hit_cap_limit:
                # rays lost geometry to a full hit buffer: double capacity
                self.hit_cap = min(2 * self.hit_cap, self.hit_cap_limit)
        mse = float(aux["mse"])
        self.mse_records.append(mse)
        psnr = 20.0 * np.log10(1.0 / np.sqrt(max(mse, 1e-10)))
        self.psnr_smooth = psnr if self.psnr_smooth < 0 else \
            0.1 * psnr + 0.9 * self.psnr_smooth
        return dict(n_rays=n_rays, psnr=psnr,
                    **{k: float(v) for k, v in aux.items() if k != "stats"},
                    **{k: float(v) for k, v in stats.items()})

    def train_one(self, sync: bool = True):
        """One training iteration. With sync=False the aux fetch is deferred
        (dispatch pipelining hides the host<->device round trip; EMAs then
        lag by up to `pipeline_depth` steps, which only affects the
        batch-size controller, not training math)."""
        tcfg = self.cfg["train"]
        n_rays = self.cur_batch_size()
        step_fn, st = self._get_step(n_rays)
        runtime = dict(
            lr=jnp.asarray(schedules.learning_rate(self.iter_step, tcfg)),
            fineness=jnp.asarray(schedules.ray_march_fineness(self.iter_step, tcfg)),
            grad_progress=jnp.asarray(
                schedules.gradient_scaling_progress(self.iter_step, tcfg)),
            var_loss_weight=jnp.asarray(
                schedules.var_loss_weight(self.iter_step, tcfg)),
        )
        self.key, k = jax.random.split(self.key)
        host_batch = None
        if not self.data_at_gpu:
            host_batch = self._host_sample(n_rays)
        self.params, self.opt_state, self.tree, aux = step_fn(
            self.params, self.opt_state, self.tree, self.consts, self.data,
            k, runtime, n_rays, host_batch)

        self.iter_step += 1
        self._pending.append((n_rays, aux, 1))
        out = self._drain(sync)
        self.maybe_maintain_tree()
        return out

    def _drain(self, sync: bool):
        out = None
        while self._pending and (sync or len(self._pending) > self.pipeline_depth):
            n_rays, aux, k = self._pending.pop(0)
            aux = jax.device_get(aux)
            if k == 1:
                out = self._ingest_aux(n_rays, aux)
            else:
                for i in range(k):
                    a_i = jax.tree_util.tree_map(lambda x: x[i], aux)
                    out = self._ingest_aux(n_rays, a_i)
        return out

    def _chunk_k(self, limit: int | None = None) -> int:
        """Iterations safely fusable into one scan chunk from the current
        step: bounded by controller alignment, the next milestone/compaction
        boundary, end_iter, and the caller's cadence `limit`."""
        k = self.chunk_size
        s = self.iter_step
        if k <= 1 or s % k:
            return 1
        nxt = self.end_iter
        t = self.tree_host
        for m in t.milestones:
            if m > s:
                nxt = min(nxt, m)
        nxt = min(nxt, (s // self.compact_freq + 1) * self.compact_freq)
        if limit is not None:
            nxt = min(nxt, s + limit)
        return k if s + k <= nxt else 1

    def train_auto(self, sync: bool = True, limit: int | None = None):
        """One controller round: a fused chunk when boundaries allow it,
        otherwise a single step. Advances iter_step by the count actually
        run; returns the latest ingested per-iter metrics (None while
        pipelining). `limit` caps the chunk (the Runner passes the distance
        to its next report/vis/save cadence)."""
        k = self._chunk_k(limit)
        if k == 1:
            return self.train_one(sync=sync)
        return self.train_many(k, sync=sync)

    def train_many(self, k: int, sync: bool = True):
        """k fused iterations via the lax.scan chunk step (make_train_chunk);
        training math identical to k train_one calls."""
        tcfg = self.cfg["train"]
        n_rays = self.cur_batch_size()
        step_fn, st = self._get_step(n_rays, chunk=k)
        iters = np.arange(self.iter_step, self.iter_step + k)
        runtimes = dict(
            lr=jnp.asarray([schedules.learning_rate(int(i), tcfg)
                            for i in iters], jnp.float32),
            fineness=jnp.asarray([schedules.ray_march_fineness(int(i), tcfg)
                                  for i in iters], jnp.float32),
            grad_progress=jnp.asarray(
                [schedules.gradient_scaling_progress(int(i), tcfg)
                 for i in iters], jnp.float32),
            var_loss_weight=jnp.asarray(
                [schedules.var_loss_weight(int(i), tcfg)
                 for i in iters], jnp.float32),
        )
        self.key, k_base = jax.random.split(self.key)
        keys = jax.random.split(k_base, k)
        self.params, self.opt_state, self.tree, auxs = step_fn(
            self.params, self.opt_state, self.tree, self.consts, self.data,
            keys, runtimes, n_rays)
        self.iter_step += k
        self._pending.append((n_rays, auxs, k))
        out = self._drain(sync)
        self.maybe_maintain_tree()
        return out

    def maybe_maintain_tree(self):
        t = self.tree_host
        need_milestone = t.milestones and t.milestones[-1] <= self.iter_step
        need_compact = self.iter_step % self.compact_freq == 0
        if not (need_milestone or need_compact):
            return
        intri, w2c, bounds = self.train_cams
        self.tree_host = dv.sync_host_tree(self.tree_host, self.tree)
        self.tree_host, changed = oc.maintain(
            self.tree_host, self.iter_step, self.compact_freq, intri, w2c, bounds)
        if need_milestone and not self.controller_frozen:
            # 8-way subdivision halves leaf sides: worst-case hits/ray about
            # doubles. Pre-size the hit buffer from the observed max NOW (a
            # natural recompile boundary) so no mid-chunk truncation-driven
            # recompile degrades training later; decay oct_max so a stale
            # pre-milestone peak doesn't compound across milestones.
            want = pow2ceil(2.0 * max(self.oct_max, 1.0))
            self.hit_cap = min(max(self.hit_cap, want), self.hit_cap_limit)
            self.oct_max = self.oct_max * 0.5
        if changed:
            # grow device capacities with the host tree instead of asserting:
            # the iter-10000 fox milestone needs 255,892 nodes and crashed
            # the static 131072 cap (r5full, /tmp log .wedged.125428) — a
            # milestone is already a recompile boundary, so re-padding the
            # tree arrays here costs nothing extra
            self.max_nodes = max(self.max_nodes,
                                 pow2ceil(self.tree_host.n_nodes))
            self.max_trans = max(self.max_trans,
                                 pow2ceil(self.tree_host.n_trans))
            self.max_edges = max(self.max_edges,
                                 pow2ceil(self.tree_host.edge_t.shape[0]))
            self.tree = dv.to_device_tree(self.tree_host, self.max_nodes,
                                          self.max_trans, self.max_edges)
            if self.mesh is not None:
                from ..parallel import data_parallel as dpm
                self.tree = dpm.replicate(self.tree, self.mesh)

    def _host_sample(self, n_rays: int) -> dict:
        """Host-side ray-pixel sampling for data_at_gpu=false: random
        (camera, pixel) picks + multithreaded native gt gather."""
        rng = self._host_rng
        ts = self.dataset.train_set
        img_idx = ts[rng.integers(0, len(ts), n_rays)].astype(np.int32)
        i = rng.integers(0, self.dataset.height, n_rays).astype(np.int32)
        j = rng.integers(0, self.dataset.width, n_rays).astype(np.int32)
        from .. import native
        gt = None
        if native.available():
            gt = native.sample_pixels(self.dataset.images, img_idx, i, j)
        if gt is None:
            gt = self.dataset.images[img_idx, i, j].astype(np.float32) / 255.0
        return dict(gt=jnp.asarray(gt), img_idx=jnp.asarray(img_idx),
                    i=jnp.asarray(i, jnp.float32), j=jnp.asarray(j, jnp.float32))

    def reset(self):
        """Re-initialize field/shader params in place (config `reset` flag;
        Hash3DAnchored::Reset feat ~ U(-1e-2, 1e-2) + MLP re-init,
        Hash3DAnchored.cpp:152-155, SHShader.cpp:58-60)."""
        self.key, k1, k2, k3 = jax.random.split(self.key, 4)
        fcfg, scfg = self.cfg["field"], self.cfg["shader"]
        self.params["feat_pool"] = jax.random.uniform(
            k1, self.params["feat_pool"].shape, jnp.float32, -1e-2, 1e-2)
        self.params["field_mlp"] = init_mlp(
            k2, he.N_LEVELS * he.N_CHANNELS, int(fcfg["mlp_out_dim"]),
            int(fcfg["mlp_hidden_dim"]), int(fcfg["n_hidden_layers"]))
        self.params["shader_mlp"] = init_mlp(
            k3, int(scfg["d_in"]), int(scfg["d_out"]),
            int(scfg["d_hidden"]), int(scfg["n_hiddens"]))
        self.opt_state = make_optimizer().init(self.params)
        self._replicate_state()

    # ------------------------------------------------------------- checkpoints

    def save_checkpoint(self):
        # multi-host: state is bitwise replicated, so only process 0 writes
        # (all processes would race on a shared filesystem otherwise)
        if jax.process_index() != 0:
            return
        out_dir = os.path.join(self.base_exp_dir, "checkpoints",
                               f"{self.iter_step:08d}")
        os.makedirs(out_dir, exist_ok=True)
        self.tree_host = dv.sync_host_tree(self.tree_host, self.tree)
        flat_params = _named_flat(self.params, "p")
        flat_opt = _named_flat(self.opt_state, "o")
        flat_consts = _named_flat(self.consts, "c")
        t = self.tree_host
        np.savez(
            os.path.join(out_dir, "state.npz"),
            iter_step=self.iter_step,
            ema=np.array([self.ema_sampled, self.ema_meaningful, self.ema_oct]),
            milestones=np.asarray(t.milestones, np.int64),
            node_center=t.center, node_side=t.side, node_parent=t.parent,
            node_childs=t.childs, node_is_leaf=t.is_leaf,
            node_trans=t.trans_idx, node_wstat=t.weight_stats,
            node_astat=t.alpha_stats, node_visit=t.visit_cnt,
            w2xz=t.w2xz, weight=t.weight, t_center=t.t_center, t_dis=t.t_dis,
            edge_t=t.edge_t, edge_center=t.edge_center,
            edge_dir0=t.edge_dir0, edge_dir1=t.edge_dir1,
            side_len=t.side_len,
            **flat_params, **flat_opt, **flat_consts,
        )
        latest = os.path.join(self.base_exp_dir, "checkpoints", "latest")
        tmp = latest + ".tmp"
        if os.path.islink(tmp) or os.path.exists(tmp):
            os.remove(tmp)
        os.symlink(out_dir, tmp)
        os.replace(tmp, latest)

    def load_checkpoint(self, path: str | None = None):
        path = path or os.path.join(self.base_exp_dir, "checkpoints", "latest")
        z = np.load(os.path.join(path, "state.npz"))
        self.iter_step = int(z["iter_step"])
        self.ema_sampled, self.ema_meaningful, self.ema_oct = map(float, z["ema"])
        self.params = _named_unflatten(self.params, "p", z)
        self.opt_state = _named_unflatten(self.opt_state, "o", z)
        self.consts = _named_unflatten(self.consts, "c", z)
        self.tree_host = oc.OctreeHost(
            center=z["node_center"], side=z["node_side"],
            parent=z["node_parent"], childs=z["node_childs"],
            is_leaf=z["node_is_leaf"], trans_idx=z["node_trans"],
            weight_stats=z["node_wstat"], alpha_stats=z["node_astat"],
            visit_cnt=z["node_visit"], w2xz=z["w2xz"], weight=z["weight"],
            t_center=z["t_center"], t_dis=z["t_dis"], edge_t=z["edge_t"],
            edge_center=z["edge_center"], edge_dir0=z["edge_dir0"],
            edge_dir1=z["edge_dir1"], side_len=float(z["side_len"]),
            milestones=[int(m) for m in z["milestones"]],
        )
        # a late-milestone checkpoint can exceed the static capacity
        # defaults (same growth rule as maybe_maintain_tree)
        self.max_nodes = max(self.max_nodes, pow2ceil(self.tree_host.n_nodes))
        self.max_trans = max(self.max_trans, pow2ceil(self.tree_host.n_trans))
        self.max_edges = max(self.max_edges,
                             pow2ceil(self.tree_host.edge_t.shape[0]))
        self.tree = dv.to_device_tree(self.tree_host, self.max_nodes,
                                      self.max_trans, self.max_edges)
        self._replicate_state()

    # -------------------------------------------------------------- rendering

    def _eval_fn_for(self, chunk: int, max_s: int, cap1: int | None = None):
        """Eval renderer. With cap1 = chunk * max_s capacities are exact
        (flat-buffer overflow impossible); leaner cap1 is allowed because
        the returned truncation indicator triggers an exact re-render.
        Single-pass: with no backward there is nothing to save by
        prefiltering."""
        cap1 = cap1 or chunk * max_s
        key = (chunk, max_s, cap1, self.hit_cap)
        if not hasattr(self, "_eval_fns"):
            self._eval_fns = {}
        if key not in self._eval_fns:
            st = render_statics(self.cfg, chunk, self.dataset.near, train=False,
                                max_s=max_s, cap1=cap1, cap2=cap1,
                                max_hits=self.hit_cap)
            st = st._replace(single_pass=True)
            self._eval_fns[key] = make_render_fn(st)
        return self._eval_fns[key]

    def render_image(self, rays_o: np.ndarray, rays_d: np.ndarray,
                     chunk: int | None = None, max_s: int = 512,
                     max_s_hi: int = 1024):
        """Chunked no-grad whole-image render. Returns (colors, disparity,
        first_oct_disp) as numpy [n_rays, ...].

        Two-tier: chunks render with a lean flat capacity sized off the
        training sample EMA first; any chunk reporting truncation (flat
        overflow or a ray at the dense cap) is re-rendered with exact
        capacities. All chunks are dispatched before fetching (hides the
        per-call host<->device round trip).

        Default chunk 4096 (configurable via ``eval.chunk``): the r2
        scaling table says 16k-ray chunks are ~5x faster, but BOTH r5full
        tunnel wedges happened inside the first 16384-chunk eval compile at
        iter 2500 (BENCHMARKS.md round-5 incident — the ~5M-point fast-tier
        buffers appear to kill the remote compile service), while 4096 is
        the r1-r4-proven value. Raise via ``eval.chunk`` deliberately, in a
        context where losing the tunnel is acceptable. The reference
        renders 8192-ray eval chunks (ExpRunner.cpp:257-293)."""
        if chunk is None:
            chunk = int(self.cfg.get("eval", {}).get("chunk", 4096))
        cap_fast = cap_bucket(min(max(2.0 * self.ema_sampled, 64.0) * chunk,
                                  chunk * max_s))
        fast = self._eval_fn_for(chunk, max_s, cap_fast)
        n = rays_o.shape[0]
        fineness = jnp.asarray(
            schedules.ray_march_fineness(self.iter_step, self.cfg["train"]))
        colors = np.zeros((n, 3), np.float32)
        disp = np.zeros((n,), np.float32)
        oct_d = np.full((n,), 1.0, np.float32)

        def dispatch(fn, lo):
            hi = min(lo + chunk, n)
            ro = np.zeros((chunk, 3), np.float32)
            rd = np.ones((chunk, 3), np.float32)
            ro[: hi - lo] = rays_o[lo:hi]
            rd[: hi - lo] = rays_d[lo:hi]
            return (lo, hi, fn(self.params, self.consts, self.tree,
                               jnp.asarray(ro), jnp.asarray(rd), fineness))

        pending = [dispatch(fast, lo) for lo in range(0, n, chunk)]
        redo = []
        for lo, hi, (c, d, f, ov) in pending:
            if max_s < max_s_hi and float(ov) > 0:
                redo.append(lo)
                continue
            colors[lo:hi] = np.asarray(c)[: hi - lo]
            disp[lo:hi] = np.asarray(d)[: hi - lo]
            oct_d[lo:hi] = np.asarray(f)[: hi - lo]
        if redo:
            slow = self._eval_fn_for(chunk, max_s_hi)
            for lo, hi, (c, d, f, _) in [dispatch(slow, lo) for lo in redo]:
                colors[lo:hi] = np.asarray(c)[: hi - lo]
                disp[lo:hi] = np.asarray(d)[: hi - lo]
                oct_d[lo:hi] = np.asarray(f)[: hi - lo]
        return colors, disp, oct_d
