import time, pickle, numpy as np, jax, jax.numpy as jnp
from f2nerf_tpu.utils.config import compose
import f2nerf_tpu.sampler.octree as oc
import f2nerf_tpu.sampler.device as dv
from f2nerf_tpu.train import trainer as T
from f2nerf_tpu.data.dataset import sample_rays

cfg = compose("confs", "wanjinyou", [])
tree_host = pickle.load(open("/tmp/fox_tree.pkl","rb"))
oc.build_octree = lambda *a, **k: tree_host
tr = T.Trainer(cfg, "/tmp/fox_ab", "/root/reference/data/example/ngp_fox", seed=2022)
R = 2048
key = jax.random.PRNGKey(0)
rays_o, rays_d, bounds, gt, img_idx = sample_rays(tr.data, key, R, tr.dataset.height, tr.dataset.width)
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
st0 = T.render_statics(cfg, R, tr.dataset.near, train=True)  # max_s=512 etc
near = jnp.full((R,), st0.global_near); far = jnp.full((R,), 1e8)

def kbench(name, fn, *args, k=8):
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(*a)
            s = 0.0
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + leaf.astype(jnp.float32).sum()
            return c + s
        return jax.lax.fori_loop(0, k, body, 0.0)
    v = float(run(*args))
    t0 = time.time(); v = float(run(*args))
    print(f"{name}: {(time.time()-t0-0.045)/k*1000:.1f} ms", flush=True)

kbench("traverse(upwalk)", lambda: dv.traverse(tr.tree, rays_o, rays_d, near, far, st0.max_hits))
hits = dv.traverse(tr.tree, rays_o, rays_d, near, far, st0.max_hits)
noise = jnp.ones((R + st0.max_s + 16,)) * 4.0
kbench("march(scalarized)", lambda: dv.ray_march(tr.tree, rays_o, rays_d, *hits, noise, st0.sample_l, st0.scale_by_dis, st0.max_s))

def step_time(name, single_pass, K=8):
    stx = T.render_statics(cfg, R, tr.dataset.near, train=True,
                           cap1=524288, cap2=524288 if single_pass else 262144)
    stx = stx._replace(single_pass=single_pass)
    fn = T.make_train_step(cfg, stx, tr.dataset.height, tr.dataset.width)
    runtime = dict(lr=jnp.asarray(1e-3), fineness=jnp.asarray(4.0),
                   grad_progress=jnp.asarray(0.5), var_loss_weight=jnp.asarray(0.0))
    import copy
    p, o, t = tr.params, tr.opt_state, tr.tree
    p, o, t, aux = fn(p, o, t, tr.consts, tr.data, key, runtime, R, None)
    _ = float(aux["mse"])
    t0=time.time()
    for i in range(K):
        p, o, t, aux = fn(p, o, t, tr.consts, tr.data, jax.random.fold_in(key,i), runtime, R, None)
    _ = float(aux["mse"])
    print(f"{name}: {(time.time()-t0)/K*1000:.0f} ms/iter", flush=True)

step_time("step two-pass", False)
step_time("step single-pass", True)
