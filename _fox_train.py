import time, pickle, numpy as np, jax, faulthandler, sys
faulthandler.enable()
faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)
from f2nerf_tpu.utils.config import compose
import f2nerf_tpu.sampler.octree as oc
from f2nerf_tpu.train import trainer as T

cfg = compose("confs", "wanjinyou", [])
tree_host = pickle.load(open("/tmp/fox_tree.pkl","rb"))
oc.build_octree = lambda *a, **k: tree_host
tr = T.Trainer(cfg, "/tmp/fox_exp3", "/root/reference/data/example/ngp_fox", seed=2022)
t0 = time.time()
N = 3000
for i in range(N):
    m = tr.train_one(sync=(i % 20 == 19))
    if m and (tr.iter_step % 50 == 0 or tr.iter_step <= 2):
        print(f"it {tr.iter_step} psnr_sm {tr.psnr_smooth:.2f} nrays {m['n_rays']} "
              f"meaning {tr.ema_meaningful:.1f} sampled {tr.ema_sampled:.1f} "
              f"mse {m['mse']:.4f} {time.time()-t0:.0f}s", flush=True)
    if tr.iter_step % 500 == 0:
        tr.save_checkpoint()
        print("ckpt", tr.iter_step, flush=True)
tr.save_checkpoint()
print("saved", flush=True)
from f2nerf_tpu.data.dataset import camera_rays
idx = int(tr.dataset.test_set[0])
ro, rd = camera_rays(tr.data, idx, tr.dataset.height, tr.dataset.width)
colors, disp, octd = tr.render_image(np.asarray(ro), np.asarray(rd))
gt = tr.dataset.images[idx].reshape(-1, 3).astype(np.float32) / 255.0
pred = np.clip(np.round(colors * 255) / 255, 0, 1)
mse = float(((pred - gt) ** 2).mean())
print(f"TEST img {idx} PSNR {20*np.log10(1/np.sqrt(mse)):.2f}", flush=True)
