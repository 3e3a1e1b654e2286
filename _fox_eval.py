import pickle, numpy as np, time
from f2nerf_tpu.utils.config import compose
import f2nerf_tpu.sampler.octree as oc
from f2nerf_tpu.train import trainer as T

cfg = compose("confs", "wanjinyou", [
    "train.pts_batch_size=131072",
    "pts_sampler.sub_div_milestones=[300, 600, 900, 1200]",
    "pts_sampler.compact_freq=300",
    "train.learning_rate_warm_up_end_iter=300",
    "train.end_iter=1500",
])
tree_host = pickle.load(open("/tmp/fox_tree.pkl","rb"))
oc.build_octree = lambda *a, **k: tree_host
tr = T.Trainer(cfg, "/tmp/fox_val", "/root/reference/data/example/ngp_fox", seed=2022)
tr.load_checkpoint()
print("loaded iter", tr.iter_step, flush=True)
from f2nerf_tpu.data.dataset import camera_rays
psnrs = []
t0=time.time()
for idx in map(int, tr.dataset.test_set[:3]):
    ro, rd = camera_rays(tr.data, idx, tr.dataset.height, tr.dataset.width)
    colors, disp, octd = tr.render_image(np.asarray(ro), np.asarray(rd))
    gt = tr.dataset.images[idx].reshape(-1, 3).astype(np.float32) / 255.0
    pred = np.clip(np.round(np.clip(colors,0,1) * 255) / 255, 0, 1)
    mse = float(((pred - gt) ** 2).mean())
    p = 20*np.log10(1/np.sqrt(mse)); psnrs.append(p)
    print(f"TEST img {idx} PSNR {p:.2f} ({time.time()-t0:.0f}s)", flush=True)
print(f"MEAN TEST PSNR {np.mean(psnrs):.2f}", flush=True)
from f2nerf_tpu.utils import io
h, w = tr.dataset.height, tr.dataset.width
io.write_image("/tmp/fox_val/pred_fixed.png", pred.reshape(h, w, 3))
