"""SIGTERM/SIGINT graceful stop: the train loop must finish the current
chunk, save the exact state, and run the end-of-train flow instead of dying
mid-step (preemptible-fleet behavior; the reference's ExpRunner has no
equivalent — a killed run loses everything since the last save,
ExpRunner.cpp:180-186)."""

import os
import signal
import threading

import numpy as np

from f2nerf_tpu.train.runner import Runner


class FakeDataset:
    test_set = np.array([], np.int64)


class FakeTrainer:
    """Duck-typed stand-in driving only the loop surface train() touches."""

    def __init__(self):
        self.iter_step = 0
        self.mse_records = [1e-2]
        self.psnr_smooth = 20.0
        self.trunc_ema = 0.0
        self.ema_oct = self.ema_sampled = self.ema_meaningful = 1.0
        self.chunk_size = 1
        self.dataset = FakeDataset()
        self.saved_at = []

    def train_auto(self, sync=True, limit=1):
        import time
        time.sleep(0.01)
        self.iter_step += min(max(int(limit), 1), 10)
        return dict(n_rays=512)

    def save_checkpoint(self):
        self.saved_at.append(self.iter_step)


def make_runner(tmp_path, end_iter=10_000_000):
    r = Runner.__new__(Runner)
    r.cfg = {}
    r.base_exp_dir = str(tmp_path)
    r.trainer = FakeTrainer()
    r.end_iter = end_iter
    r.report_freq = 1 << 30
    r.vis_freq = 1 << 30
    r.stats_freq = 1 << 30
    r.save_freq = 1 << 20
    r.test_images = lambda: setattr(r, "tested", True)
    return r


def test_sigterm_saves_and_finishes(tmp_path):
    r = make_runner(tmp_path)
    timer = threading.Timer(
        0.2, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    r.train()  # would run ~forever without the graceful stop
    tr = r.trainer
    assert tr.saved_at, "graceful stop must save the final state"
    assert tr.saved_at[-1] == tr.iter_step
    assert getattr(r, "tested", False), "end-of-train test render must run"
    assert os.path.exists(os.path.join(str(tmp_path), "train_info.txt"))
    # the loop stopped far short of end_iter
    assert tr.iter_step < r.end_iter
    # handler was restored: a later SIGTERM must not be swallowed
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler, signal.Handlers.SIG_DFL)


def test_normal_completion_unchanged(tmp_path):
    r = make_runner(tmp_path, end_iter=7)
    r.train()
    tr = r.trainer
    # end_iter=7 not on the save cadence -> final save still happens
    assert tr.iter_step == 7 and tr.saved_at[-1] == 7
    assert getattr(r, "tested", False)
