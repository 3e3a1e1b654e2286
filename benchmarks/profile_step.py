#!/usr/bin/env python
"""Capture a jax.profiler trace of the real train step and print the top
device ops (VERDICT r2 #1). Parses the perfetto trace.json.gz itself — no
tensorboard needed on this box. Run alone (one TPU process).

Usage: python benchmarks/profile_step.py [config overrides...]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    import jax

    from f2nerf_tpu.utils.config import compose
    from f2nerf_tpu.train.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "data", "example", "ngp_fox")
    settle = int(os.environ.get("F2_SETTLE", "80"))
    prof_dir = os.environ.get("F2_PROF_DIR", "/tmp/f2prof")
    cfg = compose(os.path.join(repo, "confs"), "wanjinyou", sys.argv[1:])
    tr = Trainer(cfg, "/tmp/probe_prof", data, seed=2022)
    log(f"Trainer init done, n_trans={tr.n_volumes}")

    for i in range(settle):
        tr.train_one(sync=(i % 8 == 7))
    tr.freeze_controller()
    m = tr.train_one()
    log(f"settled: bucket={m['n_rays']}")

    # steady pipelined window under the profiler
    jax.profiler.start_trace(prof_dir, create_perfetto_trace=True)
    for _ in range(12):
        tr.train_one(sync=False)
    tr.train_one(sync=True)
    jax.profiler.stop_trace()
    log("trace captured")

    traces = sorted(glob.glob(
        os.path.join(prof_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        log(f"no perfetto trace under {prof_dir}; raw files: "
            f"{os.listdir(prof_dir)}")
        return
    path = traces[-1]
    log(f"parsing {path}")
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # device-lane complete events: pid/tid whose process name mentions TPU
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    by_op = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        by_op[name] += dur
        cnt[name] += 1
        total += dur
    log(f"device total {total / 1e3:.1f} ms over the window "
        f"({len(by_op)} distinct ops); pids={sorted(dev_pids)}")
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur / 1e3:9.2f} ms  x{cnt[name]:<5d} {name[:140]}",
              flush=True)


if __name__ == "__main__":
    main()
