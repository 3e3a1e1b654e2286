#!/usr/bin/env python
"""Octree occupancy census from a training checkpoint (economy evidence,
VERDICT r3 #4).

Reads a checkpoint's state.npz directly (no jax, no TPU — safe to run on
the 1-core host while a TPU job is training) and prints the culling state:
node/leaf counts, how many leaves occupancy culling has disabled
(trans_idx == -1), the weight/alpha hysteresis histograms, and visit
counts. The reference reaches ~20 meaningful samples/ray at steady state
(ExpRunner.cpp:86) because MarkInvalidNodes (PersSampler.cu:529-535)
disables most free-space leaves; if our culled fraction stays low while
meaningful/ray stays ~100+, the gap is in vote thresholds or stat decay —
not the marcher.

Usage: python benchmarks/inspect_ckpt.py exp/ngp_fox/r4full/checkpoints/05000 [...]
"""

import sys

import numpy as np


def census(path):
    z = np.load(path.rstrip("/") + "/state.npz")
    it = int(z["iter_step"])
    leaf = z["node_is_leaf"].astype(bool)
    trans = z["node_trans"]
    ws = z["node_wstat"]
    asx = z["node_astat"]
    visit = z["node_visit"]
    n = leaf.size
    n_leaf = int(leaf.sum())
    culled = leaf & (trans < 0)
    live = leaf & (trans >= 0)
    print(f"== {path} (iter {it})")
    print(f"  nodes {n}  leaves {n_leaf}  culled {int(culled.sum())} "
          f"({100.0 * culled.sum() / max(n_leaf, 1):.1f}% of leaves)")
    ema = z["ema"]
    print(f"  EMA sampled/ray {ema[0]:.1f}  meaningful/ray {ema[1]:.1f}  "
          f"oct-hits/ray {ema[2]:.1f}")
    for name, st in (("wstat", ws), ("astat", asx)):
        st = st[leaf]
        print(f"  {name}: min {st.min()}  p25 {np.percentile(st, 25):.0f}  "
              f"median {np.median(st):.0f}  p75 {np.percentile(st, 75):.0f} "
              f" max {st.max()}  frac<0 {np.mean(st < 0):.3f}  "
              f"frac==512-base {np.mean(st >= 512):.3f}")
    v = visit[live]
    if v.size:
        print(f"  visit_cnt(live leaves): median {np.median(v):.0f}  "
              f"p90 {np.percentile(v, 90):.0f}  max {v.max()}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        census(p)
