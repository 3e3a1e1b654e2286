#!/usr/bin/env python
"""Summarize a training log's report lines into a trajectory table.

Input: a log from scripts/run.py mode=train (e.g. /tmp/full20k_r3full.log,
written by benchmarks/run_full20k.sh). Pulls per-report PSNR, ray-bucket,
sample economy (Samples / MeaningfulSamples / OctSamples EMAs) and IPS, and
prints a markdown table at a coarse cadence plus run aggregates (wall time,
time-to-PSNR-25). This is the evidence table for VERDICT r2 #2/#3/#10:
the meaningful-samples-per-ray trajectory is what moves the adaptive batch
controller into the large-ray-bucket regime as fineness decays and
occupancy culling matures (reference contract: ~20 meaningful/ray steady,
ExpRunner.cpp:86).

Usage: python benchmarks/parse_train_log.py /tmp/full20k_r3full.log [--every 1000]
"""

import argparse
import re
import sys

# runner.py report line, e.g.:
# iter: 2000  PSNR: 27.31  Rays: 2048  OctSamples: 17.9  Samples: 106.7
#   MeaningfulSamples: 98.2  IPS: 3.21  [trunc ...]
PAT = re.compile(
    r"Iter:\s*(\d+)\s+PSNR:\s*([\d.]+)\s+NRays:\s*(\d+)\s+"
    r"OctSamples:\s*([\d.]+)\s+Samples:\s*([\d.]+)\s+"
    r"MeaningfulSamples:\s*([\d.]+)\s+IPS:\s*([\d.]+)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--every", type=int, default=1000,
                    help="table row cadence in iters")
    args = ap.parse_args()

    rows = []
    with open(args.log, errors="replace") as f:
        for line in f:
            m = PAT.search(line)
            if m:
                it, psnr, rays, octs, smp, mean, ips = m.groups()
                rows.append((int(it), float(psnr), int(rays), float(octs),
                             float(smp), float(mean), float(ips)))
    if not rows:
        sys.exit(f"no report lines matched in {args.log}")

    print("| iter | PSNR | rays | oct/ray | samples/ray | meaningful/ray "
          "| it/s | rays/s |")
    print("|---|---|---|---|---|---|---|---|")
    shown = set()
    for it, psnr, rays, octs, smp, mean, ips in rows:
        bucket = it // args.every
        last = (it, psnr, rays, octs, smp, mean, ips) == rows[-1]
        if bucket in shown and not last:
            continue
        shown.add(bucket)
        print(f"| {it} | {psnr:.2f} | {rays} | {octs:.1f} | {smp:.1f} "
              f"| {mean:.1f} | {ips:.2f} | {int(rays * ips):,} |")

    hit25 = next((it for it, psnr, *_ in rows if psnr >= 25.0), None)
    tot_iters = rows[-1][0]
    # wall time from summed report intervals (IPS covers report_freq iters)
    freq = rows[1][0] - rows[0][0] if len(rows) > 1 else rows[0][0]
    wall = sum(freq / ips for _, _, _, _, _, _, ips in rows if ips > 0)
    print(f"\niters: {tot_iters}  approx stepping wall: {wall/60:.1f} min"
          f"  mean rays/s: {sum(r[2]*r[6] for r in rows)/len(rows):,.0f}")
    if hit25 is not None:
        w25 = sum(freq / r[6] for r in rows if r[0] <= hit25 and r[6] > 0)
        print(f"train-PSNR-25 first reached at iter {hit25}"
              f" (~{w25/60:.1f} min of stepping)")


if __name__ == "__main__":
    main()
