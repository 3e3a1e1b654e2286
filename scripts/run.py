#!/usr/bin/env python
"""CLI launcher, drop-in compatible with the reference's hydra workflow
(reference scripts/run.py:37-78):

    python scripts/run.py --config-name=wanjinyou \
        dataset_name=example case_name=ngp_fox mode=train [+work_dir=...]

Differences by design: config composition is handled by
f2nerf_tpu.utils.config (hydra is not required), and the pipeline runs
in-process (there is no compiled binary to exec — the "binary" is the jitted
XLA program).

Keeps the reference's side effects: image_list.txt generation, source backup
into exp/<case>/<exp>/record/, runtime_config.yaml dumps, and the output
tree exp/<case>/<exp>/{images,test_images,novel_images,checkpoints,...}.
"""

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f2nerf_tpu.utils import config as cfglib

BACKUP_PATTERNS = [
    "./confs/**/*.yaml",
    "./f2nerf_tpu/**/*.py",
    "./scripts/*.py",
]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", dest="config_name", default="wanjinyou")
    parser.add_argument("--config-path", dest="config_path", default=None)
    parser.add_argument("overrides", nargs="*",
                        help="hydra-style key=value overrides")
    args = parser.parse_args(argv)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config_dir = args.config_path or os.path.join(repo_root, "confs")
    cfg = cfglib.compose(config_dir, args.config_name, args.overrides)

    base_dir = cfg.get("work_dir") or os.getcwd()
    print(f"Working directory is {base_dir}")

    data_path = os.path.join(base_dir, "data", cfg["dataset_name"], cfg["case_name"])
    base_exp_dir = os.path.join(base_dir, "exp", cfg["case_name"], cfg["exp_name"])
    os.makedirs(base_exp_dir, exist_ok=True)

    # source backup (reference scripts/run.py:52-61)
    record_dir = os.path.join(base_exp_dir, "record")
    os.makedirs(record_dir, exist_ok=True)
    for pattern in BACKUP_PATTERNS:
        for path in glob.glob(os.path.join(repo_root, pattern), recursive=True):
            rel = os.path.relpath(path, repo_root)
            dst = os.path.join(record_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(path, dst)

    from f2nerf_tpu.data.dataset import make_image_list
    make_image_list(data_path, float(cfg["dataset"]["factor"]))

    cfg["dataset"]["data_path"] = data_path
    cfg["base_dir"] = base_dir
    cfg["base_exp_dir"] = base_exp_dir
    cfglib.save(cfg, os.path.join(record_dir, "runtime_config.yaml"))
    cfglib.save(cfg, os.path.join(os.getcwd(), "runtime_config.yaml"))

    from f2nerf_tpu.train.runner import Runner
    Runner(cfg).execute()


if __name__ == "__main__":
    main()
