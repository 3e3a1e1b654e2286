"""COLMAP subprocess driver for the legacy LLFF ingestion path.

Same capability as the reference's scripts/poses/colmap_wrapper.py:14-78
(feature extraction -> matching -> mapping into sparse/0), re-written around
a single command list + shared logging.
"""

import os
import subprocess


def _run(args, log):
    out = subprocess.check_output(args, universal_newlines=True)
    log.write(out)
    return out


def run_colmap(basedir: str, match_type: str = "exhaustive_matcher") -> None:
    """Run the COLMAP sparse-reconstruction pipeline over `basedir/images`.

    match_type: 'exhaustive_matcher' or 'sequential_matcher'.
    Writes database.db, sparse/0/, and colmap_output.txt under basedir.
    """
    db = os.path.join(basedir, "database.db")
    os.makedirs(os.path.join(basedir, "sparse"), exist_ok=True)
    with open(os.path.join(basedir, "colmap_output.txt"), "w") as log:
        _run(["colmap", "feature_extractor",
              "--database_path", db,
              "--image_path", os.path.join(basedir, "images"),
              "--ImageReader.single_camera", "1"], log)
        print("Features extracted")
        _run(["colmap", match_type, "--database_path", db], log)
        print("Features matched")
        _run(["colmap", "mapper",
              "--database_path", db,
              "--image_path", os.path.join(basedir, "images"),
              "--output_path", os.path.join(basedir, "sparse"),
              "--Mapper.num_threads", "16",
              "--Mapper.init_min_tri_angle", "4",
              "--Mapper.multiple_models", "0",
              "--Mapper.extract_colors", "0"], log)
        print("Sparse map created")
