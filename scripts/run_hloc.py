#!/usr/bin/env python
"""hloc (superpoint+superglue) reconstruction wrapper.

The reference ships scripts/hloc/run_hloc.py driving the external
`hloc` toolbox. hloc is not bundled here (heavy torch-GPU dependency
stack); this wrapper invokes it when installed and documents the pipeline
otherwise. Output feeds scripts/colmap2poses.py unchanged.
"""

import argparse
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    args = ap.parse_args()
    try:
        from hloc import (extract_features, match_features,
                          pairs_from_retrieval, reconstruction)
    except ImportError:
        print("hloc is not installed. Install github.com/cvg/Hierarchical-"
              "Localization, then re-run; or use COLMAP via "
              "scripts/local_colmap_and_resize.sh.", file=sys.stderr)
        return 1

    data = Path(args.data_dir)
    images = data / "images"
    outputs = data / "hloc"
    sfm_pairs = outputs / "pairs-netvlad.txt"
    sfm_dir = outputs / "sparse" / "0"

    retrieval_conf = extract_features.confs["netvlad"]
    feature_conf = extract_features.confs["superpoint_aachen"]
    matcher_conf = match_features.confs["superglue"]

    retrieval_path = extract_features.main(retrieval_conf, images, outputs)
    pairs_from_retrieval.main(retrieval_path, sfm_pairs, num_matched=20)
    feature_path = extract_features.main(feature_conf, images, outputs)
    match_path = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs)
    reconstruction.main(sfm_dir, images, sfm_pairs, feature_path, match_path,
                        camera_mode="SINGLE")
    print(f"done; next: python scripts/colmap2poses.py --data_dir {data} "
          f"--sparse_dir {sfm_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
