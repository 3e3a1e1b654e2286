#!/usr/bin/env bash
# COLMAP reconstruction + image pyramid for a capture directory
# (fresh equivalent of the reference scripts/local_colmap_and_resize.sh).
#
# Usage: ./scripts/local_colmap_and_resize.sh <data_dir> [CAMERA_MODEL]
#   <data_dir>/images/  must hold the captured images.
# Produces <data_dir>/sparse/0 plus images_2/ images_4/ images_8/, then run
#   python scripts/colmap2poses.py --data_dir <data_dir>
set -euo pipefail

DATASET_PATH=${1:?usage: $0 <data_dir> [CAMERA_MODEL]}
CAMERA=${2:-OPENCV}

command -v colmap >/dev/null || { echo "colmap not found in PATH" >&2; exit 1; }

colmap feature_extractor \
  --database_path "$DATASET_PATH/database.db" \
  --image_path "$DATASET_PATH/images" \
  --ImageReader.single_camera 1 \
  --ImageReader.camera_model "$CAMERA" \
  --SiftExtraction.use_gpu 0

colmap exhaustive_matcher \
  --database_path "$DATASET_PATH/database.db" \
  --SiftMatching.use_gpu 0

mkdir -p "$DATASET_PATH/sparse"
colmap mapper \
  --database_path "$DATASET_PATH/database.db" \
  --image_path "$DATASET_PATH/images" \
  --output_path "$DATASET_PATH/sparse"

for factor in 2 4 8; do
  out="$DATASET_PATH/images_$factor"
  rm -rf "$out"; cp -r "$DATASET_PATH/images" "$out"
  pushd "$out" >/dev/null
  if command -v mogrify >/dev/null; then
    mogrify -resize "$((100 / factor))%" *
  else
    python - "$factor" <<'PY'
import sys, glob
from PIL import Image
f = int(sys.argv[1])
for p in glob.glob('*'):
    im = Image.open(p)
    im.resize((im.width // f, im.height // f), Image.LANCZOS).save(p)
PY
  fi
  popd >/dev/null
done
echo "done; next: python scripts/colmap2poses.py --data_dir $DATASET_PATH"
