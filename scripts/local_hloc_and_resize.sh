#!/usr/bin/env bash
# hloc reconstruction + image pyramid (reference scripts/local_hloc_and_resize.sh).
set -euo pipefail
DATASET_PATH=${1:?usage: $0 <data_dir>}
python "$(dirname "$0")/run_hloc.py" --data_dir "$DATASET_PATH"
for factor in 2 4 8; do
  out="$DATASET_PATH/images_$factor"
  rm -rf "$out"; cp -r "$DATASET_PATH/images" "$out"
  python - "$out" "$factor" <<'PY'
import sys, glob, os
from PIL import Image
d, f = sys.argv[1], int(sys.argv[2])
for p in glob.glob(os.path.join(d, '*')):
    im = Image.open(p)
    im.resize((im.width // f, im.height // f), Image.LANCZOS).save(p)
PY
done
