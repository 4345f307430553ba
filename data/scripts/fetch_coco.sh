#!/usr/bin/env bash
# Fetch MS COCO 2014 images + annotations into data/coco (the AZ paper's
# second benchmark; SURVEY.md §2.5 — reference mount empty, no file:line
# exists). Requires network egress (~20 GB). Usage:
#   ./data/scripts/fetch_coco.sh [train2014|val2014 ...]
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p coco && cd coco

SPLITS=("$@")
[ ${#SPLITS[@]} -eq 0 ] && SPLITS=(train2014 val2014)

fetch() {
  if command -v curl >/dev/null; then curl -fL --retry 3 -O "$1"
  else wget "$1"; fi
}

if [ ! -d annotations ]; then
  fetch "http://images.cocodataset.org/annotations/annotations_trainval2014.zip"
  unzip -q annotations_trainval2014.zip
fi
for s in "${SPLITS[@]}"; do
  if [ ! -d "$s" ]; then
    fetch "http://images.cocodataset.org/zips/${s}.zip"
    unzip -q "${s}.zip"
  fi
done
echo "COCO ready under data/coco (annotations/ + ${SPLITS[*]})"
