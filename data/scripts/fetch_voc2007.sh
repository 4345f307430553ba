#!/usr/bin/env bash
# Fetch PASCAL VOC 2007 (trainval + test + devkit) into data/VOCdevkit2007.
# Role parity: the reference's data/scripts fetchers (SURVEY.md §2.5 —
# mount empty, no file:line exists). Requires network egress; on the
# build machine there is none, so this script documents-and-automates
# rather than being runnable there (data/README.md has the manual layout).
# Usage: ./data/scripts/fetch_voc2007.sh [--no-md5]
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="http://host.robots.ox.ac.uk/pascal/VOC/voc2007"
declare -A MD5=(
  [VOCtrainval_06-Nov-2007.tar]="c52e279531787c972589f7e41ab4ae64"
  [VOCtest_06-Nov-2007.tar]="b6e924de25625d8de591ea690078ad9f"
  [VOCdevkit_08-Jun-2007.tar]="d8c8fd655dcb0bfc69d1a4ed8959df0b"
)
CHECK_MD5=1
[ "${1:-}" = "--no-md5" ] && CHECK_MD5=0

fetch() { # url dest
  if command -v curl >/dev/null; then curl -fL --retry 3 -o "$2" "$1"
  else wget -O "$2" "$1"; fi
}

for f in "${!MD5[@]}"; do
  if [ ! -f "$f" ]; then
    echo "fetching $f"
    fetch "$BASE/$f" "$f"
  fi
  if [ "$CHECK_MD5" = 1 ]; then
    echo "${MD5[$f]}  $f" | md5sum -c - || {
      echo "md5 mismatch for $f (use --no-md5 to skip)"; exit 1; }
  fi
  tar xf "$f"
done

# The loaders expect data/VOCdevkit2007 (data/voc.py); keep the extracted
# VOCdevkit name as a symlink target for parity with the reference layout.
[ -e VOCdevkit2007 ] || ln -s VOCdevkit VOCdevkit2007
echo "VOC2007 ready under data/VOCdevkit2007/VOC2007"
