#!/bin/bash
# KIT-ML data layout check + evaluator pointer (reference:
# src/prepare/prepare_kit.sh — which is cluster-notes only; this version is
# executable). The KIT Motion-Language dataset requires manual download:
#   1. Get the T2M-processed KIT-ML release (new_joint_vecs/, texts/,
#      Mean.npy, Std.npy, train/val/test.txt) following
#      https://github.com/EricGuo5513/HumanML3D — or the raw data from
#      https://motion-annotation.humanoids.kit.edu/dataset/
#   2. Place it at datasets/kit-ml/ (configs/assets.yaml KIT.ROOT).
#   3. KIT evaluators arrive with prepare/download_t2m_evaluators.sh
#      (deps/t2m/kit/...).
set -e
root=datasets/kit-ml
ok=1
for p in "$root/new_joint_vecs" "$root/texts" "$root/Mean.npy" \
         "$root/Std.npy" "$root/train.txt"; do
  if [ ! -e "$p" ]; then echo "MISSING: $p"; ok=0; fi
done
for p in deps/t2m/kit; do
  if [ ! -e "$p" ]; then
    echo "MISSING: $p (run prepare/download_t2m_evaluators.sh)"; ok=0
  fi
done
[ "$ok" = 1 ] && echo "KIT-ML layout OK" || exit 1
