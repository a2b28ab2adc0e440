#!/bin/bash
# SMPL neutral body model -> deps/smpl_models/smpl/SMPL_NEUTRAL.pkl
# (reference: src/prepare/download_smpl_model.sh — same public asset;
# configs/assets.yaml points SMPL_PATH at deps/smpl_models/smpl)
set -e
mkdir -p deps/smpl_models
cd deps/smpl_models
gdown "https://drive.google.com/uc?id=1qrFkPZyRwRGd0Q3EY76K8oJaIgs_WK9i"
tar xzf smpl.tar.gz
rm smpl.tar.gz
test -f smpl/SMPL_NEUTRAL.pkl \
  && echo "OK: deps/smpl_models/smpl/SMPL_NEUTRAL.pkl" \
  || { echo "archive layout unexpected — move the extracted smpl/ folder so"; \
       echo "that deps/smpl_models/smpl/SMPL_NEUTRAL.pkl exists"; exit 1; }
