#!/bin/bash
# Build deps/smpl_models/smplh/SMPLH_{MALE,FEMALE,NEUTRAL}.npz from the
# registered MPI releases (reference: src/prepare/smplh.sh).
# Prereqs (registration required), placed in deps/smplh/:
#   smplh.tar.xz   from https://mano.is.tue.mpg.de (SMPL+H, "models" page)
#   mano_v1_2.zip  from https://mano.is.tue.mpg.de
set -e
cd deps/smplh
mkdir -p tmp
tar xf smplh.tar.xz -C tmp
unzip -oq mano_v1_2.zip -d tmp
cd ../..

out=deps/smpl_models/smplh
for gender in male female neutral; do
  python prepare/merge_smplh_mano.py \
    --smplh "deps/smplh/tmp/$gender/model.npz" \
    --mano-left  deps/smplh/tmp/mano_v1_2/models/MANO_LEFT.pkl \
    --mano-right deps/smplh/tmp/mano_v1_2/models/MANO_RIGHT.pkl \
    --out "$out"
done

rm -rf deps/smplh/tmp
echo "done: $out"
