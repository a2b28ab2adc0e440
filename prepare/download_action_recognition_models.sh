#!/bin/bash
# Pretrained action-recognition classifiers used by the a2m benchmark
# metrics (reference: src/prepare/download_action_recognition_models.sh,
# itself from Mathux/ACTOR):
#   deps/actionrecognition/humanact12_gru.tar   (GRU, input 24x3 SMPL joints)
#   deps/actionrecognition/uestc_rot6d_stgcn.tar (ST-GCN on rot6d)
# test.py converts both via ladiff_tpu/models/classifiers.py.
set -e
mkdir -p deps/actionrecognition
cd deps/actionrecognition

wget -c "https://raw.githubusercontent.com/EricGuo5513/action-to-motion/master/model_file/action_recognition_model_humanact12.tar" \
  -O humanact12_gru.tar
gdown "https://drive.google.com/uc?id=1bSSD69s1dHY7Uk0RGbGc6p7uhUxSDSBK" \
  -O uestc_rot6d_stgcn.tar

echo "done"
