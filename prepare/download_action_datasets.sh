#!/bin/bash
# Action-conditioned datasets (reference: src/prepare/download_action_datasets.sh,
# itself from Mathux/ACTOR). Lands where configs/assets.yaml expects them:
#   datasets/HumanAct12Poses/humanact12poses.pkl
#   datasets/uestc/  (VIBE pose estimates; vibe_cache_refined.pkl is then
#                     built on first use by ladiff_tpu.data.a2m)
set -e
mkdir -p datasets
cd datasets

echo "== HumanAct12 poses =="
gdown "https://drive.google.com/uc?id=1130gHSvNyJmii7f6pv5aY5IyQIWc3t7R"
tar xzf HumanAct12Poses.tar.gz
rm HumanAct12Poses.tar.gz

echo "== UESTC (VIBE estimates) =="
gdown "https://drive.google.com/uc?id=1LE-EmYNzECU8o7A2DmqDKtqDMucnSJsy"
tar xjf uestc.tar.bz2
rm uestc.tar.bz2

echo "done"
