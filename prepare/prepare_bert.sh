#!/bin/bash
# DistilBERT weights for the alternate text encoder
# (ladiff_tpu/models/bert_text.py; reference: src/prepare/prepare_bert.sh).
# Fetches the handful of files we need instead of a full git-lfs clone.
set -e
mkdir -p deps/distilbert-base-uncased
cd deps/distilbert-base-uncased
for f in config.json vocab.txt tokenizer_config.json model.safetensors; do
  wget -c "https://huggingface.co/distilbert-base-uncased/resolve/main/$f"
done
