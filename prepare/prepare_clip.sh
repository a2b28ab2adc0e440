#!/bin/bash
# Download the CLIP ViT-L/14 text tower (reference: src/prepare/prepare_clip.sh)
set -e
mkdir -p deps/clip-vit-large-patch14
cd deps/clip-vit-large-patch14
for f in vocab.json merges.txt config.json model.safetensors; do
  wget -c "https://huggingface.co/openai/clip-vit-large-patch14/resolve/main/$f"
done
