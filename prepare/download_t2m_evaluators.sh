#!/bin/bash
# T2M evaluator checkpoints (reference: src/prepare/download_t2m_evaluators.sh)
set -e
mkdir -p deps
cd deps
echo "Download t2m.tar.gz / kit.tar.gz from the HumanML3D/T2M release"
echo "(https://github.com/EricGuo5513/text-to-motion) and extract here:"
echo "  tar -xzf t2m.tar.gz && tar -xzf kit.tar.gz"
