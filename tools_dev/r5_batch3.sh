#!/bin/bash
# r5 TPU batch 3: PEFT training-throughput rows for the families the
# training table does not cover (VERDICT r4 items 2 + 7): ViT-L, ViT-H
# (canonical vs hybrid vs scan), SigLIP-L-16-384, convnext_large_d,
# convnext_xxlarge.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "=== ViT-L PEFT rows ($(date +%H:%M:%S)) ==="
timeout 3600 python tools_dev/ab_peft_hybrid.py --model vitl --scan

echo "=== ViT-H PEFT rows ($(date +%H:%M:%S)) ==="
timeout 3600 python tools_dev/ab_peft_hybrid.py --model vith --scan

echo "=== SigLIP-L-16-384 PEFT rows ($(date +%H:%M:%S)) ==="
timeout 3600 python tools_dev/ab_peft_hybrid.py --tag ViT-L-16-SigLIP-384 --bs 16 --groups 11 --n 128

echo "=== convnext_large_d PEFT rows ($(date +%H:%M:%S)) ==="
timeout 3600 python tools_dev/ab_peft_hybrid.py --tag convnext_large_d --bs 32 --groups 2 --n 128

echo "=== convnext_xxlarge PEFT rows ($(date +%H:%M:%S)) ==="
timeout 3600 python tools_dev/ab_peft_hybrid.py --tag convnext_xxlarge --bs 16 --groups 2 --n 64

echo "=== done ($(date +%H:%M:%S)) ==="
