#!/bin/bash
# r5 TPU batch 2: int8 ViT-B/32 G ladder, RN50 stem breakdown + arms,
# SigLIP-L b64 probe.  Serial — one chip, chained-fori_loop methodology.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "=== ab_vitb32 --int8 G ladder ($(date +%H:%M:%S)) ==="
timeout 2400 python tools_dev/ab_vitb32.py --int8 --batches 256 --gs 1,2,4,8,16,1

echo "=== RN50 stem components ($(date +%H:%M:%S)) ==="
timeout 1800 python tools_dev/ab_rn_stem.py --components --batch 256

echo "=== RN50 stem arms ($(date +%H:%M:%S)) ==="
timeout 2400 python tools_dev/ab_rn_stem.py --batch 256 --arms xla,p27,s2d,nchw,allmat

echo "=== SigLIP-L b64 probe ($(date +%H:%M:%S)) ==="
timeout 2400 python tools_dev/bench_encode.py --model ViT-L-16-SigLIP-384 --batch 64
timeout 1200 python tools_dev/bench_encode.py --model ViT-L-16-SigLIP-384 --batch 32

echo "=== done ($(date +%H:%M:%S)) ==="
