#!/bin/bash
# r5 TPU batch 4: RN50 fresh component table + e2e (corrects the r4
# contended stem reading), serving bucket A/B (VERDICT item 3), and the
# standing re-probes (item 8: un-remat'd grad-of-scan arm, attention
# impl ladder).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "=== RN50 components fresh ($(date +%H:%M:%S)) ==="
timeout 1800 python tools_dev/bench_resnet.py --components --batch 256

echo "=== RN50 e2e fastest ($(date +%H:%M:%S)) ==="
timeout 1200 python tools_dev/bench_resnet.py --batch 256

echo "=== serving buckets A/B: mixed workload, buckets 1 vs 3 ($(date +%H:%M:%S)) ==="
timeout 2400 python tools_dev/bench_serve.py --model random:ViT-B/16 \
    --batch_size 64 --clients 8 --images 1024 --request_mix 32,4,16,8,2,64 \
    --buckets 1 --wire binary
timeout 2400 python tools_dev/bench_serve.py --model random:ViT-B/16 \
    --batch_size 64 --clients 8 --images 1024 --request_mix 32,4,16,8,2,64 \
    --buckets 3 --wire binary

echo "=== s0 VPU/MXU overlap probe: hidden-chunked fused MLP ($(date +%H:%M:%S)) ==="
timeout 1200 python tools_dev/ab_convnext_tiles.py --stages 0 --tiles 0 \
    --acts gelu_poly:sig5 --chunks 0,2,4 --iters 10

echo "=== standing re-probe: un-remat'd grad-of-scan ($(date +%H:%M:%S)) ==="
timeout 2400 python tools_dev/repro_scan_crash.py || true

echo "=== standing re-probe: attention impl ladder ($(date +%H:%M:%S)) ==="
timeout 2400 python tools_dev/ab_attn_impl.py || true

echo "=== done ($(date +%H:%M:%S)) ==="
