#!/bin/bash
# Pending TPU measurements (run when the axon tunnel is up), in priority
# order. Each step appends stdout+stderr to /tmp/tpu_pending/<name>.log.
#
#   1. diag_siglip_train — isolates the canonical SO400M train-graph
#      pathology (embed conv-vs-matmul module arms; module/purefn fwd;
#      suffix-grad with fused vs XLA attention; attention fwd/grad A/B —
#      also measures the new fused attention BACKWARD kernel).
#   2. ab_peft_hybrid --quant — int8 frozen prefix PEFT step (ViT-B).
#   3. ab_peft_hybrid --model siglip — re-measure the canonical-vs-hybrid
#      SO400M step with the matmul-patchify module stem.
#   4. bench.py — headline regression check.
#   5. ab_mlp_split — f32-partial vs bf16-partial running accumulator in
#      the hidden-dim-split MLP kernel (ViT-L + SigLIP shapes) + drift.
#
# Usage: bash tools_dev/run_tpu_pending.sh [1|2|3|4|5 ...]  (default: all)

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/tpu_pending
steps="${*:-4 1 2 3 5}"   # bench first: cheap headline regression guard

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3000 "$@" >> "/tmp/tpu_pending/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S)); tail:"
  tail -n 8 "/tmp/tpu_pending/$name.log"
}

for s in $steps; do
  case "$s" in
    1) run diag python tools_dev/diag_siglip_train.py ;;
    2) run quant python tools_dev/ab_peft_hybrid.py --quant ;;
    3) run siglip_ab python tools_dev/ab_peft_hybrid.py --model siglip --scan ;;
    4) run bench python bench.py ;;
    5) run mlp_split python tools_dev/ab_mlp_split.py ;;
  esac
done
