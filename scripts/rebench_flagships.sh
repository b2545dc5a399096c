#!/usr/bin/env bash
# Refresh every chip-benched flagship number with the current code (the
# r4 BN-dtype fix touched SyncBatchNorm in every BN model; the recorded
# MViT/Swin/X3D/AdViSe rows in BASELINE.md predate it). One chip,
# serialized. Usage: bash scripts/rebench_flagships.sh [out.log]
set -u
OUT="${1:-/tmp/rebench.log}"
cd "$(dirname "$0")/.."
: > "$OUT"
for CFG in \
  configs/pretrain/MViT_S_rev_masked.yaml \
  configs/pretrain/SwinB_moco_32chips.yaml \
  configs/pretrain/X3D_M_K400.yaml \
  configs/pretrain/AdViSe.yaml \
  configs/pretrain/SpeedPro_R50.yaml; do
  echo "=== $CFG ===" | tee -a "$OUT"
  timeout 1500 python scripts/bench_step.py --cfg "$CFG" --steps 12 \
    2>&1 | tail -6 | tee -a "$OUT"
done
echo "rebench done" | tee -a "$OUT"
