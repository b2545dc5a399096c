#!/usr/bin/env bash
# XLA-flags sweep on the HBM-bound SlowFast-R50 BYOL flagship step
# (BASELINE.md r4: 463.2 ms bs16 / 692.1 ms bs32, roofline says the
# program is HBM-bandwidth-limited). Sweeps the scoped-vmem fusion
# budget, which bounds how large XLA lets fusions grow before spilling
# (bigger budget -> fewer HBM round-trips for the fat stem/BN fusions).
#
# One chip, serialized. Usage: bash scripts/sweep_xla_flags.sh [out.log]
set -u
OUT="${1:-/tmp/xla_sweep.log}"
CFG=configs/pretrain/SlowFast_R50_K400.yaml
cd "$(dirname "$0")/.."
: > "$OUT"
for KIB in default 32768 65536 131072; do
  if [ "$KIB" = default ]; then
    FLAGS=""
  else
    FLAGS="--xla_tpu_scoped_vmem_limit_kib=$KIB"
  fi
  echo "=== scoped_vmem=$KIB ===" | tee -a "$OUT"
  LIBTPU_INIT_ARGS="$FLAGS" timeout 1200 \
    python scripts/bench_step.py --cfg "$CFG" --steps 12 \
    2>&1 | tail -6 | tee -a "$OUT"
done
echo "sweep done" | tee -a "$OUT"
