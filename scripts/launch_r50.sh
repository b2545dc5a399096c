#!/usr/bin/env bash
# Launch the SpeedPro R3D-50 pretrain recipe on TPU.
#
# TPU analog of the reference launcher (reference scripts/launch_r50.sh):
# no torchrun — one python process drives the whole mesh under SPMD. For
# multi-host slices, run this same command on every host with
# COORDINATOR_ADDRESS set (jax.distributed picks it up).
#
# Usage: scripts/launch_r50.sh [OUTPUT_DIR] [extra --opts K V ...]
set -euo pipefail
cd "$(dirname "$0")/.."

OUTPUT=${1:-./runs/speedpro_r50}
shift || true

python -m advise_tpu.tools.run \
    --cfg configs/pretrain/SpeedPro_R50.yaml \
    --output "${OUTPUT}" \
    "$@"
