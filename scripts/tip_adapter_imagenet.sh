#!/bin/bash
#SBATCH --job-name=tip_adapter_imagenet
#SBATCH --partition=tpu
#SBATCH --time=1-0:0
# TPU-native launch: one process per host; jax.distributed handles pods.
# Pass config overrides straight through: scripts/tip_adapter_imagenet.sh key=value ...

set -euo pipefail
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export TRANSFORMERS_OFFLINE=1 HF_DATASETS_OFFLINE=1

cd "${REPO_ROOT}"
python -u - "$@" <<'PY'
import sys
from summer_clip_tpu.apps.tip_adapter import run_imagenet
run_imagenet(argv=sys.argv[1:])
PY
