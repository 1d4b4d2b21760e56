#!/bin/bash
#SBATCH --job-name=train_prolip
#SBATCH --partition=tpu
#SBATCH --time=1-0:0
# TPU-native launch: one process per host; jax.distributed handles pods.
# Pass config overrides straight through: scripts/train_prolip.sh key=value ...

set -euo pipefail
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export TRANSFORMERS_OFFLINE=1 HF_DATASETS_OFFLINE=1

cd "${REPO_ROOT}"
python -u -m summer_clip_tpu.apps.train_prolip "$@"
