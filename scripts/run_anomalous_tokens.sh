#!/bin/bash
# Sandbox launcher: anomalous-token input optimization over a ClipGPT/GPT-2.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
cd "${REPO_ROOT}"
python -u - "$@" <<'PY'
"""Optimize inputs that elicit a target token (see sandbox.anomalous_tokens)."""
import sys
import jax, jax.numpy as jnp, numpy as np
from summer_clip_tpu.models import gpt2 as G
from summer_clip_tpu.sandbox.anomalous_tokens import optimise_input

target = int(sys.argv[1]) if len(sys.argv) > 1 else 7
model, cfg = G.build_gpt2("test-gpt")
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
table = np.asarray(variables["params"]["wte"]["embedding"])
out = optimise_input(lambda e: model.apply(variables, inputs_embeds=e)["logits"],
                     table, target_ids=[target], input_len=6, batch_size=4, epochs=50)
print("nearest token ids per candidate:", out["nearest_token_ids"].tolist())
print("losses:", out["losses"].tolist())
PY
