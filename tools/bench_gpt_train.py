"""GPT-2 training-step throughput on the real chip (tokens/sec).

The training side of the framework (ClipGPT pretraining, reference
``clip_prompt/gpt/train_gpt.py``) had no recorded end-to-end on-chip
number. This times the FULL jitted train step — forward, loss, backward,
AdamW update — for GPT-2 small (124M) at context 1024, bf16 activations /
f32 params+optimizer, steady-state windows with one closing fetch.

Run on the tunneled TPU: ``python tools/bench_gpt_train.py [batch]``.
Results -> docs/KERNELS.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(batch: int = 8, ctx: int = 1024, name: str = "gpt2") -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    enable_persistent_cache()
    cfg = gpt2_mod.GPT2_CONFIGS[name]
    model = gpt2_mod.GPT2(cfg, dtype=jnp.bfloat16)
    ids = jnp.asarray(np.random.RandomState(0).randint(
        1, cfg.vocab_size, (batch, ctx)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]
    tx = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    from summer_clip_tpu.apps.train_gpt import lm_loss_fn

    @jax.jit
    def train_step(params, opt_state, ids):
        def loss_of(p):
            return lm_loss_fn(model.apply({"params": p}, ids)["logits"], ids)
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = train_step(params, opt_state, ids)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(loss={float(loss):.3f})", flush=True)

    step_flops = None
    try:
        ca = jax.jit(train_step).lower(params, opt_state, ids).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        step_flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    iters, best = 20, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        losses = []
        for _ in range(iters):
            params, opt_state, loss = train_step(params, opt_state, ids)
            losses.append(loss)
        assert float(sum(l.astype(jnp.float32) for l in losses)) > 0  # fetch closes window
        best = min(best, (time.perf_counter() - t0) / iters)
    toks = batch * ctx / best
    msg = (f"{name} train step: batch={batch} ctx={ctx} -> {best * 1e3:.1f} ms/step, "
           f"{toks:,.0f} tokens/s")
    if step_flops:
        msg += f", {step_flops / best / 1e12:.1f} TFLOP/s ({step_flops / best / 197e12:.0%} of v5e bf16 peak)"
    print(msg, flush=True)


if __name__ == "__main__":
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
