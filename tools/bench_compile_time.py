"""Compile-time A/B: unrolled block stack vs scan-over-layers (gpt2-large).

The tunneled chip's XLA compiles have measured 10-570s for gpt2-large
programs (docs/KERNELS.md) — dominated by program size, which grows
linearly with the 36 unrolled block copies. ``training.scan_layers``
(parallel/pp.py:scan_clip_gpt_forward) folds the stack into ONE
``lax.scan`` body. This measures, for the adapter-only ClipGPT train step
at the reference's geometry (``clip_prompt/train_gpt.py:143-206``):

  - trace ("lower") time, XLA compile time, and steady-state step time,
    unrolled vs scanned (both with per-block remat, bf16 tower),
  - the HLO instruction count of each program (the size lever itself).

Run on the TPU host: ``python tools/bench_compile_time.py [batch] [ctx]``.
CPU smoke: ``BENCH_CPU=1 python tools/bench_compile_time.py`` (test-gpt).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _hlo_instruction_count(compiled) -> int | None:
    """Instruction count of the optimized module: every HLO instruction
    prints as one ``%name = op(...)`` line in the text dump (the previously
    used ``computation_count()`` counts computations — while-loop bodies,
    fusions — not instructions, and undercounts the unrolled program)."""
    try:
        return sum(1 for line in compiled.as_text().splitlines()
                   if " = " in line)
    except Exception:
        return None


def build_steps(name: str, batch: int, ctx: int):
    import jax
    import jax.numpy as jnp
    import optax

    from summer_clip_tpu.apps.train_gpt import lm_loss_fn
    from summer_clip_tpu.models import gpt2 as gpt2_mod
    from summer_clip_tpu.parallel import scan_clip_gpt_forward, stack_block_params

    cfg = gpt2_mod.GPT2_CONFIGS[name]
    small = name == "test-gpt"
    kw = (dict(clip_vocab_size=256, clip_emb_dim=16, emb_hid_dim=16,
               head_hid_dim=16) if small else
          dict(clip_vocab_size=49408, clip_emb_dim=512, emb_hid_dim=1024,
               head_hid_dim=1024))
    dtype = jnp.float32 if small else jnp.bfloat16
    model = gpt2_mod.ClipGPT(cfg, dtype=dtype, remat=True, **kw)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8), jnp.int32))["params"]
    ids = jnp.asarray(np.random.RandomState(0).randint(
        1, kw["clip_vocab_size"], (batch, ctx)), jnp.int32)

    def label_of(p):
        return ("train" if gpt2_mod.clip_gpt_trainable_mask(p) else "freeze")

    def labels(tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        return jax.tree_util.tree_unflatten(
            treedef, [label_of(path) for path, _ in flat])

    tx = optax.multi_transform(
        {"train": optax.adamw(5e-4, weight_decay=0.1),
         "freeze": optax.set_to_zero()}, labels)

    def make(logits_of, p):
        opt_state = tx.init(p)

        @jax.jit
        def step(params, opt_state, ids):
            def loss_of(pp):
                return lm_loss_fn(logits_of(pp, ids), ids)
            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step, p, opt_state

    unrolled = make(
        lambda p, ids: model.apply({"params": p}, ids)["logits"], params)
    rest, stacked = stack_block_params(params, 1)
    scanned = make(
        lambda p, ids: scan_clip_gpt_forward(
            model, p["rest"], p["stacked"], ids, remat=True),
        {"rest": rest, "stacked": stacked})
    return {"unrolled": unrolled, "scan": scanned}, ids


def main() -> None:
    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    # compile cache OFF: this bench measures the cold compile itself
    if os.environ.get("BENCH_COMPILE_CACHE"):
        enable_persistent_cache()
    on_tpu = jax.default_backend() == "tpu"
    name = "gpt2-large" if on_tpu else "test-gpt"
    args = sys.argv[1:]
    batch = int(args[0]) if args else (8 if on_tpu else 2)
    ctx = int(args[1]) if len(args) > 1 else (1024 if on_tpu else 16)
    print(f"backend={jax.default_backend()} model={name} b={batch} ctx={ctx}",
          flush=True)

    steps, ids = build_steps(name, batch, ctx)
    losses = {}
    for tag, (step, p, opt) in steps.items():
        t0 = time.perf_counter()
        lowered = step.lower(p, opt, ids)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        n_instr = _hlo_instruction_count(compiled)
        t0 = time.perf_counter()
        p2, opt2, loss = compiled(p, opt, ids)
        losses[tag] = float(loss)
        t_first = time.perf_counter() - t0
        iters, best = (5 if on_tpu else 2), float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                p2, opt2, loss = compiled(p2, opt2, ids)
            assert np.isfinite(float(loss))
            best = min(best, (time.perf_counter() - t0) / iters)
        size = f", hlo_size={n_instr}" if n_instr else ""
        print(f"[{tag:8s}] lower {t_lower:6.1f}s | compile {t_compile:6.1f}s | "
              f"first step {t_first:5.1f}s | steady {best * 1e3:8.1f} ms/step"
              f"{size}", flush=True)
    # same math: the two programs must land on the same loss
    d = abs(losses["unrolled"] - losses["scan"])
    assert d < 5e-2, f"loss mismatch unrolled vs scan: {losses} (|d|={d})"
    print(f"loss agreement OK (|d|={d:.2e})", flush=True)


if __name__ == "__main__":
    main()
