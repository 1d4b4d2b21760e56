"""Speculative-decoding machinery cost on the chip: is the draft worth it?

Greedy speculation (engine/speculative.py) emits 1 + E[accepted] tokens per
iteration; one iteration costs k+1 draft single-token steps + ONE target
(k+1)-token verify forward. This bench measures, at the reference's decode
scale (gpt2-large target, gpt2-124M-geometry draft, both bridged to the
49408-token CLIP vocab):

  - t_solo   : target-only per-token cost (generate_device scan),
  - t_iter(k): speculative per-iteration cost with random weights (worst
               case: ~0 acceptance — the loop runs max_new iterations),
  - break-even acceptance a* where (1+a) / t_iter >= 1 / t_solo, and the
    implied speedup at draft-agreement rates published for greedy
    speculation (0.6-0.8 for a same-family 6x-smaller draft).

Real acceptance needs trained weights (absent in this image) — the bench
pins the machinery cost so the speedup model has measured constants.
Run: ``python tools/bench_speculative.py [max_new]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _bit_identical_check(target, tvars, draft, dvars, prompt, max_new):
    from summer_clip_tpu.apps.gen_gpt import generate_device
    from summer_clip_tpu.engine.speculative import generate_device_speculative

    solo = generate_device(target, tvars, prompt, max_new_tokens=max_new,
                           top_k=1, rng=__import__("jax").random.PRNGKey(0))
    spec = generate_device_speculative(target, tvars, draft, dvars, prompt,
                                       max_new_tokens=max_new, k=4)
    assert spec == solo, "speculative output diverged from target greedy"


def main(max_new: int = 64) -> None:
    import os

    import jax

    if os.environ.get("BENCH_CPU"):
        # the axon plugin ignores JAX_PLATFORMS env; this works pre-init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from summer_clip_tpu.apps.gen_gpt import generate_device
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.engine.speculative import generate_device_speculative
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    enable_persistent_cache()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tcfg = gpt2_mod.GPT2_CONFIGS["gpt2-large" if on_tpu else "test-gpt"]
    dcfg = gpt2_mod.GPT2_CONFIGS["gpt2"] if on_tpu else None
    import dataclasses

    if dcfg is None:  # CPU smoke: half-size draft of the tiny target
        dcfg = dataclasses.replace(tcfg, n_embd=16, n_layer=1)
    if dcfg.vocab_size != tcfg.vocab_size:
        dcfg = dataclasses.replace(dcfg, vocab_size=tcfg.vocab_size)
    target = gpt2_mod.GPT2(tcfg, dtype=dtype)
    draft = gpt2_mod.GPT2(dcfg, dtype=dtype)
    tvars = {"params": jax.jit(target.init)(
        jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))["params"]}
    dvars = {"params": jax.jit(draft.init)(
        jax.random.PRNGKey(1), np.zeros((1, 4), np.int32))["params"]}
    prompt = list(np.random.RandomState(0).randint(1, tcfg.vocab_size, 16))

    _bit_identical_check(target, tvars, draft, dvars, prompt, 16)
    print("exactness check vs target greedy: OK", file=sys.stderr)

    def timed(fn, reps=3):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            # value fetch proves execution on the tunneled chip
            _ = int(out[-1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_solo = timed(lambda: generate_device(
        target, tvars, prompt, max_new_tokens=max_new, top_k=1,
        rng=jax.random.PRNGKey(0))) / max_new
    print(f"solo target decode: {t_solo * 1e3:.2f} ms/token "
          f"({1.0 / t_solo:.1f} tok/s)")

    for k in (2, 4, 8):
        # random weights -> ~0 acceptance: every iteration emits ~1 token,
        # so wall/max_new IS the per-iteration cost
        t = timed(lambda k=k: generate_device_speculative(
            target, tvars, draft, dvars, prompt, max_new_tokens=max_new, k=k))
        t_iter = t / max_new
        breakeven = t_iter / t_solo - 1.0
        line = (f"k={k}: iter {t_iter * 1e3:.2f} ms, break-even E[accept] "
                f"{breakeven:.2f}")
        for acc in (0.6, 0.8):
            # per-token agreement alpha -> E[accepted] = sum_i alpha^i
            e_a = sum(acc ** i for i in range(1, k + 1))
            speed = (1 + e_a) * t_solo / t_iter
            line += f", speedup@{acc:.0%}-agree={speed:.2f}x"
        print(line)

    # int8-as-stored arm (Pallas GEMV inside the while_loop body): proves
    # the quant path lowers + runs on the chip and prices its iteration
    from summer_clip_tpu.engine.quant import quantize_tree

    qt = {"params": quantize_tree(tvars["params"])}
    qd = {"params": quantize_tree(dvars["params"])}
    t_solo_q = timed(lambda: generate_device(
        target, qt, prompt, max_new_tokens=max_new, top_k=1,
        rng=jax.random.PRNGKey(0), quant_int8=True)) / max_new
    print(f"solo target decode int8: {t_solo_q * 1e3:.2f} ms/token "
          f"({1.0 / t_solo_q:.1f} tok/s)")
    t_q = timed(lambda: generate_device_speculative(
        target, qt, draft, qd, prompt, max_new_tokens=max_new, k=4,
        quant_int8=True, draft_quant_int8=True)) / max_new
    print(f"k=4 int8 target+draft: iter {t_q * 1e3:.2f} ms, break-even "
          f"E[accept] {t_q / t_solo_q - 1.0:.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
