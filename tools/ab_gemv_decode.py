"""Same-session A/B: int8 decode with the streamed GEMV vs the XLA
dequantize-then-dot fallback (SUMMER_CLIP_GEMV=0), one geometry per run.

The decode programs are lru_cache-memoized, so the knob is read once at
trace time — run each arm in its own process:

    python tools/ab_gemv_decode.py gpt2        # 124M, kernel on
    SUMMER_CLIP_GEMV=0 python tools/ab_gemv_decode.py gpt2
    python tools/ab_gemv_decode.py gpt2-large  # 774M ClipGPT
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MAX_NEW = 128


def main() -> None:
    import jax

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    knob = os.environ.get("SUMMER_CLIP_GEMV", "1")
    print(f"backend={jax.default_backend()} model={name} GEMV={knob}", flush=True)

    from summer_clip_tpu.apps.gen_gpt import generate_device
    from summer_clip_tpu.engine import quant as Q
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    cfg = gpt2_mod.GPT2_CONFIGS[name]
    if name == "gpt2-large":
        import jax.numpy as jnp

        model = gpt2_mod.ClipGPT(cfg, clip_vocab_size=49408, clip_emb_dim=512,
                                 emb_hid_dim=1024, head_hid_dim=1024,
                                 dtype=jnp.bfloat16)
        vocab = 49408
    else:
        model = gpt2_mod.GPT2(cfg)
        vocab = cfg.vocab_size
    variables = {"params": jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))["params"]}
    qvars = {"params": Q.quantize_tree(variables["params"])}
    prompt = list(np.random.RandomState(0).randint(1, vocab, 16))

    if "--batched" in sys.argv:
        from summer_clip_tpu.apps.gen_gpt import generate_device_batched

        def run():
            generate_device_batched(model, qvars, [prompt] * 8,
                                    max_new_tokens=MAX_NEW,
                                    rng=jax.random.PRNGKey(1), quant_int8=True)
        n_tok, label = 8 * MAX_NEW, "int8 batched B=8"
    else:
        def run():
            generate_device(model, qvars, prompt, max_new_tokens=MAX_NEW,
                            rng=jax.random.PRNGKey(1), quant_int8=True)
        n_tok, label = MAX_NEW, "int8"

    t0 = time.perf_counter()
    run()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"[ab] {name} {label} GEMV={knob}: {n_tok / best:,.1f} tok/s "
          f"({best / n_tok * 1e3:.2f} ms/tok, best of 3)", flush=True)


if __name__ == "__main__":
    main()
