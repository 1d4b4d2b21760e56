"""KV-cached sampling throughput: host-loop vs device-scan decode.

The host loop (apps/gen_gpt.py:generate) fetches the picked token and
re-dispatches per step — >= 2 tunnel round-trips per token on the remote
chip. generate_device runs prefill + the whole decode as one lax.scan jit.
Run: ``python tools/bench_generate.py [max_new_tokens]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(max_new: int = 128) -> None:
    import jax

    from summer_clip_tpu.apps.gen_gpt import generate, generate_device
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.models import gpt2 as gpt2_mod

    enable_persistent_cache()
    cfg = gpt2_mod.GPT2_CONFIGS["gpt2"]
    model = gpt2_mod.GPT2(cfg)
    prompt = list(np.random.RandomState(0).randint(1, cfg.vocab_size, 16))
    variables = {"params": jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))["params"]}

    import functools

    from summer_clip_tpu.apps.gen_gpt import generate_device_batched

    def batched8(model, variables, prompt, **kw):
        outs = generate_device_batched(model, variables, [prompt] * 8, **kw)
        return outs[0]

    # weight-only compression variants: decode is parameter-read-bound
    # (docs/KERNELS.md), so bf16 params halve and int8 quarters the
    # per-token HBM traffic floor (engine/quant.py)
    import jax.numpy as jnp

    from summer_clip_tpu.engine import quant as Q

    model_bf16 = gpt2_mod.GPT2(cfg, dtype=jnp.bfloat16)
    vars_bf16 = {"params": Q.cast_params(variables["params"])}
    vars_int8 = {"params": Q.quantize_tree(variables["params"])}

    def bf16_params(model_ignored, variables_ignored, prompt, **kw):
        return generate_device(model_bf16, vars_bf16, prompt, **kw)

    def int8_weights(model_ignored, variables_ignored, prompt, **kw):
        return generate_device(model_bf16, vars_int8, prompt, quant_int8=True, **kw)

    variants = [
        ("device-scan", generate_device),
        ("device-scan approx_top_k", functools.partial(generate_device, approx_top_k=True)),
        ("device-scan batched B=8 (per-row tokens/s x8)", batched8),
        ("device-scan bf16 params", bf16_params),
        ("device-scan int8 weights", int8_weights),
        ("host-loop", generate),
    ]
    for name, fn in variants:
        t0 = time.perf_counter()
        out = fn(model, variables, prompt, max_new_tokens=int(max_new),
                 rng=jax.random.PRNGKey(1))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = fn(model, variables, prompt, max_new_tokens=int(max_new),
                  rng=jax.random.PRNGKey(1))
        dt = time.perf_counter() - t0
        assert out == out2
        print(f"{name}: {max_new / dt:,.1f} tokens/s "
              f"({dt * 1e3 / max_new:.1f} ms/token; first call incl. compile {warm:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
