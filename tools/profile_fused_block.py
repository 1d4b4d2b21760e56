"""A/B the tower-block fusion modes on the chip: xla vs attn vs block.

Round-3 decision record for FUSED_BLOCK_MODE (models/clip/modeling.py):
runs the full image tower (and the text tower at its classifier-build
batch) under each mode and prints steady-state img/s / text-rows/s.

    python tools/profile_fused_block.py [ViT-B/16 ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODES = ("xla", "attn", "block", "mlp")  # mlp = packed attention + fused MLP


def _steady(fn, *args, iters=16):
    import jax.numpy as jnp

    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(sum(outs))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(models) -> None:
    import jax
    import jax.numpy as jnp

    import summer_clip_tpu.models.clip.modeling as M
    import summer_clip_tpu.ops.attention as A
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.models.clip import build_clip

    enable_persistent_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    rng = jax.random.PRNGKey(0)
    for name in models:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        model, cfg = build_clip(name, dtype=dtype)
        variables = jax.jit(model.init)(
            rng, jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3),
                           jnp.float32),
            jnp.zeros((1, cfg.context_length), jnp.int32))
        for batch in (32, 64, 128):
            im = jax.random.normal(rng, (batch, cfg.image_resolution,
                                         cfg.image_resolution, 3), dtype)
            for mode in MODES:
                M.FUSED_BLOCK_MODE = mode
                # "xla" must be a TRUE no-Pallas baseline: also disable the
                # packed short-attention auto-select for that row
                A.SHORT_FUSED_ENABLED = mode != "xla"
                f = jax.jit(lambda v, im: jnp.sum(model.apply(
                    v, im, method=model.encode_image).astype(jnp.float32)))
                dt = _steady(f, variables, im)
                print(f"{name} image b={batch} mode={mode:5s}: "
                      f"{dt * 1e3:7.2f} ms = {batch / dt:6.0f} img/s", flush=True)
        # text tower at zeroshot-classifier-build shape (C*T rows of 77 ids)
        rows = 512
        ids = jax.random.randint(rng, (rows, cfg.context_length), 1, 49000)
        ids = ids.at[:, -1].set(49407)
        for mode in MODES:
            M.FUSED_BLOCK_MODE = mode
            A.SHORT_FUSED_ENABLED = mode != "xla"
            g = jax.jit(lambda v, ids: jnp.sum(model.apply(
                v, ids, method=model.encode_text).astype(jnp.float32)))
            dt = _steady(g, variables, ids)
            print(f"{name} text  b={rows} mode={mode:5s}: "
                  f"{dt * 1e3:7.2f} ms = {rows / dt:6.0f} rows/s", flush=True)
        M.FUSED_BLOCK_MODE = "attn"
        A.SHORT_FUSED_ENABLED = True


if __name__ == "__main__":
    main(sys.argv[1:] or ["ViT-B/16"])
