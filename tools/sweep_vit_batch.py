"""ViT encode batch-size sweep (steady-state), mirroring the RN50 sweep that
found batch 128 = 10.6k img/s. Records the machine-readable context VERDICT
r1 weak #5 asked for (ViT-B/16's 2,383 img/s had no baseline/batch context).

    python tools/sweep_vit_batch.py [model ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sweep(model_name: str, batches, patch_embed: str = "conv") -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.models.clip import build_clip

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, cfg = build_clip(model_name, dtype=dtype, patch_embed=patch_embed)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(rng, jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32),
                           jnp.zeros((1, cfg.context_length), jnp.int32))

    @jax.jit
    def encode_checksum(variables, images):
        return jnp.sum(model.apply(variables, images, method=model.encode_image)
                       .astype(jnp.float32))

    print(f"{model_name}  (res {cfg.image_resolution}, {jax.default_backend()}, "
          f"patch_embed={patch_embed})")
    for batch in batches:
        images = jax.random.normal(rng, (batch, cfg.image_resolution, cfg.image_resolution, 3), dtype)
        t0 = time.perf_counter()
        float(encode_checksum(variables, images))
        compile_s = time.perf_counter() - t0
        iters = max(2048 // batch, 8)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [encode_checksum(variables, images) for _ in range(iters)]
            float(sum(outs))
            dt = time.perf_counter() - t0
            best = max(best, batch * iters / dt)
        print(f"  batch {batch:4}: {best:7.0f} img/s  ({batch / best * 1e3:.2f} ms/batch, "
              f"compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    # usage: sweep_vit_batch.py [model ...] [--patch-embed matmul]
    args = sys.argv[1:]
    pe = "conv"
    if "--patch-embed" in args:
        i = args.index("--patch-embed")
        pe = args[i + 1]
        args = args[:i] + args[i + 2:]
    models = args or ["ViT-B/16"]
    for m in models:
        sweep(m, [32, 64, 128, 256, 512], patch_embed=pe)
