"""Piecewise ViT timing on the real chip: patch-embed / blocks / head.

VERDICT r2 weak #2: ViT-B/16 runs at 57% of MXU peak and nobody has shown
where the other 43% goes. Each stage is built standalone at the shapes the
full tower sees (batch x 197 x 768 for B/16 @ 224) and timed with a
synchronizing scalar fetch; the block is additionally split into
attention vs MLP. Compare `--patch-embed matmul` (explicit extract + GEMM)
against the conv emitter, and per-stage sums against the full tower.

Run on the tunneled TPU: ``python tools/profile_vit.py [batch] [model]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from summer_clip_tpu.models.clip import build_clip
from summer_clip_tpu.models.clip.configs import CLIP_CONFIGS
from summer_clip_tpu.models.clip.modeling import (
    LayerNormF32, PatchEmbed, ResidualAttentionBlock, Transformer,
)


def timeit(fn, *args, iters=5, label=""):
    out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main(batch: int = 128, name: str = "ViT-B/16") -> None:
    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = CLIP_CONFIGS[name]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    res, p, width = cfg.image_resolution, int(cfg.vision_patch_size), cfg.vision_width
    n_tokens = (res // p) ** 2 + 1
    layers = int(cfg.vision_layers)
    print(f"{name} b={batch} res={res} tokens={n_tokens} width={width} "
          f"layers={layers} ({jax.default_backend()}, {dtype.__name__})", flush=True)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, res, res, 3), dtype)
    tokens = jax.random.normal(rng, (batch, n_tokens, width), dtype)

    # -- patch embed, both modes ------------------------------------------------
    for mode in ("conv", "matmul"):
        pe = PatchEmbed(width, p, dtype=dtype, mode=mode)
        v = pe.init(rng, images[:1])
        timeit(jax.jit(lambda vv, im: pe.apply(vv, im)), v, images,
               label=f"patch_embed[{mode}]")

    # -- one block, split -------------------------------------------------------
    blk = ResidualAttentionBlock(cfg.vision_heads, dtype=dtype)
    bv = blk.init(rng, tokens[:1])
    t_block = timeit(jax.jit(lambda vv, x: blk.apply(vv, x)), bv, tokens,
                     label="one block (attn+mlp)")
    print(f"{'blocks x' + str(layers) + ' (extrapolated)':34s} "
          f"{t_block * layers * 1e3:8.2f} ms", flush=True)

    ln = LayerNormF32()
    lv = ln.init(rng, tokens[:1])
    timeit(jax.jit(lambda vv, x: ln.apply(vv, x)), lv, tokens, label="one LayerNormF32")

    # -- full transformer stack -------------------------------------------------
    tr = Transformer(layers, cfg.vision_heads, dtype=dtype)
    tv = tr.init(rng, tokens[:1])
    timeit(jax.jit(lambda vv, x: tr.apply(vv, x)), tv, tokens,
           label=f"transformer x{layers} (fused)")

    # -- full tower, both patch modes ------------------------------------------
    for mode in ("conv", "matmul"):
        model, _ = build_clip(name, dtype=dtype, patch_embed=mode)
        variables = jax.jit(model.init)(
            rng, jnp.zeros((1, res, res, 3), jnp.float32),
            jnp.zeros((1, cfg.context_length), jnp.int32))
        t = timeit(jax.jit(lambda vv, im: model.apply(vv, im, method=model.encode_image)),
                   variables, images, label=f"full tower [{mode}]")
        print(f"{'-> throughput [' + mode + ']':34s} {batch / t:8.0f} img/s", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 128, args[1] if len(args) > 1 else "ViT-B/16")
