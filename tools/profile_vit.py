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


def timeit(fn, *args, iters=3, inner=16, label=""):
    """Per-stage time with the tunnel RTT amortized away.

    A single dispatch+fetch over the tunneled chip has a ~24-29ms floor, so
    sub-30ms stages are invisible one call at a time. Repeat the stage
    ``inner`` times INSIDE one jitted scan (input perturbed per step by the
    loop index so XLA cannot CSE the iterations) and fetch one checksum;
    per-iteration time = window / inner.
    """
    x0, rest = args[0], args[1:]

    @jax.jit
    def window(x0, *rest):
        def body(acc, i):
            y = fn(x0 + i.astype(x0.dtype) * jnp.asarray(1e-6, x0.dtype), *rest)
            return acc + jnp.sum(y).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(inner))
        return acc

    float(window(x0, *rest))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(window(x0, *rest))
        best = min(best, (time.perf_counter() - t0) / inner)
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
        v = jax.jit(pe.init)(rng, images[:1])
        timeit(lambda im, vv: pe.apply(vv, im), images, v,
               label=f"patch_embed[{mode}]")

    # -- one block, split -------------------------------------------------------
    from summer_clip_tpu.models.clip.modeling import MLP, Attention

    blk = ResidualAttentionBlock(cfg.vision_heads, dtype=dtype)
    bv = jax.jit(blk.init)(rng, tokens[:1])
    t_block = timeit(lambda x, vv: blk.apply(vv, x), tokens, bv,
                     label="one block (attn+mlp)")
    print(f"{'blocks x' + str(layers) + ' (extrapolated)':34s} "
          f"{t_block * layers * 1e3:8.2f} ms", flush=True)

    attn = Attention(cfg.vision_heads, dtype=dtype)
    av = jax.jit(attn.init)(rng, tokens[:1])
    timeit(lambda x, vv: attn.apply(vv, x), tokens, av, label="  attn only (ln excluded)")
    mlp = MLP(dtype=dtype)
    mv = jax.jit(mlp.init)(rng, tokens[:1])
    timeit(lambda x, vv: mlp.apply(vv, x), tokens, mv, label="  mlp only (ln excluded)")

    ln = LayerNormF32()
    lv = jax.jit(ln.init)(rng, tokens[:1])
    timeit(lambda x, vv: ln.apply(vv, x), tokens, lv, label="one LayerNormF32")

    # -- full transformer stack -------------------------------------------------
    tr = Transformer(layers, cfg.vision_heads, dtype=dtype)
    tv = jax.jit(tr.init)(rng, tokens[:1])
    timeit(lambda x, vv: tr.apply(vv, x), tokens, tv,
           label=f"transformer x{layers} (fused)")

    # -- full tower, both patch modes ------------------------------------------
    for mode in ("conv", "matmul"):
        model, _ = build_clip(name, dtype=dtype, patch_embed=mode)
        variables = jax.jit(model.init)(
            rng, jnp.zeros((1, res, res, 3), jnp.float32),
            jnp.zeros((1, cfg.context_length), jnp.int32))
        t = timeit(lambda im, vv: model.apply(vv, im, method=model.encode_image),
                   images, variables, label=f"full tower [{mode}]")
        print(f"{'-> throughput [' + mode + ']':34s} {batch / t:8.0f} img/s", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 128, args[1] if len(args) > 1 else "ViT-B/16")
