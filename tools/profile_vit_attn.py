"""ViT-B/16 block-internals attribution + attention-variant A/B on the chip.

VERDICT r2 weak #2 follow-up: the tower sweep shows best-case 3.2k img/s
(b=32) FALLING with batch, and the stage profiler can't attribute inside a
block (per-dispatch tunnel floor ~2ms swamps 1-4ms ops). This amortizes
dispatch by scanning each candidate 12x (one dispatch = one "tower" of just
that op), at the ViT-B/16 geometry (T=197, D=768, H=12):

  - ln+mlp x12           (the MLP half of every block)
  - ln+attn x12          (the attention half: 4 projections + mha)
  - proj-only x12        (the 4 dense projections without the softmax core)
  - mha_reference x12    (the (B*H,T,T) softmax core as shipped)
  - mha no-transpose x12 (einsum form: no materialized (B,H,T,hd) transposes)
  - flash kernel x12     (Pallas, pads 197->256 internally)
  - token-pad-256 x12    (reference core on T padded to 256: MXU-aligned)

Run: python tools/profile_vit_attn.py [batch ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LAYERS = 12
HEADS = 12
WIDTH = 768
TOKENS = 197


def main(batches) -> None:
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache
    from summer_clip_tpu.models.clip.modeling import MLP, Attention, LayerNormF32
    from summer_clip_tpu.ops.attention import (flash_attention, mha_reference,
                                               short_attention)

    enable_persistent_cache()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = jax.random.PRNGKey(0)
    hd = WIDTH // HEADS

    def timeit(fn, *args, iters=8, label=""):
        out = fn(*args)
        # warmup must FETCH a value: on the tunneled TPU block_until_ready
        # does not prove execution (CLAUDE.md / bench.py)
        float(jnp.sum(sum(jax.tree_util.tree_leaves(out))
                      if isinstance(out, (tuple, list)) else out
                      ).astype(jnp.float32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            float(sum(jnp.sum(o).astype(jnp.float32) for o in outs))
            best = min(best, (time.perf_counter() - t0) / iters)
        per_layer = best / LAYERS * 1e3
        print(f"  {label:26s} {best * 1e3:8.2f} ms/stack  ({per_layer:6.3f} ms/layer)",
              flush=True)
        return best

    for batch in batches:
        x = jax.random.normal(rng, (batch, TOKENS, WIDTH), dtype)
        print(f"b={batch} T={TOKENS} D={WIDTH} H={HEADS} ({jax.default_backend()}, {dtype.__name__})",
              flush=True)

        # ---- ln+mlp x12 ------------------------------------------------------
        mlp = MLP(dtype=dtype)
        ln = LayerNormF32()
        mv = jax.jit(mlp.init)(rng, x[:1])
        lv = jax.jit(ln.init)(rng, x[:1])

        @jax.jit
        def mlp_stack(x, mv, lv):
            for _ in range(LAYERS):
                x = x + mlp.apply(mv, ln.apply(lv, x))
            return x

        timeit(mlp_stack, x, mv, lv, label="ln+mlp x12")

        # ---- ln+attn x12 -----------------------------------------------------
        attn = Attention(HEADS, dtype=dtype)
        av = jax.jit(attn.init)(rng, x[:1])

        @jax.jit
        def attn_stack(x, av, lv):
            for _ in range(LAYERS):
                x = x + attn.apply(av, ln.apply(lv, x))
            return x

        timeit(attn_stack, x, av, lv, label="ln+attn x12")

        # ---- projections only x12 (4 dense per layer, no softmax core) -------
        import flax.linen as nn

        class ProjOnly(nn.Module):
            @nn.compact
            def __call__(self, x):
                q = nn.Dense(WIDTH, dtype=dtype, name="q_proj")(x)
                k = nn.Dense(WIDTH, dtype=dtype, name="k_proj")(x)
                v = nn.Dense(WIDTH, dtype=dtype, name="v_proj")(x)
                return nn.Dense(WIDTH, dtype=dtype, name="out_proj")(q + k + v)

        proj = ProjOnly()
        pv = jax.jit(proj.init)(rng, x[:1])

        @jax.jit
        def proj_stack(x, pv):
            for _ in range(LAYERS):
                x = proj.apply(pv, x)
            return x

        timeit(proj_stack, x, pv, label="4-proj only x12")

        # ---- attention cores x12 (shape-preserving: o is (B,T,D) again) ------
        def split(z):
            return z.reshape(batch, TOKENS, HEADS, hd).transpose(0, 2, 1, 3)

        @jax.jit
        def core_ref(x):
            for _ in range(LAYERS):
                o = mha_reference(split(x), split(x), split(x))
                x = o.transpose(0, 2, 1, 3).reshape(batch, TOKENS, WIDTH)
            return x

        timeit(core_ref, x, label="mha_reference x12")

        @jax.jit
        def core_einsum(x):
            for _ in range(LAYERS):
                q = x.reshape(batch, TOKENS, HEADS, hd)
                s = jnp.einsum("bqhd,bkhd->bhqk", q, q) / np.sqrt(hd)
                p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
                o = jnp.einsum("bhqk,bkhd->bqhd", p, q)
                x = o.reshape(batch, TOKENS, WIDTH)
            return x

        timeit(core_einsum, x, label="mha einsum-no-T x12")

        @jax.jit
        def core_flash(x):
            for _ in range(LAYERS):
                qh = split(x).reshape(batch * HEADS, TOKENS, hd)
                o = flash_attention(qh, qh, qh, block_q=128, block_k=128)
                x = (o.reshape(batch, HEADS, TOKENS, hd)
                     .transpose(0, 2, 1, 3).reshape(batch, TOKENS, WIDTH))
            return x

        timeit(core_flash, x, label="flash kernel x12")

        @jax.jit
        def core_short(x):
            for _ in range(LAYERS):
                qh = split(x).reshape(batch * HEADS, TOKENS, hd)
                o = short_attention(qh, qh, qh)
                x = (o.reshape(batch, HEADS, TOKENS, hd)
                     .transpose(0, 2, 1, 3).reshape(batch, TOKENS, WIDTH))
            return x

        timeit(core_short, x, label="short fused (VMEM) x12")

        # token-pad to 256: every matmul MXU-aligned, padded keys masked
        tp_ = 256
        neg = jnp.full((tp_ - TOKENS,), -1e30, jnp.float32)

        @jax.jit
        def core_pad256(x):
            xp = jnp.pad(x, ((0, 0), (0, tp_ - TOKENS), (0, 0)))
            bias = jnp.concatenate([jnp.zeros((TOKENS,), jnp.float32), neg])
            for _ in range(LAYERS):
                q = xp.reshape(batch, tp_, HEADS, hd).transpose(0, 2, 1, 3)
                s = jnp.einsum("bhqd,bhkd->bhqk", q, q) / np.sqrt(hd) + bias
                p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", p, q)
                xp = o.transpose(0, 2, 1, 3).reshape(batch, tp_, WIDTH)
            return xp[:, :TOKENS]

        timeit(core_pad256, x, label="mha pad-T256 x12")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [32, 128])
