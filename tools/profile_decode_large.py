"""Attribute gpt2-large single-stream decode time (the serving latency path).

Measured context (KERNELS.md): f32 146-163 tok/s, bf16 182, int8 252.8 —
int8 sits at ~24% of ITS param-read roofline while f32 sits at ~59%, so
something besides weight bytes dominates once the weights shrink. Two
suspects, isolated here with single-purpose scan programs:

1. **lm-head recompute**: ClipGPT's logits read
   ``adapter_head(clip_emb)`` — a 49,408-row (512->1024->1280) MLP,
   ~181 GFLOP + a ~126MB bf16 table materialization. Outside a barrier XLA
   hoists it out of the decode scan (loop-invariant); the int8 path's
   anti-hoist ``optimization_barrier`` (engine/quant.py) pins ALL params
   in-loop, so the full table recompute lands on EVERY token.
2. **dequant materialization**: in-loop ``dequantize_tree`` writes a full
   bf16 weight copy to HBM and the dots read it back (~3GB/tok round-trip)
   instead of streaming int8 into VMEM (~0.74GB).

Each section is one ``lax.scan`` jit over STEPS iterations; timing closes
with a scalar fetch (CLAUDE.md: block_until_ready does not prove execution
over the tunnel). Run: ``python tools/profile_decode_large.py [section ...]``
with sections from: head core attn full.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

D, L, H, V, CE, AH = 1280, 36, 20, 49408, 512, 1024  # gpt2-large ClipGPT
T_KV = 1152  # 1024-ctx prompt + 128 new: the bench_gpt_large cache length
STEPS = 64


def _time_scan(body, init_args, label: str) -> float:
    """Jit a STEPS-iteration scan over ``body``; return ms/step (best of 3)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def step(carry, _):
            return body(carry, args), None
        out, _ = jax.lax.scan(step, jnp.zeros((8, D), jnp.bfloat16), None,
                              length=STEPS)
        return out.astype(jnp.float32).sum()

    t0 = time.perf_counter()
    float(run(init_args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(run(init_args))
        assert np.isfinite(s)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"[{label}] {best * 1e3:.3f} ms/step (compile {compile_s:.1f}s)",
          flush=True)
    return best


def _carry_mix(x, y):
    """Fold a (.., D) result back into the (8, D) bf16 carry (keeps every
    step's work live without growing shapes)."""
    import jax.numpy as jnp

    y = y.astype(jnp.float32)
    flat = y.reshape(-1)[: 8 * D]
    pad = jnp.zeros((8 * D,), jnp.float32).at[: flat.shape[0]].set(flat)
    return (x.astype(jnp.float32) * 0.5 + 0.01 * pad.reshape(8, D)).astype(
        jnp.bfloat16)


def section_head() -> None:
    """lm-head variants: hoisted table read vs in-loop recompute."""
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.engine import quant as Q

    r = np.random.RandomState(0)
    table = jnp.asarray(r.randn(V, D) * 0.02, jnp.float32)
    clip_emb = jnp.asarray(r.randn(V, CE) * 0.02, jnp.float32)
    a1 = jnp.asarray(r.randn(CE, AH) * 0.02, jnp.float32)
    a2 = jnp.asarray(r.randn(AH, D) * 0.02, jnp.float32)

    def head_read(carry, args):
        (tbl,) = jax.lax.optimization_barrier(args)
        if isinstance(tbl, dict):
            tbl = (tbl["q"].astype(jnp.float32) * tbl["scale"]).astype(jnp.bfloat16)
        logits = jnp.dot(carry[:1].astype(tbl.dtype), tbl.T,
                         preferred_element_type=jnp.float32)
        return _carry_mix(carry, logits)

    _time_scan(head_read, (table,), "head read f32 (49408x1280)")
    _time_scan(head_read, (table.astype(jnp.bfloat16),), "head read bf16")
    _time_scan(head_read, (Q._quant_leaf(table, per_row=False),),
               "head read int8+deq (current in-loop cost, table form)")

    def head_recompute(carry, args):
        ce, w1, w2 = jax.lax.optimization_barrier(args)
        tbl = jnp.maximum(jnp.dot(ce, w1, preferred_element_type=jnp.float32), 0)
        tbl = jnp.maximum(jnp.dot(tbl.astype(jnp.bfloat16), w2,
                                  preferred_element_type=jnp.float32), 0)
        logits = jnp.dot(carry[:1], tbl.astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.float32)
        return _carry_mix(carry, logits)

    bf = jnp.bfloat16
    _time_scan(head_recompute,
               (clip_emb.astype(bf), a1.astype(bf), a2.astype(bf)),
               "head RECOMPUTE bf16 (what the int8 path does today)")


def section_core() -> None:
    """36 layers of the 4 block GEMVs (no attention/LN): weight traffic."""
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.engine import quant as Q

    r = np.random.RandomState(1)
    def mk(shape):
        return jnp.asarray(r.randn(*shape).astype(np.float32) * 0.02)

    layers = [
        {"qkv": mk((D, 3 * D)), "proj": mk((D, D)),
         "fc": mk((D, 4 * D)), "proj2": mk((4 * D, D))}
        for _ in range(L)
    ]

    def gemvs(carry, args):
        ls = jax.lax.optimization_barrier(args)
        x = carry[:1]
        for lw in ls:
            if isinstance(lw["qkv"], dict):
                lw = {k: (v["q"].astype(jnp.float32) * v["scale"]).astype(jnp.bfloat16)
                      for k, v in lw.items()}
            dt = lw["qkv"].dtype
            qkv = jnp.dot(x.astype(dt), lw["qkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :D]
            o = jnp.dot(q.astype(dt), lw["proj"], preferred_element_type=jnp.float32)
            h = jnp.dot(o.astype(dt), lw["fc"], preferred_element_type=jnp.float32)
            h = jax.nn.gelu(h, approximate=True)
            x = jnp.dot(h.astype(dt), lw["proj2"], preferred_element_type=jnp.float32)
            x = x.astype(jnp.bfloat16)
        return _carry_mix(carry, x)

    _time_scan(gemvs, tuple(layers), "core 36x4 GEMVs f32")
    bf_layers = tuple({k: v.astype(jnp.bfloat16) for k, v in lw.items()}
                      for lw in layers)
    _time_scan(gemvs, bf_layers, "core 36x4 GEMVs bf16")
    q_layers = tuple({k: Q._quant_leaf(v, per_row=False) for k, v in lw.items()}
                     for lw in layers)
    _time_scan(gemvs, q_layers, "core 36x4 GEMVs int8+in-loop deq (current)")

    def gemvs_scale_after(carry, args):
        ls = jax.lax.optimization_barrier(args)
        x = carry[:1]
        for lw in ls:
            def dot(a, leaf):
                y = jnp.dot(a.astype(jnp.bfloat16), leaf["q"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return y * leaf["scale"]
            qkv = dot(x, lw["qkv"])
            o = dot(qkv[:, :D], lw["proj"])
            h = jax.nn.gelu(dot(o, lw["fc"]), approximate=True)
            x = dot(h, lw["proj2"]).astype(jnp.bfloat16)
        return _carry_mix(carry, x)

    _time_scan(gemvs_scale_after, q_layers,
               "core int8 scale-after-dot (tests operand-convert fusion)")


def section_gemv() -> None:
    """36 layers of the 4 block GEMVs through ops/gemv.qdot (the shipped
    int8 route): prices the streamed kernel chain alone — the gap between
    this and the int8 weight-read floor is per-call kernel overhead."""
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.engine import quant as Q
    from summer_clip_tpu.ops.gemv import qdot

    r = np.random.RandomState(1)

    def mk(shape):
        return Q._quant_leaf(
            jnp.asarray(r.randn(*shape).astype(np.float32) * 0.02),
            per_row=False)

    layers = [
        {"qkv": mk((D, 3 * D)), "proj": mk((D, D)),
         "fc": mk((D, 4 * D)), "proj2": mk((4 * D, D))}
        for _ in range(L)
    ]
    int8_bytes = sum(lw[k]["q"].size for lw in layers for k in lw)
    print(f"[gemv] int8 weight bytes/step: {int8_bytes / 1e6:.0f} MB "
          f"-> {int8_bytes / 819e9 * 1e3:.2f} ms read floor", flush=True)

    def gemvs(carry, args):
        ls = jax.lax.optimization_barrier(args)
        x = carry[:1]
        for lw in ls:
            qkv = qdot(x, lw["qkv"], jnp.float32)
            o = qdot(qkv[:, :D], lw["proj"], jnp.float32)
            h = jax.nn.gelu(qdot(o, lw["fc"], jnp.float32), approximate=True)
            x = qdot(h, lw["proj2"], jnp.float32)
        return _carry_mix(carry, x)

    _time_scan(gemvs, tuple(layers), "core 36x4 GEMVs int8 STREAMED (qdot)")


def section_attn() -> None:
    """36 one-token attention reads against the full (1, T_KV, D) cache."""
    import jax
    import jax.numpy as jnp

    from summer_clip_tpu.ops.attention import multi_head_attention

    r = np.random.RandomState(2)
    caches = tuple(
        {"k": jnp.asarray(r.randn(1, T_KV, D).astype(np.float32)),
         "v": jnp.asarray(r.randn(1, T_KV, D).astype(np.float32))}
        for _ in range(L))
    mask = jnp.where(jnp.arange(T_KV)[None, :] <= 600, 0.0, -1e30).astype(
        jnp.float32)[None]

    def attn(carry, args):
        cs = jax.lax.optimization_barrier(args)
        x = carry[:1, None, :]  # (1, 1, D)
        for c in cs:
            x = multi_head_attention(x.astype(jnp.float32), c["k"], c["v"],
                                     num_heads=H, mask=mask, use_flash=False)
        return _carry_mix(carry, x[:, 0])

    _time_scan(attn, caches, f"attn 36x one-token reads (T={T_KV}, f32 cache)")


def section_full() -> None:
    """Reference full decode numbers for this session (same as bench)."""
    from tools.bench_gpt_large import bench_decode

    bench_decode()


def main() -> None:
    import jax

    from summer_clip_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    sections = sys.argv[1:] or ["head", "core", "attn"]
    for s in sections:
        try:
            globals()[f"section_{s}"]()
        except Exception as e:  # keep later sections alive
            print(f"[{s}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
