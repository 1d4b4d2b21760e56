"""Probe: is int8 MXU arithmetic a real 2x lever for the frozen towers?

v5e's MXU runs int8 x int8 -> int32 at ~394 TOPS vs ~197 TFLOP/s bf16.
Both towers are MXU-bound (RN50 61%, ViT-B/16 57% of bf16 peak —
docs/KERNELS.md), so a working int8 path could raise the feature-extraction
headline well past 1.06x. This tool answers, ON CHIP, the three questions
that decide whether to build it:

1. raw GEMM: does XLA emit native int8 matmuls at ViT shapes, and at what
   speedup over bf16?
2. quant overhead: with dynamic per-row activation quantization + per-column
   weight scales + int32->f32 rescale folded in (the real inference recipe),
   what does the end-to-end quantized dense cost vs the bf16 one?
3. convs: does lax.conv_general_dilated accept int8 operands on TPU at
   RN50's stage shapes (stem 3x3, bottleneck 1x1/3x3), and at what speed?

Run: python tools/bench_int8_mxu.py  (safe anywhere; CPU just slower)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from summer_clip_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _time(fn, *args, iters: int = 20, repeats: int = 3) -> float:
    """Best steady-state seconds/call; one value fetch closes each window
    (block_until_ready does not prove execution through the tunnel)."""
    out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]).astype(jnp.float32))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        s = sum(jnp.sum((o if isinstance(o, jax.Array) else o[0]).astype(jnp.float32))
                for o in outs)
        float(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_raw_gemm(m: int, k: int, n: int) -> None:
    """Q1: native int8 GEMM vs bf16 at a given shape."""
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    abf = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    bbf = jnp.asarray(rng.randn(k, n), jnp.bfloat16)

    @jax.jit
    def dot_i8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    @jax.jit
    def dot_bf(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    flops = 2.0 * m * k * n
    t_bf = _time(dot_bf, abf, bbf)
    t_i8 = _time(dot_i8, a8, b8)
    log(f"[gemm {m}x{k}x{n}] bf16 {t_bf*1e3:7.3f}ms ({flops/t_bf/1e12:6.1f} TFLOP/s)  "
        f"int8 {t_i8*1e3:7.3f}ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
        f"speedup {t_bf/t_i8:.2f}x")


def bench_quantized_dense(m: int, k: int, n: int) -> None:
    """Q2: the full inference recipe — dynamic per-row activation quant,
    static per-column weight scales, int32 accumulate, f32 rescale + bias."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    bias = jnp.asarray(rng.randn(n).astype(np.float32))

    # static weight quant (would happen once at load time)
    w_scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    w8 = jnp.round(w / w_scale).astype(jnp.int8)
    wbf = w.astype(jnp.bfloat16)

    @jax.jit
    def dense_bf(x):
        return (jnp.dot(x, wbf, preferred_element_type=jnp.float32)
                + bias).astype(jnp.bfloat16)

    @jax.jit
    def dense_i8(x):
        x32 = x.astype(jnp.float32)
        x_scale = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0
        x_scale = jnp.maximum(x_scale, 1e-8)
        x8 = jnp.round(x32 / x_scale).astype(jnp.int8)
        acc = jax.lax.dot(x8, w8, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * x_scale * w_scale + bias).astype(jnp.bfloat16)

    flops = 2.0 * m * k * n
    t_bf = _time(dense_bf, x)
    t_i8 = _time(dense_i8, x)
    # numerics: relative error of the quantized dense
    err = float(jnp.linalg.norm((dense_i8(x) - dense_bf(x)).astype(jnp.float32))
                / jnp.linalg.norm(dense_bf(x).astype(jnp.float32)))
    log(f"[qdense {m}x{k}x{n}] bf16 {t_bf*1e3:7.3f}ms ({flops/t_bf/1e12:6.1f} TFLOP/s)  "
        f"int8+quant {t_i8*1e3:7.3f}ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
        f"speedup {t_bf/t_i8:.2f}x  rel_err {err:.4f}")


def bench_conv_int8(b: int, hw: int, cin: int, cout: int, ksize: int,
                    stride: int = 1) -> None:
    """Q3: int8 convolution support + speed at an RN50-like stage shape."""
    rng = np.random.RandomState(2)
    xbf = jnp.asarray(rng.randn(b, hw, hw, cin), jnp.bfloat16)
    kbf = jnp.asarray(rng.randn(ksize, ksize, cin, cout), jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 128, (b, hw, hw, cin)), jnp.int8)
    k8 = jnp.asarray(rng.randint(-127, 128, (ksize, ksize, cin, cout)), jnp.int8)
    pad = ksize // 2

    def conv(x, k, ptype):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(stride, stride), padding=[(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    conv_bf = jax.jit(lambda x, k: conv(x, k, jnp.float32))
    conv_i8 = jax.jit(lambda x, k: conv(x, k, jnp.int32))

    out_hw = hw // stride
    flops = 2.0 * b * out_hw * out_hw * ksize * ksize * cin * cout
    t_bf = _time(conv_bf, xbf, kbf, iters=10)
    tag = f"[conv {b}x{hw}x{hw}x{cin}->{cout} k{ksize}s{stride}]"
    try:
        t_i8 = _time(conv_i8, x8, k8, iters=10)
        log(f"{tag} bf16 {t_bf*1e3:7.3f}ms ({flops/t_bf/1e12:6.1f} TFLOP/s)  "
            f"int8 {t_i8*1e3:7.3f}ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
            f"speedup {t_bf/t_i8:.2f}x")
    except Exception as e:
        log(f"{tag} bf16 {t_bf*1e3:7.3f}ms; int8 conv FAILED: {type(e).__name__}: "
            f"{str(e)[:200]}")


def bench_tower(name: str, batch: int, iters: int = 64) -> None:
    """Q4 (the decision number): full-tower throughput, bf16 vs quant='int8'
    (same random weights), plus normalized-feature drift between the two."""
    from summer_clip_tpu.models.clip import build_clip

    model, cfg = build_clip(name, dtype=jnp.bfloat16)
    qmodel, _ = build_clip(name, dtype=jnp.bfloat16, quant="int8")
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, cfg.image_resolution,
                                     cfg.image_resolution, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32))

    def encode(m):
        @jax.jit
        def fn(images):
            f = m.apply(variables, images, method=m.encode_image).astype(jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        return fn

    f_bf, f_i8 = encode(model), encode(qmodel)
    try:
        cos = jnp.sum(f_bf(images) * f_i8(images), axis=-1)
        drift = f"cos_min {float(jnp.min(cos)):.4f} cos_mean {float(jnp.mean(cos)):.4f}"
    except Exception as e:
        log(f"[tower {name}] int8 path FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t_bf = _time(f_bf, images, iters=iters, repeats=2)
    t_i8 = _time(f_i8, images, iters=iters, repeats=2)
    log(f"[tower {name} b={batch}] bf16 {batch/t_bf:8.0f} img/s  "
        f"int8 {batch/t_i8:8.0f} img/s  speedup {t_bf/t_i8:.2f}x  {drift}")


def bench_text_tower(name: str, rows: int = 1024, iters: int = 16) -> None:
    """Zero-shot classifier build throughput: encode_text over (rows, 77)
    token batches (the reference's per-class encode_text loop,
    eval_clip.py:21-28, batched here), bf16 vs int8."""
    from summer_clip_tpu.models.clip import build_clip

    model, cfg = build_clip(name, dtype=jnp.bfloat16)
    qmodel, _ = build_clip(name, dtype=jnp.bfloat16, quant="int8")
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(1, cfg.vocab_size, (rows, cfg.context_length)),
                         jnp.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32))

    def encode(m):
        @jax.jit
        def fn(tokens):
            t = m.apply(variables, tokens, method=m.encode_text).astype(jnp.float32)
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        return fn

    f_bf, f_i8 = encode(model), encode(qmodel)
    try:
        cos = jnp.sum(f_bf(tokens) * f_i8(tokens), axis=-1)
        drift = f"cos_min {float(jnp.min(cos)):.4f}"
    except Exception as e:
        log(f"[text {name}] int8 path FAILED: {type(e).__name__}: {str(e)[:160]}")
        return
    t_bf = _time(f_bf, tokens, iters=iters, repeats=2)
    t_i8 = _time(f_i8, tokens, iters=iters, repeats=2)
    log(f"[text {name} rows={rows}] bf16 {rows/t_bf:8.0f} texts/s  "
        f"int8 {rows/t_i8:8.0f} texts/s  speedup {t_bf/t_i8:.2f}x  {drift}")


def main() -> None:
    enable_persistent_cache()
    log(f"backend={jax.default_backend()}")

    # ViT-B/16 geometries: tokens = batch*197; d=768
    for m, k, n in [(64 * 197, 768, 3072),    # MLP c_fc at b=64
                    (64 * 197, 3072, 768),    # MLP c_proj
                    (64 * 197, 768, 768),     # projections
                    (8192, 1024, 4096),       # ViT-L-ish / generic big
                    (8192, 8192, 8192)]:      # peak probe
        bench_raw_gemm(m, k, n)
    for m, k, n in [(64 * 197, 768, 3072), (64 * 197, 3072, 768),
                    (64 * 197, 768, 768)]:
        bench_quantized_dense(m, k, n)
    # RN50 geometries (batch 128): layer1 3x3 (56^2, 64), layer2 3x3
    # (28^2, 128), layer3 (14^2, 256), stem (112^2, 32->32)
    bench_conv_int8(128, 56, 64, 64, 3)
    bench_conv_int8(128, 28, 128, 128, 3)
    bench_conv_int8(128, 14, 256, 256, 3)
    bench_conv_int8(128, 56, 256, 64, 1)
    # the decision numbers: full towers at their production batch sizes
    bench_tower("ViT-B/16", batch=64)
    bench_tower("RN50", batch=128, iters=32)
    bench_text_tower("ViT-B/16")
    log("done")


if __name__ == "__main__":
    main()
