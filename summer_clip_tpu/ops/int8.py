"""Int8 MXU inference layers for the frozen CLIP towers (opt-in).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 FLOP rate, and both
towers are MXU-bound (docs/KERNELS.md: RN50 61%, ViT-B/16 57% of bf16
peak), so int8 arithmetic is the one untried lever past the bf16 walls.
The reference has no analog (it runs fp16 CUDA via openai/CLIP); this is a
TPU-native fast path for the feature-extraction pipeline
(``summer_clip/clip_adapter/save_features.py:31-35`` hot loop).

Recipe (standard dynamic activation quantization):
- weights: symmetric per-output-channel int8, scales from the f32 params at
  call time (cheap O(k*n) VPU work vs the O(m*k*n) matmul; keeps the param
  tree byte-identical to the bf16 path so checkpoints/convert are shared),
- activations: symmetric per-row (per-token) int8 with a dynamic max-abs
  scale,
- accumulate int32 on the MXU, rescale to f32, add bias, cast to the
  module compute dtype.

Numerics are NOT bit-parity with bf16 — this is an opt-in speed/accuracy
trade (``build_clip(name, quant="int8")``); measured feature drift and the
tower A/B live in tools/bench_int8_mxu.py + docs/KERNELS.md.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = tp.Any

__all__ = ["quantize_rows", "quantize_cols", "int8_dense", "QuantDense",
           "QuantConv"]


def quantize_rows(x: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: (m, k) f32 -> ((m, k) int8, (m, 1) f32 scale)."""
    x = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_cols(w: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """Symmetric per-column int8: (k, n) f32 -> ((k, n) int8, (n,) f32 scale)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense(x: jax.Array, kernel: jax.Array,
               bias: tp.Optional[jax.Array] = None,
               out_dtype: Dtype = jnp.bfloat16) -> jax.Array:
    """Quantized ``x @ kernel + bias`` over the trailing dim of ``x``.

    ``x``: (..., k) any float dtype; ``kernel``: (k, n) f32 params.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    x8, x_scale = quantize_rows(x2)
    w8, w_scale = quantize_cols(kernel)
    acc = jax.lax.dot(x8, w8, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*shape[:-1], kernel.shape[-1])


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense``: identical param tree (f32 ``kernel`` (din,
    dout) + ``bias``), identical math when ``quant is None``; int8 MXU path
    when ``quant == 'int8'``."""

    features: int
    quant: tp.Optional[str] = None
    dtype: Dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if self.quant == "int8":
            return int8_dense(x, kernel, bias, out_dtype=self.dtype)
        if self.quant is not None:
            raise ValueError(f"unknown quant mode: {self.quant!r}")
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class QuantConv(nn.Module):
    """Drop-in for bias-free ``nn.Conv`` (NHWC/HWIO): identical param tree
    (f32 ``kernel``), int8 conv with per-output-channel weight scales and a
    dynamic per-tensor activation scale when ``quant == 'int8'``."""

    features: int
    kernel_size: tp.Tuple[int, int]
    strides: tp.Tuple[int, int] = (1, 1)
    padding: tp.Any = 0
    quant: tp.Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, str):
            pass
        else:
            pad = list(pad)
        if self.quant == "int8":
            x32 = x.astype(jnp.float32)
            x_scale = jnp.maximum(jnp.max(jnp.abs(x32)) / 127.0, 1e-12)
            x8 = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
            w = kernel
            w_scale = jnp.maximum(
                jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
            w8 = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                x8, w8, window_strides=self.strides, padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * x_scale * w_scale).astype(self.dtype)
        if self.quant is not None:
            raise ValueError(f"unknown quant mode: {self.quant!r}")
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
