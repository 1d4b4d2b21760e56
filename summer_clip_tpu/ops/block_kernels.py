"""Fused transformer-block halves for the CLIP towers (Pallas, TPU).

Motivation (measured round 3, tools/profile_vit_attn.py, v5e, ViT-B/16
b=128): the XLA ln+MLP half runs 1.67 ms/layer against a 1.21 ms GEMM FLOP
ideal — the gap is exactly the HBM round-trip of the (T, 4D) hidden
activation between the two GEMMs plus the LayerNorm passes. XLA cannot fuse
across two matmuls; a kernel that keeps both MLP weight matrices VMEM-
resident (constant block index -> fetched once, not per grid step) and the
hidden activation in VMEM removes that traffic entirely.

Numerics match the Flax modules (``models/clip/modeling.py``): LayerNorm in
f32 with f32 scale/bias, GEMMs in the operand dtype (bf16 on TPU) with f32
MXU accumulation, QuickGELU in the compute dtype, residual add in the
input dtype. Reference oracle: ``ln_mlp_reference``.

Reference hot loops these serve: every CLIP tower forward
(clip_adapter/save_features.py:31-35, clip_model/eval_clip.py:22,
clip_prompt text encodes).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_mlp_reference", "fused_ln_mlp", "fused_ln_mlp_chunked",
           "fused_ln_mlp_ad", "ln_attn_reference", "fused_ln_attn",
           "fused_ln_attn_ad", "FUSED_MLP_MAX_WEIGHT_BYTES"]

# Weights must stay VMEM-resident beside the activation blocks; ViT-B/text
# widths (D <= 768: 9.4MB) fit, ViT-L (D=1024: 16.8MB) does not.
FUSED_MLP_MAX_WEIGHT_BYTES = 12 * 1024 * 1024


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _seq_group(b: int, t: int, d: int, weight_bytes: int,
               act_mult: int) -> int:
    """Sequences per grid cell: largest power of two <= 8 dividing the batch
    whose activation block set (x/o double-buffered + intermediates,
    ~act_mult * t * d bf16 each) fits beside the resident weights in a
    ~13MB VMEM budget. Small-T towers (text, 77 tokens) need gb > 1 to
    amortize grid-step overhead over enough MXU work."""
    per_seq = act_mult * t * d * 2
    budget = 12 * 1024 * 1024 - weight_bytes
    g = int(min(8, max(1, budget // max(per_seq, 1))))
    g = 1 << (g.bit_length() - 1)  # floor to a power of two FIRST: halving
    while b % g:                   # a non-pow2 g (3,5,6,7) skips valid sizes
        g //= 2
    return g


def ln_mlp_reference(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                     w1: jax.Array, b1: jax.Array, w2: jax.Array,
                     b2: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x + c_proj(quick_gelu(c_fc(LN_f32(x)))) — the exact module math."""
    dtype = x.dtype
    y = _ln_f32(x, ln_scale, ln_bias, eps)
    h = quick_gelu(jnp.dot(y, w1.astype(dtype),
                           preferred_element_type=jnp.float32
                           ).astype(dtype) + b1.astype(dtype))
    out = (jnp.dot(h, w2.astype(dtype), preferred_element_type=jnp.float32
                   ).astype(dtype) + b2.astype(dtype))
    return x + out


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 *, eps: float = 1e-5, interpret: bool = False) -> jax.Array:
    """Fused LN -> c_fc -> QuickGELU -> c_proj -> +residual.

    x: (B, T, D); w1: (D, H); w2: (H, D). One grid cell = one sequence; the
    weight blocks use a constant index map so Mosaic keeps them resident
    across the whole sweep. The (T, H) hidden never leaves VMEM.
    """
    b, t, d = x.shape
    h_dim = w1.shape[1]
    dtype = x.dtype
    # x/o double-buffered + the (t, h_dim) hidden ~= (4 + h_dim/d) * t * d
    gb = _seq_group(b, t, d, 2 * d * h_dim * 2, 4 + h_dim // d)

    def kernel(x_ref, s_ref, bia_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        for i in range(gb):  # static unroll over the sequence group
            xb = x_ref[i]
            x32 = xb.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            y = ((x32 - mean) * jax.lax.rsqrt(var + eps) * s_ref[:] + bia_ref[:]
                 ).astype(dtype)
            h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32
                        ).astype(dtype) + b1_ref[:]
            # QuickGELU, Mosaic-safe: bf16 `logistic` lowers to an f32->bf16
            # vector.broadcast that fails MLIR verification on real TPUs
            # (interpret mode can't see it), so run the sigmoid in f32 and
            # round back — exactly XLA's bf16 transcendental semantics
            # (upcast, compute, downcast), keeping the oracle bit-match.
            s_in = jnp.asarray(1.702, dtype) * h          # bf16 multiply, as the module
            sig = jax.nn.sigmoid(s_in.astype(jnp.float32)).astype(dtype)
            h = h * sig
            out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32
                          ).astype(dtype) + b2_ref[:]
            o_ref[i] = xb + out

    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, h_dim), lambda i: (0, 0)),
            pl.BlockSpec((h_dim,), lambda i: (0,)),
            pl.BlockSpec((h_dim, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((gb, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        interpret=interpret or jax.default_backend() != "tpu",
    )(x, ln_scale, ln_bias, w1.astype(dtype), b1.astype(dtype),
      w2.astype(dtype), b2.astype(dtype))


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "hidden_chunk"))
def fused_ln_mlp_chunked(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                         w1: jax.Array, b1: jax.Array, w2: jax.Array,
                         b2: jax.Array, *, eps: float = 1e-5,
                         interpret: bool = False,
                         hidden_chunk: tp.Optional[int] = None) -> jax.Array:
    """``fused_ln_mlp`` for widths whose MLP weights exceed VMEM (ViT-L/14:
    D=1024, H=4096 -> 16.8MB bf16).

    The hidden dimension is chunked: grid = (batch groups, hidden chunks),
    hidden-chunk fastest, so for a fixed sequence the (D, hc)/(hc, D) weight
    chunks stream through VMEM while the partial ``gelu(y@w1[:,c]) @ w2[c,:]``
    products accumulate in an f32 VMEM scratch. QuickGELU is elementwise on
    the hidden, so chunking is exact up to f32 summation order; the (T, H)
    hidden still never touches HBM. LN is recomputed per chunk (VPU noise
    next to the two GEMMs). Residual + output bias are applied on the last
    chunk, in the module's dtype semantics.
    """
    b, t, d = x.shape
    h_dim = w1.shape[1]
    dtype = x.dtype
    # largest power-of-two chunk whose double-buffered weight pair fits a
    # ~8MB slice of the budget: (d*hc + hc*d) * itemsize * 2 (pipeline) <= 8MB
    itemsize = jnp.dtype(dtype).itemsize
    hc = hidden_chunk or h_dim
    while hidden_chunk is None and hc > 128 and 4 * d * hc * itemsize > 8 * 1024 * 1024:
        hc //= 2
    while h_dim % hc:
        hc //= 2
    nj = h_dim // hc
    # activation side: x/o double-buffered + y + h-chunk + f32 scratch
    act_bytes = (4 * t * d + t * hc) * itemsize + t * d * 4
    gb = _seq_group(b, t, d, 4 * d * hc * itemsize,
                    max(act_bytes // (t * d * 2), 1))

    def kernel(x_ref, s_ref, bia_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               o_ref, acc_ref):
        j = pl.program_id(1)
        last = pl.num_programs(1) - 1
        for i in range(gb):  # static unroll over the sequence group
            xb = x_ref[i]
            y = _ln_f32(xb, s_ref[:], bia_ref[:], eps)
            h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32
                        ).astype(dtype) + b1_ref[:]
            # f32 sigmoid for the Mosaic bf16-logistic bug (see fused_ln_mlp)
            s_in = jnp.asarray(1.702, dtype) * h
            sig = jax.nn.sigmoid(s_in.astype(jnp.float32)).astype(dtype)
            h = h * sig
            part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

            @pl.when(j == 0)
            def _():
                acc_ref[i] = part

            @pl.when(j > 0)
            def _():
                acc_ref[i] += part

            @pl.when(j == last)
            def _():
                o_ref[i] = xb + (acc_ref[i].astype(dtype) + b2_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(b // gb, nj),
        in_specs=[
            pl.BlockSpec((gb, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d,), lambda i, j: (0,)),
            pl.BlockSpec((d,), lambda i, j: (0,)),
            pl.BlockSpec((d, hc), lambda i, j: (0, j)),
            pl.BlockSpec((hc,), lambda i, j: (j,)),
            pl.BlockSpec((hc, d), lambda i, j: (j, 0)),
            pl.BlockSpec((d,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((gb, t, d), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        scratch_shapes=[pltpu.VMEM((gb, t, d), jnp.float32)],
        interpret=interpret or jax.default_backend() != "tpu",
    )(x, ln_scale, ln_bias, w1.astype(dtype), b1.astype(dtype),
      w2.astype(dtype), b2.astype(dtype))


def _ln_f32(x: jax.Array, scale: jax.Array, bias: jax.Array,
            eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
            ).astype(x.dtype)


def ln_attn_reference(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                      wq, bq, wk, bk, wv, bv, wo, bo, *, num_heads: int,
                      causal: bool = False, eps: float = 1e-5) -> jax.Array:
    """x + out_proj(MHA(q,k,v of LN_f32(x))) — the exact module math
    (modeling.ResidualAttentionBlock attention half)."""
    dtype = x.dtype
    b, t, d = x.shape
    hd = d // num_heads
    y = _ln_f32(x, ln_scale, ln_bias, eps)

    def dense(z, w, bb):
        return (jnp.dot(z, w.astype(dtype), preferred_element_type=jnp.float32
                        ).astype(dtype) + bb.astype(dtype))

    q, k, v = dense(y, wq, bq), dense(y, wk, bk), dense(y, wv, bv)

    def split(z):
        return z.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    scale = 1.0 / (hd ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                   preferred_element_type=jnp.float32) * scale
    if causal:
        row = jnp.arange(t)[:, None]
        s = jnp.where(row >= jnp.arange(t)[None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v))
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return x + dense(o, wo, bo)


@functools.partial(jax.jit, static_argnames=("num_heads", "causal", "eps",
                                              "interpret"))
def fused_ln_attn(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                  wq, bq, wk, bk, wv, bv, wo, bo, *, num_heads: int,
                  causal: bool = False, eps: float = 1e-5,
                  interpret: bool = False) -> jax.Array:
    """Fused LN -> q/k/v proj -> per-head attention -> out proj -> +residual.

    One grid cell = one sequence; the four projection matrices ride constant
    block indices (VMEM-resident across the sweep), heads are static lane
    slices (same trick as ``short_attention_packed``), and q/k/v/scores/o
    never touch HBM — per layer the only HBM traffic is x in, x+attn out.
    """
    b, t, d = x.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    dtype = x.dtype
    # x/o double-buffered + y/q/k/v/attn-out live intermediates
    gb = _seq_group(b, t, d, 4 * d * d * 2, 9)

    def kernel(x_ref, s_ref, bia_ref, wq_ref, bq_ref, wk_ref, bk_ref,
               wv_ref, bv_ref, wo_ref, bo_ref, o_ref):
        bias = None
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            bias = jnp.where(row >= col, 0.0, -1e30).astype(jnp.float32)
        for i in range(gb):  # static unroll over the sequence group
            xb = x_ref[i]
            y = _ln_f32(xb, s_ref[:], bia_ref[:], eps)
            q = jnp.dot(y, wq_ref[:], preferred_element_type=jnp.float32
                        ).astype(dtype) + bq_ref[:]
            k = jnp.dot(y, wk_ref[:], preferred_element_type=jnp.float32
                        ).astype(dtype) + bk_ref[:]
            v = jnp.dot(y, wv_ref[:], preferred_element_type=jnp.float32
                        ).astype(dtype) + bv_ref[:]
            outs = []
            for h in range(num_heads):
                sl = slice(h * hd, (h + 1) * hd)
                s = jnp.dot(q[:, sl], k[:, sl].T,
                            preferred_element_type=jnp.float32) * scale
                if bias is not None:
                    s = s + bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                outs.append(jnp.dot((p / l).astype(dtype), v[:, sl],
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype))
            o = jnp.concatenate(outs, axis=-1)
            proj = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32
                           ).astype(dtype) + bo_ref[:]
            o_ref[i] = xb + proj

    mat = pl.BlockSpec((d, d), lambda i: (0, 0))
    vec = pl.BlockSpec((d,), lambda i: (0,))
    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[pl.BlockSpec((gb, t, d), lambda i: (i, 0, 0)),
                  vec, vec, mat, vec, mat, vec, mat, vec, mat, vec],
        out_specs=pl.BlockSpec((gb, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        interpret=interpret or jax.default_backend() != "tpu",
    )(x, ln_scale, ln_bias, wq.astype(dtype), bq.astype(dtype),
      wk.astype(dtype), bk.astype(dtype), wv.astype(dtype), bv.astype(dtype),
      wo.astype(dtype), bo.astype(dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_ln_attn_ad(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                     num_heads: int, causal: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas fused forward, XLA recompute backward."""
    return fused_ln_attn(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                         num_heads=num_heads, causal=causal)


def _fused_attn_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                    num_heads, causal):
    out = fused_ln_attn(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                        num_heads=num_heads, causal=causal)
    return out, (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)


def _fused_attn_bwd(num_heads, causal, residuals, g):
    def ref(*args):
        return ln_attn_reference(*args, num_heads=num_heads, causal=causal)

    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


fused_ln_attn_ad.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def _mlp_dispatch(x, ln_scale, ln_bias, w1, b1, w2, b2):
    # route oversized-weight widths (ViT-L: 16.8MB bf16) to the
    # hidden-chunked kernel; everything else keeps the resident-weight one
    weight_bytes = 2 * w1.shape[0] * w1.shape[1] * jnp.dtype(x.dtype).itemsize
    kern = (fused_ln_mlp_chunked if weight_bytes > FUSED_MLP_MAX_WEIGHT_BYTES
            else fused_ln_mlp)
    return kern(x, ln_scale, ln_bias, w1, b1, w2, b2)


@jax.custom_vjp
def fused_ln_mlp_ad(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                    w1: jax.Array, b1: jax.Array, w2: jax.Array,
                    b2: jax.Array) -> jax.Array:
    """Differentiable wrapper: Pallas fused forward, XLA recompute backward
    (prompt/CoOp training backprops through the frozen towers)."""
    return _mlp_dispatch(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    out = _mlp_dispatch(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_mlp_bwd(residuals, g):
    _, vjp = jax.vjp(ln_mlp_reference, *residuals)
    return vjp(g)


fused_ln_mlp_ad.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
