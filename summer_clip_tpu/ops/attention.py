"""Attention ops: XLA reference implementation + Pallas fused kernel for TPU.

The CLIP towers (reference dependency: openai/CLIP's PyTorch
``ResidualAttentionBlock``) run their FLOPs through multi-head attention.
On TPU we provide:

- ``mha_reference``: pure-jnp scaled dot-product attention. XLA already fuses
  the softmax chain well; this is the correctness oracle and the CPU path.
- ``flash_attention``: a Pallas kernel with online softmax, blocked over the
  key/value sequence so the (T, T) score matrix never hits HBM. Used for the
  image towers where T = 197 (ViT-B/16) .. 577 (ViT-L/14@336) and the text
  tower (T = 77).

Sequence lengths in this workload are small (<= 1024), so the kernel's main
win is fusing QK^T -> softmax -> PV into one VMEM-resident pass per block.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["mha_reference", "flash_attention", "flash_attention_ad",
           "short_attention", "short_attention_ad",
           "short_attention_packed", "short_attention_packed_ad",
           "multi_head_attention"]

# Auto-selection policy for the fused kernel. MEASURED on v5e (round 2,
# tools/bench_flash_gpt.py, steady-state): at every shape this workload
# reaches — 77-577 tower tokens AND the one previously-gated shape,
# gpt2-large at ctx 1024 (20 heads x 64, batch 8) — XLA's fused attention
# wins (3.64ms vs 6.09ms fwd; fwd+bwd identical since the backward is the
# XLA recompute VJP either way). The 64-wide heads pad to 128 lanes in the
# Pallas kernel; there is no production shape where it pays off, so
# auto-selection is OFF by default. The kernel stays available
# (`use_flash=True`, or flip FLASH_ENABLED) for genuinely long contexts,
# and remains oracle-tested.
FLASH_ENABLED = False
FLASH_MIN_KV = 1024

# Short-sequence fused kernel (``short_attention``): ON by default for the
# tower shapes. MEASURED motivation (round 3, tools/profile_vit_attn.py,
# v5e, ViT-B/16 geometry b=128/T=197/H=12): the XLA reference materializes
# the (B*H, T, T) score matrix in HBM and runs the softmax chain over it —
# 1.21 ms/layer against a 0.08 ms FLOP ideal, i.e. HBM-bandwidth-bound at
# ~96% of roofline. Keeping the whole (padded) sequence in VMEM removes
# that traffic entirely. Auto-selected for tq == tk <= SHORT_MAX_T.
SHORT_FUSED_ENABLED = True
SHORT_MAX_T = 640  # covers ViT-L/14@336 (T=577); GPT ctx-1024 stays on XLA


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: tp.Optional[jax.Array] = None,
                  scale: tp.Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention.

    q, k, v: (..., T, head_dim) with identical leading dims (batch, heads).
    mask: optional additive mask broadcastable to (..., Tq, Tk)
          (use -inf/-1e9 for disallowed positions).
    """
    head_dim = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (head_dim ** 0.5)
    scores = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = scores + mask
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", weights, v)


def _pad_to(x: jax.Array, axis: int, multiple: int, value: float = 0.0) -> tp.Tuple[jax.Array, int]:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value), size


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                              "interpret", "q_offset"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, block_q: int = 128, block_k: int = 128,
                    interpret: bool = False, q_offset: int = 0) -> jax.Array:
    """Fused attention, q/k/v: (BH, T, head_dim) -> (BH, Tq, head_dim).

    ``q_offset`` places the query block at absolute position ``q_offset``
    within the key sequence for causal masking — the chunked-prefill shape
    (q = a late chunk, k/v = the whole KV history), where row i may attend
    keys <= q_offset + i. ``q_offset=0`` is ordinary training attention.

    Pads T and head_dim up to lane multiples; padded key positions are
    masked out by padding k with a large negative offset trick — instead we
    mask via the causal/validity logic: padded keys get score -1e30 through
    zero-padded k only when q.k == 0 isn't safe, so we pad scores by tracking
    kv_len in-kernel. For simplicity and exactness, padded kv rows are
    handled by padding v with zeros and k with zeros, then masking padded
    columns inside the kernel via kv position >= true length.
    """
    bh, tq, d0 = q.shape
    _, tk, _ = k.shape
    scale = 1.0 / (d0 ** 0.5)

    # pad head_dim to the 128-lane width; zero-padded features add 0 to the
    # dot products, so scores and outputs are exact after slicing back
    q, _ = _pad_to(q, 2, 128)
    k, _ = _pad_to(k, 2, 128)
    v, _ = _pad_to(v, 2, 128)
    d = q.shape[2]

    q_p, tq0 = _pad_to(q, 1, block_q)
    k_p, tk0 = _pad_to(k, 1, block_k)
    v_p, _ = _pad_to(v, 1, block_k)
    # mask padded keys: fold validity into the causal-style mask by giving
    # padded keys an effectively -inf score via an additive bias row
    kv_len = k_p.shape[1]

    def kernel(q_ref, k_ref, v_ref, o_ref):
        # dots run in the OPERAND dtype with f32 MXU accumulation; the
        # round-2 form upcast q/k/v to f32 first, which quadruples MXU cost
        # on bf16 towers and was the main reason XLA won every shape
        q_blk = q_ref[0]
        bq, dd = q_blk.shape
        num_kb = kv_len // block_k
        m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, dd), jnp.float32)
        q_idx = pl.program_id(1)

        def body(kb, carry):
            m, l, acc = carry
            k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
            v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
            s = jnp.dot(q_blk, k_blk.T,
                        preferred_element_type=jnp.float32) * scale
            k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = k_pos < tk0
            if causal:
                q_pos = (q_offset + q_idx * block_q
                         + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
                valid = jnp.logical_and(valid, q_pos >= k_pos)
            s = jnp.where(valid, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jnp.dot(
                p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    tq_pad = q_p.shape[1]
    grid = (bh, tq_pad // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        # non-TPU backends run the kernel in interpret mode (tests, CPU smoke)
        interpret=interpret or jax.default_backend() != "tpu",
    )(q_p, k_p, v_p)
    return out[:, :tq0, :d0]


def _short_group(bh: int, t: int, d: int) -> int:
    """Heads per grid cell: the largest power of two <= 8 that divides the
    head-batch AND keeps the live block set (q/k/v/o blocks double-buffered
    + one (T, T) f32 score tile) around ~6MB, so grid-step overhead is
    amortized without spilling VMEM (~16MB/core). VMEM tiles pad T and d up
    to (8, 128) internally — budget against the padded sizes."""
    tp_pad = -(-t // 8) * 8
    d_pad = -(-d // 128) * 128
    per_head = 4 * tp_pad * d_pad * 2      # q/k/v/o bf16 blocks
    budget = 6 * 1024 * 1024 - 4 * tp_pad * (-(-t // 128) * 128)
    g = int(min(8, max(1, budget // max(per_head, 1))))
    g = 1 << (g.bit_length() - 1)  # floor to a power of two FIRST: halving
    while bh % g:                  # a non-pow2 g (3,5,6,7) skips valid sizes
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def short_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, interpret: bool = False) -> jax.Array:
    """Fused attention for SHORT sequences: q/k/v (BH, T, hd) -> (BH, T, hd).

    Unlike ``flash_attention`` (online softmax, blocked over keys), this
    keeps the entire sequence of G heads resident in VMEM per grid cell and
    does one exact single-pass softmax per head: the (T, T) score matrix
    never touches HBM, the QK^T/PV dots run in the operand dtype (bf16 on
    the towers) on the MXU with f32 accumulation, and grid overhead is
    amortized over G heads. No explicit HBM padding: logical shapes pass
    straight through and Mosaic tile-pads in VMEM (measured: explicit
    jnp.pad copies of q/k/v cost more HBM traffic than the fusion saves).
    Exact per-head math matches ``mha_reference`` (same f32 softmax, same
    operand-dtype PV dot).

    Tower shapes (reference hot loops: ViT T=197..577, text T=77 —
    clip_adapter/save_features.py:31-35, clip_model/eval_clip.py) are all
    HBM-bound on the materialized score matrix in the XLA form; this kernel
    removes that traffic.
    """
    bh, t, d0 = q.shape
    scale = 1.0 / (d0 ** 0.5)
    g = _short_group(bh, t, d0)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        bias = None
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            bias = jnp.where(row >= col, 0.0, -1e30).astype(jnp.float32)
        for i in range(g):  # static unroll over the head group
            s = jnp.dot(q_ref[i], k_ref[i].T,
                        preferred_element_type=jnp.float32) * scale
            if bias is not None:
                s = s + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot((p / l).astype(v_ref.dtype), v_ref[i],
                        preferred_element_type=jnp.float32)
            o_ref[i] = o.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[pl.BlockSpec((g, t, d0), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((g, t, d0), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d0), q.dtype),
        interpret=interpret or jax.default_backend() != "tpu",
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("num_heads", "causal", "interpret"))
def short_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array, *,
                           num_heads: int, causal: bool = False,
                           interpret: bool = False) -> jax.Array:
    """Fused short-sequence attention on the PACKED layout: q/k/v (B, T, D)
    with D = num_heads * head_dim, heads contiguous along lanes — the
    natural output of the qkv projections.

    The (BH, T, hd) form of ``short_attention`` needs a physical
    (B,T,H,hd)->(B,H,T,hd) transpose on each side of the kernel; XLA's
    reference path gets those transposes for free by folding them into the
    batched dot_general's dimension numbers, which cancels the fusion win
    (measured round 3: tower A/B was a wash). Here the head split happens
    INSIDE the kernel as static lane slices of the VMEM-resident (T, D)
    tile, so the HBM layout is untouched end to end and the only traffic is
    q/k/v in, o out.
    """
    b, t, dm = q.shape
    hd = dm // num_heads
    scale = 1.0 / (hd ** 0.5)
    g = _short_group(b * num_heads, t, hd)
    gb = max(1, g // num_heads) if g >= num_heads else 1
    while b % gb:
        gb //= 2

    def kernel(q_ref, k_ref, v_ref, o_ref):
        bias = None
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            bias = jnp.where(row >= col, 0.0, -1e30).astype(jnp.float32)
        for i in range(gb):  # static unroll: images x heads in this cell
            for h in range(num_heads):
                sl = slice(h * hd, (h + 1) * hd)
                s = jnp.dot(q_ref[i, :, sl], k_ref[i, :, sl].T,
                            preferred_element_type=jnp.float32) * scale
                if bias is not None:
                    s = s + bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                o = jnp.dot((p / l).astype(v_ref.dtype), v_ref[i, :, sl],
                            preferred_element_type=jnp.float32)
                o_ref[i, :, sl] = o.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[pl.BlockSpec((gb, t, dm), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((gb, t, dm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, dm), q.dtype),
        interpret=interpret or jax.default_backend() != "tpu",
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def short_attention_ad(q: jax.Array, k: jax.Array, v: jax.Array,
                       causal: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas fused forward, XLA recompute backward
    (same pattern as ``flash_attention_ad`` — prompt learning backprops
    through the frozen towers, and T <= 640 keeps the rematerialized scores
    cheap)."""
    return short_attention(q, k, v, causal=causal)


def _short_ad_fwd(q, k, v, causal):
    return short_attention(q, k, v, causal=causal), (q, k, v)


def _short_ad_bwd(causal, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        mask = _causal_bias(q.shape[-2], k.shape[-2]) if causal else None
        return mha_reference(q, k, v, mask=mask)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


short_attention_ad.defvjp(_short_ad_fwd, _short_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def short_attention_packed_ad(q: jax.Array, k: jax.Array, v: jax.Array,
                              num_heads: int, causal: bool = False) -> jax.Array:
    """Differentiable packed-layout wrapper: Pallas fused forward, XLA
    recompute backward (head split folded into the dot_generals)."""
    return short_attention_packed(q, k, v, num_heads=num_heads, causal=causal)


def _short_packed_fwd(q, k, v, num_heads, causal):
    out = short_attention_packed(q, k, v, num_heads=num_heads, causal=causal)
    return out, (q, k, v)


def _short_packed_bwd(num_heads, causal, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        b, t, dm = q.shape
        hd = dm // num_heads

        def split(x):
            return x.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

        mask = _causal_bias(t, t) if causal else None
        o = mha_reference(split(q), split(k), split(v), mask=mask)
        return o.transpose(0, 2, 1, 3).reshape(b, t, dm)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


short_attention_packed_ad.defvjp(_short_packed_fwd, _short_packed_bwd)


def _causal_bias(tq: int, tk: int, q_offset: int = 0) -> jax.Array:
    """Additive (tq, tk) causal mask with the query block at ``q_offset``."""
    q_pos = q_offset + jnp.arange(tq)[:, None]
    return jnp.where(q_pos >= jnp.arange(tk)[None, :], 0.0, -1e30
                     ).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_ad(q: jax.Array, k: jax.Array, v: jax.Array,
                       causal: bool = False, q_offset: int = 0) -> jax.Array:
    """Differentiable wrapper: Pallas fused forward, XLA recompute backward.

    Pallas kernels define no autodiff rule; prompt learning backprops
    through the frozen towers, so the fused forward pairs with an exact
    standard-attention backward (scores rematerialized in f32 — fine at
    this workload's sequence lengths, <= 577).
    """
    return flash_attention(q, k, v, causal=causal, q_offset=q_offset)


def _flash_ad_fwd(q, k, v, causal, q_offset):
    return flash_attention(q, k, v, causal=causal, q_offset=q_offset), (q, k, v)


def _flash_ad_bwd(causal, q_offset, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        mask = None
        if causal:
            mask = _causal_bias(q.shape[-2], k.shape[-2], q_offset)
        return mha_reference(q, k, v, mask=mask)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         num_heads: int, mask: tp.Optional[jax.Array] = None,
                         causal: bool = False, use_flash: tp.Optional[bool] = None,
                         q_offset: int = 0) -> jax.Array:
    """Split heads, attend, merge. q/k/v: (B, T, D) with D = H * head_dim.

    ``use_flash=None`` auto-selects: Pallas kernel on TPU backends, jnp
    reference elsewhere. An explicit additive ``mask`` forces the reference
    path (the fused kernel supports only causal/validity masking).
    ``q_offset`` shifts causal masking for chunked-prefill queries (row i
    attends keys <= q_offset + i) on both the fused and reference paths.
    """
    b, tq, dm = q.shape
    tk = k.shape[1]
    hd = dm // num_heads

    if (use_flash is None and SHORT_FUSED_ENABLED and mask is None
            and q_offset == 0 and tq == tk and tk <= SHORT_MAX_T
            and dm == num_heads * hd
            and jax.default_backend() == "tpu"):
        # packed layout: heads are split INSIDE the kernel (lane slices), so
        # no physical (B,T,H,hd)->(B,H,T,hd) transposes bracket the call
        return short_attention_packed_ad(q, k, v, num_heads, causal)

    def split(x, t):
        return x.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, tq), split(k, tk), split(v, tk)

    if use_flash is None:
        use_flash = (FLASH_ENABLED and mask is None
                     and jax.default_backend() == "tpu"
                     and tk >= FLASH_MIN_KV)

    if use_flash and mask is None:
        o = flash_attention_ad(
            qh.reshape(b * num_heads, tq, hd),
            kh.reshape(b * num_heads, tk, hd),
            vh.reshape(b * num_heads, tk, hd),
            causal, q_offset,
        ).reshape(b, num_heads, tq, hd)
    else:
        attn_mask = mask
        if causal:
            cmask = _causal_bias(tq, tk, q_offset)
            attn_mask = cmask if attn_mask is None else attn_mask + cmask
        o = mha_reference(qh, kh, vh, mask=attn_mask)

    return o.transpose(0, 2, 1, 3).reshape(b, tq, dm)
