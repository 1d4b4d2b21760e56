"""Flax CLIP: ModifiedResNet + ViT image towers, text transformer, CLIP head.

TPU-native re-implementation of the frozen foundation models the reference
loads via ``clip.load()`` (SURVEY.md §2, L3 — openai/CLIP RN50 / ViT-B/16 /
ViT-L/14 towers used by ``summer_clip/clip_model/eval_clip.py`` and the
feature pipeline). Architecture follows the public OpenAI CLIP description;
all code is written fresh for JAX:

- NHWC conv layout (XLA TPU native), params fp32, compute dtype configurable
  (bfloat16 by default on TPU) with fp32 LayerNorm/softmax accumulation.
- Attention routed through :mod:`summer_clip_tpu.ops.attention`, which
  selects the Pallas flash kernel on TPU.
- The text tower accepts **either** token ids (EOT pooling at the per-row
  argmax id, i.e. the highest token id = <eot>) **or** pre-embedded inputs +
  lengths (pooling at ``len-1``) — the hook prompt learning differentiates
  through (reference ``summer_clip/clip_prompt/prompt_learner.py:20-37``).
- BatchNorm in the ResNet towers always runs with running statistics: CLIP
  towers are frozen in every workload of this framework.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from summer_clip_tpu.ops import block_kernels as bk
from summer_clip_tpu.ops.attention import SHORT_MAX_T, multi_head_attention
from summer_clip_tpu.ops.int8 import QuantConv, QuantDense

Dtype = tp.Any

# Tower-block fusion policy. "block": both halves of ResidualAttentionBlock
# run as single Pallas kernels (ops/block_kernels) with weights VMEM-resident
# — removes every intra-block HBM round-trip (q/k/v, scores, the (T, 4D) MLP
# hidden). "attn": only the attention core is fused (ops/attention packed
# kernel, via multi_head_attention auto-select). "xla": no Pallas.
# TPU-only either way; CPU always takes the plain module math.
# "mlp": only the MLP half is fused (hidden-chunked kernel) beside the
# packed attention core — an opt-in probe, measured slower than "attn" at
# every current geometry (see _fuse_mlp_ok).
# Default "block": measured on v5e (tools/profile_fused_block.py) ViT-B/16
# image b=128 xla 2872 / attn 3721 / block 4013 img/s; b=64 3053/3563/3757;
# text tower b=512 11839/17221/19906 rows/s. (The first on-chip run found a
# Mosaic bf16-logistic lowering bug in the MLP half — fixed in
# ops/block_kernels.py by running the sigmoid in f32.) Per-geometry gates
# below demote wide towers where the fused halves measured slower: ViT-L/14
# image runs packed attention + module MLP (855-873 img/s vs 733-770 fused,
# vs 607-682 xla) while its TEXT tower (d=768) keeps both fused halves
# (10.6k vs 7.3k rows/s).
FUSED_BLOCK_MODE = "block"
# test hook: exercise the fused path off-TPU (kernels run in interpret mode)
FUSED_BLOCK_FORCE = False


def _fuse_base_ok(d: int, t: int, num_heads: int,
                  modes: tp.Tuple[str, ...] = ("block",)) -> bool:
    # FORCE (the test hook) bypasses only the backend check so tests can
    # exercise the fused paths off-TPU (interpret mode); the mode policy
    # still applies (the default mode is "block")
    return (FUSED_BLOCK_MODE in modes
            and (jax.default_backend() == "tpu" or FUSED_BLOCK_FORCE)
            and d % num_heads == 0
            and t <= SHORT_MAX_T)


def _fuse_attn_ok(d: int, t: int, num_heads: int, itemsize: int) -> bool:
    # weights (4*d^2) + one sequence's activations (x/o double-buffered,
    # y/q/k/v, ~9 tiles) + the (t, t) f32 score tile must fit VMEM in the
    # COMPUTE dtype. bf16 ViT-B: 7.6MB ok. The threshold is 12MB by
    # measurement, not arithmetic: ViT-L@224's 13.4MB "fits" but loses on
    # the chip (A/B tools/profile_fused_block.py round 3: fused-attn modes
    # 735-770 img/s vs 855-873 for the packed-attention module path — the
    # marginal fit leaves no VMEM for pipelining), and ViT-L@336 (20MB)
    # cannot lower at all. Both take the module path.
    total = (4 * d * d + 9 * t * d) * itemsize + 4 * t * t
    return _fuse_base_ok(d, t, num_heads) and total <= 12 * 1024 * 1024


def _fuse_mlp_ok(d: int, t: int, num_heads: int, itemsize: int) -> bool:
    # resident-weight kernel when weights (2*d*4d) + one sequence's
    # activations incl. the (t, 4d) hidden fit; wider towers (ViT-L: 16.8MB
    # bf16 weights) route to the hidden-chunked kernel inside
    # fused_ln_mlp_ad, whose budget is the streamed weight-chunk pair
    # (~8MB) + x/o/y/acc activations (~4*t*d*itemsize + t*d*4)
    total = (8 * d * d + 8 * t * d) * itemsize
    if total <= 14 * 1024 * 1024:
        return _fuse_base_ok(d, t, num_heads)
    chunked = 8 * 1024 * 1024 + 5 * t * d * itemsize + 4 * t * d
    # The hidden-chunked kernel is a measured NEGATIVE at ViT-L/14 image
    # geometry (A/B round 3: packed-attn + chunked MLP 750-782 img/s vs
    # 838-873 for packed-attn + module MLP): with one sequence group per
    # grid step the full 16.8MB weight set re-streams per group, which
    # costs more HBM than the (T, 4D) hidden round-trip it saves. It stays
    # an explicit opt-in (FUSED_BLOCK_MODE = "mlp") as a tested probe for
    # future shapes/hardware, never a default route.
    return (_fuse_base_ok(d, t, num_heads, modes=("mlp",))
            and chunked <= 14 * 1024 * 1024)


class _DenseParams(nn.Module):
    """Parameter-holder with nn.Dense's exact tree (kernel/bias, f32) for
    blocks whose matmuls run inside a fused Pallas kernel instead of through
    the module's own ``__call__``. Keeps checkpoints/convert.py layouts
    identical between the fused and unfused paths."""

    din: int
    dout: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.din, self.dout))
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.dout,))


class _LNParams(nn.Module):
    """Parameter-holder matching LayerNormF32's tree (scale/bias, f32)."""

    d: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.d,),
                                jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.d,),
                               jnp.float32)


class _AttnParams(nn.Module):
    d: int

    def setup(self):
        self.q_proj = _DenseParams(self.d, self.d)
        self.k_proj = _DenseParams(self.d, self.d)
        self.v_proj = _DenseParams(self.d, self.d)
        self.out_proj = _DenseParams(self.d, self.d)


class _MLPParams(nn.Module):
    d: int
    ratio: int = 4

    def setup(self):
        self.c_fc = _DenseParams(self.d, self.d * self.ratio)
        self.c_proj = _DenseParams(self.d * self.ratio, self.d)


# OpenAI CLIP's activation — single definition lives beside the fused
# kernel that re-implements it in-kernel (ops/block_kernels.quick_gelu)
quick_gelu = bk.quick_gelu


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32 regardless of the module compute dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return (y * scale + bias).astype(dtype)


class Attention(nn.Module):
    """Multi-head self/cross attention with fused qkv projection."""

    num_heads: int
    dtype: Dtype = jnp.float32
    out_features: tp.Optional[int] = None
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, q_in: jax.Array, kv_in: tp.Optional[jax.Array] = None, *,
                 causal: bool = False, mask: tp.Optional[jax.Array] = None) -> jax.Array:
        kv_in = q_in if kv_in is None else kv_in
        d = q_in.shape[-1]
        dense = lambda feats, name: QuantDense(feats, quant=self.quant,
                                               dtype=self.dtype, name=name)
        q = dense(d, "q_proj")(q_in)
        k = dense(d, "k_proj")(kv_in)
        v = dense(d, "v_proj")(kv_in)
        o = multi_head_attention(q, k, v, num_heads=self.num_heads, causal=causal, mask=mask)
        return dense(self.out_features or d, "out_proj")(o)


class MLP(nn.Module):
    """Transformer MLP block: c_fc -> QuickGELU -> c_proj (4x width)."""

    dtype: Dtype = jnp.float32
    ratio: int = 4
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = QuantDense(d * self.ratio, quant=self.quant, dtype=self.dtype,
                       name="c_fc")(x)
        h = quick_gelu(h)
        return QuantDense(d, quant=self.quant, dtype=self.dtype, name="c_proj")(h)


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        d, t = x.shape[-1], x.shape[-2]
        itemsize = jnp.dtype(x.dtype).itemsize
        # whole-half Pallas kernels where the weights fit VMEM: q/k/v/scores
        # and the (T, 4D) MLP hidden never round-trip HBM. Same param tree
        # as the module path (holders), same math (oracle-tested). Each half
        # gates independently (ViT-L: fused attn, module MLP). The fused
        # halves are bf16 kernels — int8 quant takes the module path (whose
        # attention core still auto-selects the packed Pallas kernel).
        if self.quant is None and _fuse_attn_ok(d, t, self.num_heads, itemsize):
            ln1 = _LNParams(d, name="ln_1")
            attn = _AttnParams(d, name="attn")
            x = bk.fused_ln_attn_ad(
                x, ln1.scale, ln1.bias,
                attn.q_proj.kernel, attn.q_proj.bias,
                attn.k_proj.kernel, attn.k_proj.bias,
                attn.v_proj.kernel, attn.v_proj.bias,
                attn.out_proj.kernel, attn.out_proj.bias,
                self.num_heads, causal)
        else:
            x = x + Attention(self.num_heads, dtype=self.dtype, quant=self.quant,
                              name="attn")(
                LayerNormF32(name="ln_1")(x), causal=causal
            )
        if self.quant is None and _fuse_mlp_ok(d, t, self.num_heads, itemsize):
            ln2 = _LNParams(d, name="ln_2")
            mlp = _MLPParams(d, name="mlp")
            return bk.fused_ln_mlp_ad(
                x, ln2.scale, ln2.bias,
                mlp.c_fc.kernel, mlp.c_fc.bias,
                mlp.c_proj.kernel, mlp.c_proj.bias)
        x = x + MLP(dtype=self.dtype, quant=self.quant,
                    name="mlp")(LayerNormF32(name="ln_2")(x))
        return x


class Transformer(nn.Module):
    num_layers: int
    num_heads: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        block_cls = ResidualAttentionBlock
        if self.remat:
            # causal is a python bool steering trace-time control flow —
            # it must stay static under checkpointing (arg 0 is the module)
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=(2,))
        for i in range(self.num_layers):
            x = block_cls(self.num_heads, dtype=self.dtype, quant=self.quant,
                          name=f"resblocks_{i}")(x, causal)
        return x


# ---------------------------------------------------------------------------
# Vision: ViT
# ---------------------------------------------------------------------------

class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding, computed either as a strided conv
    (XLA's conv emitters) or as an explicit patch-extract + one big matmul
    (hits the MXU as a plain GEMM — the SURVEY §7 "conv-as-matmul"
    experiment for the ViT throughput wall; identical math and identical
    ``conv1/kernel`` variable layout either way, tested)."""

    width: int
    patch_size: int
    dtype: Dtype = jnp.float32
    mode: str = "conv"   # "conv" | "matmul"

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        p = self.patch_size
        b, h, w, c = images.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, c, self.width), jnp.float32)
        x = images.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if self.mode == "conv":
            out = jax.lax.conv_general_dilated(
                x, k, window_strides=(p, p), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out.reshape(b, (h // p) * (w // p), self.width)
        gh, gw = h // p, w // p
        # (B, gh, P, gw, P, C) -> (B, gh, gw, P, P, C): patch-major layout
        # whose trailing (P, P, C) flattening matches the HWIO kernel reshape
        patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, p * p * c)
        return jnp.dot(patches, k.reshape(p * p * c, self.width),
                       preferred_element_type=jnp.float32).astype(self.dtype)


class VisionTransformer(nn.Module):
    """CLIP ViT image tower. Input (B, H, W, 3) -> (B, output_dim)."""

    patch_size: int
    width: int
    num_layers: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    patch_embed: str = "conv"
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, images: jax.Array, apply_proj: bool = True) -> jax.Array:
        b, h, w, _ = images.shape
        grid = h // self.patch_size
        x = PatchEmbed(self.width, self.patch_size, dtype=self.dtype,
                       mode=self.patch_embed, name="conv1")(images)

        cls = self.param("class_embedding", nn.initializers.normal(self.width ** -0.5),
                         (self.width,), jnp.float32)
        x = jnp.concatenate([
            jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x
        ], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(self.width ** -0.5),
                         (grid * grid + 1, self.width), jnp.float32)
        x = x + pos.astype(self.dtype)

        x = LayerNormF32(name="ln_pre")(x)
        x = Transformer(self.num_layers, self.num_heads, dtype=self.dtype,
                        remat=self.remat, quant=self.quant, name="transformer")(x)
        x = LayerNormF32(name="ln_post")(x[:, 0])

        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim), jnp.float32)
        if not apply_proj:
            # pre-projection pooled features (width-dim): the substrate for
            # projection fine-tuning (ProLIP — methods/prolip.py). The proj
            # param is declared above either way so the variable tree is
            # identical across both call paths.
            return x
        return jnp.dot(x, proj.astype(self.dtype), preferred_element_type=jnp.float32).astype(self.dtype)


# ---------------------------------------------------------------------------
# Vision: ModifiedResNet
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """ResNet bottleneck with CLIP's anti-aliased downsampling.

    All stride-2 convolutions are replaced by stride-1 conv + 2x2 average
    pool ("blur pool" style), per the CLIP ModifiedResNet design.
    """

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.planes * self.expansion
        bn = lambda name: nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        conv = lambda ch, k, name, pad=0: QuantConv(
            ch, (k, k), padding=pad, quant=self.quant, dtype=self.dtype, name=name)
        identity = x

        y = conv(self.planes, 1, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.planes, 3, "conv2", pad=1)(y)
        y = nn.relu(bn("bn2")(y))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride, self.stride), strides=(self.stride, self.stride))
        y = conv(out_ch, 1, "conv3")(y)
        y = bn("bn3")(y)

        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = conv(out_ch, 1, "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)

        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    """Attention pooling head: mean token queries the feature map."""

    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        mean = jnp.mean(x, axis=1, keepdims=True)
        x = jnp.concatenate([mean, x], axis=1)  # (B, HW+1, C)
        pos = self.param("positional_embedding", nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c), jnp.float32)
        x = x + pos.astype(self.dtype)
        out = Attention(self.num_heads, dtype=self.dtype, out_features=self.output_dim,
                        quant=self.quant, name="attn")(x[:, :1], x)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP's ResNet: 3-conv stem, blur-pool bottlenecks, attention pool."""

    layers: tp.Sequence[int]
    width: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    quant: tp.Optional[str] = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        bn = lambda name: nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        conv = lambda ch, name, stride=1: QuantConv(
            ch, (3, 3), strides=(stride, stride), padding=1, quant=self.quant,
            dtype=self.dtype, name=name)
        x = images.astype(self.dtype)
        # stem
        x = conv(self.width // 2, "conv1", stride=2)(x)
        x = nn.relu(bn("bn1")(x))
        x = conv(self.width // 2, "conv2")(x)
        x = nn.relu(bn("bn2")(x))
        x = conv(self.width, "conv3")(x)
        x = nn.relu(bn("bn3")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        planes = [self.width, self.width * 2, self.width * 4, self.width * 8]
        strides = [1, 2, 2, 2]
        for stage, (n_blocks, p, s) in enumerate(zip(self.layers, planes, strides), start=1):
            for blk in range(n_blocks):
                x = Bottleneck(p, stride=s if blk == 0 else 1, dtype=self.dtype,
                               quant=self.quant, name=f"layer{stage}_{blk}")(x)

        return AttentionPool2d(self.num_heads, self.output_dim, dtype=self.dtype,
                               quant=self.quant, name="attnpool")(x)


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------

class TextTransformer(nn.Module):
    """CLIP text tower with dual entry: token ids or spliced embeddings.

    ``__call__(token_ids)`` pools at the argmax token id (the <eot> token has
    the largest id in CLIP's vocab). ``from_embeds(embeds, lens)`` pools at
    index ``lens - 1`` — the contract prompt learning needs
    (reference ``prompt_learner.py:28-37``).
    """

    vocab_size: int
    context_length: int
    width: int
    num_layers: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    quant: tp.Optional[str] = None

    def setup(self):
        self.token_embedding = nn.Embed(self.vocab_size, self.width,
                                        embedding_init=nn.initializers.normal(0.02),
                                        param_dtype=jnp.float32, name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32)
        self.transformer = Transformer(self.num_layers, self.num_heads,
                                       dtype=self.dtype, quant=self.quant,
                                       name="transformer")
        self.ln_final = LayerNormF32(name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim), jnp.float32)

    def embed(self, token_ids: jax.Array) -> jax.Array:
        return self.token_embedding(token_ids).astype(self.dtype)

    def _encode(self, x: jax.Array, eot_idx: jax.Array) -> jax.Array:
        t = x.shape[1]
        x = x + self.positional_embedding[:t].astype(self.dtype)
        x = self.transformer(x, causal=True)
        x = self.ln_final(x)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        return jnp.dot(pooled, self.text_projection.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)

    def __call__(self, token_ids: jax.Array) -> jax.Array:
        x = self.embed(token_ids)
        eot_idx = jnp.argmax(token_ids, axis=-1)
        return self._encode(x, eot_idx)

    def from_embeds(self, inputs_embeds: jax.Array, input_lens: jax.Array) -> jax.Array:
        return self._encode(inputs_embeds.astype(self.dtype), input_lens - 1)


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

class CLIP(nn.Module):
    """Joint image/text model with a learnable (frozen in practice) logit scale."""

    visual: nn.Module
    text: TextTransformer

    def setup(self):
        import numpy as np
        self.logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.asarray(np.log(1.0 / 0.07), jnp.float32), ())

    def encode_image(self, images: jax.Array) -> jax.Array:
        return self.visual(images)

    def encode_image_preproj(self, images: jax.Array) -> jax.Array:
        """Pooled features BEFORE the final vision projection (ViT only) —
        the trainable substrate of ProLIP projection fine-tuning."""
        if not isinstance(self.visual, VisionTransformer):
            raise TypeError("pre-projection features are defined for ViT "
                            "towers (the ResNet projection lives inside its "
                            "attention pool)")
        return self.visual(images, apply_proj=False)

    def encode_text(self, token_ids: jax.Array) -> jax.Array:
        return self.text(token_ids)

    def encode_text_embeds(self, inputs_embeds: jax.Array, input_lens: jax.Array) -> jax.Array:
        return self.text.from_embeds(inputs_embeds, input_lens)

    def __call__(self, images: jax.Array, token_ids: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
        img = self.encode_image(images)
        txt = self.encode_text(token_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T
