"""Trainable adapters over frozen CLIP features.

Re-implements the adapter family of the reference
(``summer_clip/clip_adapter/train_adapter.py:29-119``):

- :class:`LinearAdapter` — one linear head (vision and/or text),
- :class:`ResidualAdapter` — the Tip-Adapter-F style bottleneck MLP with a
  residual blend ratio ("original adapter"),
- :class:`CachedClipAdapter` — the training wrapper: adapters applied to
  *cached* image features and per-class text features, producing CLIP-style
  symmetric contrastive logits scaled by ``logit_scale``,
- fabric callables matching the reference's config ``_target_`` seam
  (``LinearClipAdapterFabric`` / ``OriginalImageClipAdapterFabric``).

Training never touches the CLIP towers: features come from the store,
so each step is a couple of tiny matmuls — ideal for jit.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "LinearAdapter", "ResidualAdapter", "IdentityAdapter", "CachedClipAdapter",
    "LinearClipAdapterFabric", "OriginalImageClipAdapterFabric",
]


class IdentityAdapter(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


class LinearAdapter(nn.Module):
    output_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.output_dim, use_bias=self.use_bias, name="head")(x)


class ResidualAdapter(nn.Module):
    """Bottleneck MLP with residual blend: ratio*mlp(x) + (1-ratio)*x."""

    reduction: int = 4
    ratio: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = nn.relu(nn.Dense(d // self.reduction, use_bias=False, name="fc1")(x))
        h = nn.relu(nn.Dense(d, use_bias=False, name="fc2")(h))
        return self.ratio * h + (1.0 - self.ratio) * x


class CachedClipAdapter(nn.Module):
    """Contrastive training head over cached features.

    ``__call__(image_features, text_features)`` -> (logits_i2t, logits_t2i)
    where both feature sets pass through their adapters, are L2-normalized
    and scaled by a learnable logit_scale — the loss pairs row i of the
    batch with row i of the text side (reference ``train_adapter.py:47-69``).
    """

    image_adapter: nn.Module
    text_adapter: nn.Module

    @nn.compact
    def __call__(self, image_features: jax.Array, text_features: jax.Array
                 ) -> tp.Tuple[jax.Array, jax.Array]:
        import numpy as np

        img = self.image_adapter(image_features)
        txt = self.text_adapter(text_features)
        img = img / jnp.maximum(jnp.linalg.norm(img, axis=-1, keepdims=True), 1e-12)
        txt = txt / jnp.maximum(jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-12)
        logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.asarray(np.log(1 / 0.07), jnp.float32), ())
        scale = jnp.exp(logit_scale)
        logits = scale * img @ txt.T
        return logits, logits.T

    def encode(self, image_features: jax.Array) -> jax.Array:
        return self.image_adapter(image_features)


class LinearClipAdapterFabric:
    """Builds a CachedClipAdapter with linear vision head (+ optional text head)."""

    def __init__(self, output_dim: tp.Optional[int] = None, adapt_text: bool = False):
        self.output_dim = output_dim
        self.adapt_text = adapt_text

    def create_adapter(self, emb_dim: int) -> CachedClipAdapter:
        out = self.output_dim or emb_dim
        # a projecting vision head forces a text head too, or the contrastive
        # dims would disagree (reference ClipAdapter has both heads)
        needs_text_head = self.adapt_text or out != emb_dim
        return CachedClipAdapter(
            image_adapter=LinearAdapter(out),
            text_adapter=LinearAdapter(out) if needs_text_head else IdentityAdapter(),
        )


class OriginalImageClipAdapterFabric:
    """Builds the residual-MLP image adapter (text identity)."""

    def __init__(self, reduction: int = 4, ratio: float = 0.2):
        self.reduction = reduction
        self.ratio = ratio

    def create_adapter(self, emb_dim: int) -> CachedClipAdapter:
        del emb_dim
        return CachedClipAdapter(
            image_adapter=ResidualAdapter(self.reduction, self.ratio),
            text_adapter=IdentityAdapter(),
        )
