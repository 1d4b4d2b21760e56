"""CLIP model registry: the architectures ``clip.load()`` exposes.

Hyperparameters are the public OpenAI CLIP family (the reference selects
them by name through ``cfg.clip.model_name``, e.g.
``conf/clip/vit_b16.yaml``). ``build_clip(name)`` constructs the Flax module;
``init_clip`` initializes variables; tiny test configs are included so the
full stack is exercisable on CPU.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from summer_clip_tpu.models.clip.modeling import (
    CLIP, ModifiedResNet, TextTransformer, VisionTransformer,
)

__all__ = ["CLIPConfig", "CLIP_CONFIGS", "available_models", "build_clip", "init_clip"]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    image_resolution: int
    # vision: either resnet (layers tuple) or vit (patch size)
    vision_kind: str  # 'resnet' | 'vit'
    vision_width: int
    vision_layers: tp.Union[tp.Tuple[int, int, int, int], int]
    vision_patch_size: tp.Optional[int]
    # text
    context_length: int
    vocab_size: int
    text_width: int
    text_heads: int
    text_layers: int

    @property
    def vision_heads(self) -> int:
        if self.vision_kind == "resnet":
            return (self.vision_width * 32) // 64  # attnpool head_dim 64
        return self.vision_width // 64


def _rn(name, embed, res, layers, width, tw, th):
    return CLIPConfig(name, embed, res, "resnet", width, layers, None, 77, 49408, tw, th, 12)


def _vit(name, embed, res, patch, width, layers, heads, tw, th, tl=12):
    return CLIPConfig(name, embed, res, "vit", width, layers, patch, 77, 49408, tw, th, tl)


CLIP_CONFIGS: tp.Dict[str, CLIPConfig] = {c.name: c for c in [
    _rn("RN50", 1024, 224, (3, 4, 6, 3), 64, 512, 8),
    _rn("RN101", 512, 224, (3, 4, 23, 3), 64, 512, 8),
    _rn("RN50x4", 640, 288, (4, 6, 10, 6), 80, 640, 10),
    _rn("RN50x16", 768, 384, (6, 8, 18, 8), 96, 768, 12),
    _rn("RN50x64", 1024, 448, (3, 15, 36, 10), 128, 1024, 16),
    _vit("ViT-B/32", 512, 224, 32, 768, 12, 12, 512, 8),
    _vit("ViT-B/16", 512, 224, 16, 768, 12, 12, 512, 8),
    _vit("ViT-L/14", 768, 224, 14, 1024, 24, 16, 768, 12),
    _vit("ViT-L/14@336px", 768, 336, 14, 1024, 24, 16, 768, 12),
    # tiny configs for CPU tests / CI (not part of the public family)
    _vit("test-vit", 32, 32, 8, 64, 2, 2, 32, 2, 2),
    CLIPConfig("test-rn", 32, 64, "resnet", 8, (1, 1, 1, 1), None, 16, 512, 32, 2, 2),
]}


def available_models() -> tp.List[str]:
    return [n for n in CLIP_CONFIGS if not n.startswith("test-")]


def build_clip(name: str, dtype: tp.Any = jnp.float32, remat: bool = False,
               patch_embed: str = "conv",
               quant: tp.Optional[str] = None) -> tp.Tuple[CLIP, CLIPConfig]:
    """``quant='int8'`` builds the int8-MXU inference towers (ops/int8.py) —
    identical param tree, opt-in speed/accuracy trade for feature
    extraction (``clip.quant`` in the app configs)."""
    cfg = CLIP_CONFIGS[name]
    if cfg.vision_kind == "resnet":
        visual: tp.Any = ModifiedResNet(
            layers=tuple(cfg.vision_layers),  # type: ignore[arg-type]
            width=cfg.vision_width,
            num_heads=cfg.vision_heads,
            output_dim=cfg.embed_dim,
            dtype=dtype,
            quant=quant,
        )
    else:
        visual = VisionTransformer(
            patch_size=int(cfg.vision_patch_size),  # type: ignore[arg-type]
            width=cfg.vision_width,
            num_layers=int(cfg.vision_layers),  # type: ignore[arg-type]
            num_heads=cfg.vision_heads,
            output_dim=cfg.embed_dim,
            dtype=dtype,
            remat=remat,
            patch_embed=patch_embed,
            quant=quant,
        )
    text = TextTransformer(
        vocab_size=cfg.vocab_size,
        context_length=cfg.context_length,
        width=cfg.text_width,
        num_layers=cfg.text_layers,
        num_heads=cfg.text_heads,
        output_dim=cfg.embed_dim,
        dtype=dtype,
        quant=quant,
    )
    return CLIP(visual=visual, text=text), cfg


def init_clip(name: str, rng: tp.Optional[jax.Array] = None,
              dtype: tp.Any = jnp.float32, remat: bool = False,
              quant: tp.Optional[str] = None) -> tp.Tuple[CLIP, CLIPConfig, tp.Any]:
    """Build + init variables with dummy inputs (shape-driven)."""
    model, cfg = build_clip(name, dtype=dtype, remat=remat, quant=quant)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    images = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32)
    tokens = jnp.zeros((1, cfg.context_length), jnp.int32)
    variables = model.init(rng, images, tokens)
    return model, cfg, variables
