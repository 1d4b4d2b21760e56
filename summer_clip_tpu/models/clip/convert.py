"""Convert OpenAI CLIP PyTorch checkpoints to this framework's Flax variables.

The reference obtains weights via ``clip.load(name)`` (a torchscript archive
download). Here the user points us at that same ``.pt`` file and we map the
state dict onto the Flax module tree from :mod:`modeling`:

- torch ``Linear.weight`` (out, in)  ->  flax ``kernel`` (in, out)
- fused ``attn.in_proj_{weight,bias}`` -> split q/k/v projections
- torch ``Conv2d.weight`` (O, I, H, W) -> flax (H, W, I, O)
- BatchNorm running stats -> the ``batch_stats`` collection
- fp16 checkpoint tensors are upcast to fp32 master params

``detect_model_name`` infers the architecture from tensor shapes so
``load_clip(checkpoint_path)`` needs no extra metadata.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np

__all__ = ["convert_state_dict", "load_torch_state_dict", "detect_model_name", "load_clip"]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    # copy: torch's .numpy() SHARES storage — without it, later mutation of
    # the torch model would silently alias the converted params
    return np.array(x, np.float32, copy=True)


def load_torch_state_dict(path: tp.Union[str, Path]) -> tp.Dict[str, np.ndarray]:
    """Load an OpenAI CLIP checkpoint (torchscript archive or plain state dict)."""
    import torch

    try:
        model = torch.jit.load(str(path), map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(str(path), map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return {k: _np(v) for k, v in sd.items()}


def detect_model_name(sd: tp.Mapping[str, np.ndarray]) -> str:
    from summer_clip_tpu.models.clip.configs import CLIP_CONFIGS

    is_vit = "visual.class_embedding" in sd
    embed_dim = sd["text_projection"].shape[1]
    if is_vit:
        width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        res = grid * patch
        layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
        for name, c in CLIP_CONFIGS.items():
            if (c.vision_kind == "vit" and c.vision_width == width
                    and c.vision_patch_size == patch and c.image_resolution == res
                    and c.vision_layers == layers and c.embed_dim == embed_dim):
                return name
    else:
        width = sd["visual.conv1.weight"].shape[0] * 2
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{s}.")})
            for s in (1, 2, 3, 4)
        )
        for name, c in CLIP_CONFIGS.items():
            if (c.vision_kind == "resnet" and c.vision_width == width
                    and tuple(c.vision_layers) == counts and c.embed_dim == embed_dim):
                return name
    raise ValueError("Could not match checkpoint shapes to a known CLIP config")


def _linear(sd, prefix) -> dict:
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd, prefix) -> dict:
    return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}


def _bn_params(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bn_stats(sd, prefix) -> dict:
    return {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}


def _attn_from_inproj(sd, prefix) -> dict:
    """Split fused in_proj into q/k/v Dense params + out_proj."""
    w = sd[f"{prefix}.in_proj_weight"]  # (3D, D)
    b = sd[f"{prefix}.in_proj_bias"]
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d:2 * d], w[2 * d:]
    qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _transformer(sd, prefix, n_layers) -> dict:
    out = {}
    for i in range(n_layers):
        p = f"{prefix}.resblocks.{i}"
        out[f"resblocks_{i}"] = {
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "attn": _attn_from_inproj(sd, f"{p}.attn"),
            "mlp": {"c_fc": _linear(sd, f"{p}.mlp.c_fc"),
                    "c_proj": _linear(sd, f"{p}.mlp.c_proj")},
        }
    return out


def convert_state_dict(sd: tp.Mapping[str, np.ndarray]) -> tp.Dict[str, tp.Any]:
    """Torch state dict -> flax ``{'params': ..., 'batch_stats': ...}``."""
    from summer_clip_tpu.models.clip.configs import CLIP_CONFIGS

    name = detect_model_name(sd)
    cfg = CLIP_CONFIGS[name]
    params: tp.Dict[str, tp.Any] = {"logit_scale": sd["logit_scale"]}
    batch_stats: tp.Dict[str, tp.Any] = {}

    if cfg.vision_kind == "vit":
        v = {
            "conv1": _conv(sd, "visual.conv1"),
            "class_embedding": sd["visual.class_embedding"],
            "positional_embedding": sd["visual.positional_embedding"],
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": sd["visual.proj"],
            "transformer": _transformer(sd, "visual.transformer", int(cfg.vision_layers)),
        }
        params["visual"] = v
    else:
        v = {}
        vstats = {}
        for c in ("conv1", "conv2", "conv3"):
            v[c] = _conv(sd, f"visual.{c}")
        for b in ("bn1", "bn2", "bn3"):
            v[b] = _bn_params(sd, f"visual.{b}")
            vstats[b] = _bn_stats(sd, f"visual.{b}")
        for stage, n_blocks in enumerate(cfg.vision_layers, start=1):  # type: ignore[arg-type]
            for blk in range(n_blocks):
                p = f"visual.layer{stage}.{blk}"
                name_fx = f"layer{stage}_{blk}"
                bparams = {
                    "conv1": _conv(sd, f"{p}.conv1"),
                    "conv2": _conv(sd, f"{p}.conv2"),
                    "conv3": _conv(sd, f"{p}.conv3"),
                    "bn1": _bn_params(sd, f"{p}.bn1"),
                    "bn2": _bn_params(sd, f"{p}.bn2"),
                    "bn3": _bn_params(sd, f"{p}.bn3"),
                }
                bstats = {
                    "bn1": _bn_stats(sd, f"{p}.bn1"),
                    "bn2": _bn_stats(sd, f"{p}.bn2"),
                    "bn3": _bn_stats(sd, f"{p}.bn3"),
                }
                ds_conv = next(
                    (f"{p}.downsample.{j}" for j in (0, 1)
                     if sd.get(f"{p}.downsample.{j}.weight") is not None
                     and sd[f"{p}.downsample.{j}.weight"].ndim == 4),
                    None)
                if ds_conv is not None:
                    # OpenAI layout: Sequential(AvgPool ("-1"), Conv ("0"), BN ("1"))
                    # — the conv is the 4-D weight, the BN follows it.
                    j = int(ds_conv.rsplit(".", 1)[1])
                    bparams["downsample_conv"] = _conv(sd, ds_conv)
                    bparams["downsample_bn"] = _bn_params(sd, f"{p}.downsample.{j + 1}")
                    bstats["downsample_bn"] = _bn_stats(sd, f"{p}.downsample.{j + 1}")
                v[name_fx] = bparams
                vstats[name_fx] = bstats
        v["attnpool"] = {
            "positional_embedding": sd["visual.attnpool.positional_embedding"],
            "attn": {
                "q_proj": _linear(sd, "visual.attnpool.q_proj"),
                "k_proj": _linear(sd, "visual.attnpool.k_proj"),
                "v_proj": _linear(sd, "visual.attnpool.v_proj"),
                "out_proj": _linear(sd, "visual.attnpool.c_proj"),
            },
        }
        params["visual"] = v
        batch_stats["visual"] = vstats

    params["text"] = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
        "transformer": _transformer(sd, "transformer", cfg.text_layers),
    }

    variables: tp.Dict[str, tp.Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def load_clip(checkpoint_path: tp.Union[str, Path], dtype=None, quant=None):
    """One-call loader: checkpoint -> (model, cfg, variables)."""
    import jax.numpy as jnp

    from summer_clip_tpu.models.clip.configs import build_clip

    sd = load_torch_state_dict(checkpoint_path)
    name = detect_model_name(sd)
    model, cfg = build_clip(name, dtype=dtype or jnp.float32, quant=quant)
    variables = convert_state_dict(sd)
    return model, cfg, variables
