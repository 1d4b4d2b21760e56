"""Flax CLIP model family."""

from summer_clip_tpu.models.clip.modeling import (  # noqa: F401
    CLIP, VisionTransformer, ModifiedResNet, TextTransformer, Transformer,
    ResidualAttentionBlock, LayerNormF32, quick_gelu,
)
from summer_clip_tpu.models.clip.configs import (  # noqa: F401
    CLIPConfig, CLIP_CONFIGS, available_models, build_clip, init_clip,
)
from summer_clip_tpu.models.clip.convert import (  # noqa: F401
    convert_state_dict, load_torch_state_dict, detect_model_name, load_clip,
)
