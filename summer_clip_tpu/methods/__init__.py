"""Method libraries: zero-shot, cache strategies, Tip-Adapter, adapters, prompts."""

from summer_clip_tpu.methods.zeroshot import (  # noqa: F401
    zeroshot_classifier, accuracy, compute_accuracy, clip_logits,
)
from summer_clip_tpu.methods import cache, tip, adapters  # noqa: F401
