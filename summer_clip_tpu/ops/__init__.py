"""TPU compute ops: Pallas kernels with XLA reference implementations."""

from summer_clip_tpu.ops.attention import (  # noqa: F401
    mha_reference, flash_attention, multi_head_attention,
)
from summer_clip_tpu.ops.cache_kernels import (  # noqa: F401
    cache_attention, cache_attention_reference, cache_attention_auto,
)
