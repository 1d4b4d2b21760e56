"""TPU compute ops: Pallas kernels with XLA reference implementations."""

from summer_clip_tpu.ops.attention import (  # noqa: F401
    mha_reference, flash_attention, multi_head_attention,
    short_attention, short_attention_packed,
)
from summer_clip_tpu.ops.block_kernels import (  # noqa: F401
    fused_ln_attn, fused_ln_mlp, ln_attn_reference, ln_mlp_reference,
)
from summer_clip_tpu.ops.cache_kernels import (  # noqa: F401
    cache_attention, cache_attention_reference, cache_attention_auto,
)
from summer_clip_tpu.ops.int8 import (  # noqa: F401
    QuantConv, QuantDense, int8_dense, quantize_cols, quantize_rows,
)
