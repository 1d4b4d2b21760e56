"""Multi-chip parallelism: meshes, shardings, N-sharded cache attention."""

from summer_clip_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, distributed_init, replicate, shard_batch,
)
from summer_clip_tpu.parallel.sharded_cache import (  # noqa: F401
    sharded_cache_logits, pad_cache_for_mesh, ShardedResidentCache,
)
from summer_clip_tpu.parallel.tp import (  # noqa: F401
    gpt2_tp_spec, shard_params_tp, check_tp_divisibility, shard_decode_tp,
)
from summer_clip_tpu.parallel.tp_int8 import (  # noqa: F401
    TPInt8Decoder, permute_qkv_columns, shard_decode_tp_int8, tp_int8_decoder,
)
from summer_clip_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_spec, shard_params_fsdp,
)
from summer_clip_tpu.parallel.pp import (  # noqa: F401
    check_pp_divisibility, pipeline_blocks, pp_clip_gpt_forward,
    pp_gpt2_forward, scan_clip_gpt_forward, scan_gpt2_forward,
    shard_stacked_pp, stack_block_params, unstack_block_params,
)
from summer_clip_tpu.parallel.ep import (  # noqa: F401
    MoEMLP, check_ep_divisibility, moe_apply_ep, shard_experts_ep,
)
