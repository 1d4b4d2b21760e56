"""Training engine: trainer lifecycle, optax builders, checkpointing."""

from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer  # noqa: F401
from summer_clip_tpu.engine.optim import (  # noqa: F401
    decay_mask, adamw_grouped, warmup_cosine, warmup_linear, langevin,
    with_grad_accum, trainable_only, sgd, adam,
)
from summer_clip_tpu.engine.checkpoint import (  # noqa: F401
    save_pytree, load_pytree, filter_tree, merge_tree, save_checkpoint,
    load_checkpoint,
)
