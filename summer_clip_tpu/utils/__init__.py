"""Compatibility alias package: the reference's ``utils`` layer.

The runtime utilities live in :mod:`summer_clip_tpu.core` (config, logging,
metrics, rng, profiling) and :mod:`summer_clip_tpu.engine` (optimizer
grouping, trainable-subset masking, checkpoints). This package re-exports
them under the reference's module vocabulary so `summer_clip_tpu.utils.*`
imports work for users migrating configs.
"""

from summer_clip_tpu.core import config as hydra_utils  # noqa: F401
from summer_clip_tpu.core import log_utils  # noqa: F401
from summer_clip_tpu.core import profiling  # noqa: F401
from summer_clip_tpu.core.rng import set_random_state  # noqa: F401
from summer_clip_tpu.engine import optim as train_utils  # noqa: F401
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer  # noqa: F401
from summer_clip_tpu.data import views as datasets  # noqa: F401
