"""Trainer lifecycle: the template-method harness every app runs under.

Mirrors the reference harness contract (``summer_clip/utils/trainer.py``):
``setup()`` chains setup hooks, ``train_loop()`` iterates epochs with timed
train/val phases, metric logging and per-epoch checkpoints; one-shot
evaluators override ``train_loop`` outright. TPU-specific changes:

- no device juggling: arrays live where jit puts them; ``setup_mesh`` offers
  a ``jax.sharding.Mesh`` to trainers that scale out,
- determinism comes from an explicit ``RngStream`` seeded once per run
  instead of global torch seeds,
- epoch timing drains dispatched XLA work (see ``core.log_utils.Timer``).
"""

from __future__ import annotations

import os
import typing as tp

from summer_clip_tpu.core import log_utils
from summer_clip_tpu.core.config import ConfigNode, to_container, to_yaml
from summer_clip_tpu.core.rng import RngStream, set_random_state

__all__ = ["BaseTrainer", "run_trainer"]


class BaseTrainer:
    def __init__(self, cfg: ConfigNode):
        self.cfg = cfg
        self.rng: tp.Optional[RngStream] = None

    # -- setup hooks (overridden by apps) -----------------------------------
    def setup_logger(self):
        config_for_logger = to_container(self.cfg)
        config_for_logger["PID"] = os.getpid()
        exp = self.cfg.get("exp", {}) or {}
        project = exp.get("project", "summer_clip_tpu") if hasattr(exp, "get") else "summer_clip_tpu"
        name = exp.get("name", None) if hasattr(exp, "get") else None
        self.logger = log_utils.make_logger(project, name, config_for_logger)

    def setup_rng(self):
        seed = int(self.cfg.get("meta", {}).get("random_state", 42))
        root_key = set_random_state(seed)
        self.rng = RngStream(root_key)

    def setup_mesh(self):
        """Hook for multi-device trainers; default single-device (no mesh).

        Multi-host pods rendezvous first: ``distributed_init`` is a no-op
        unless ``JAX_COORDINATOR_ADDRESS`` (or explicit args) says otherwise.
        """
        from summer_clip_tpu.parallel import distributed_init

        distributed_init()
        self.mesh = None

    def setup_dataset(self):
        pass

    def setup_loaders(self):
        pass

    def setup_model(self):
        pass

    def setup_optimizer(self):
        pass

    def setup_scheduler(self):
        pass

    def setup_loss(self):
        pass

    def setup(self):
        self.setup_rng()
        self.setup_logger()
        self.setup_mesh()
        self.setup_dataset()
        self.setup_loaders()
        self.setup_model()
        self.setup_optimizer()
        self.setup_scheduler()
        self.setup_loss()

    # -- epoch hooks ---------------------------------------------------------
    def compute_metrics(self, epoch_num: int, epoch_info: log_utils.StreamingMeans):
        pass

    def train_epoch(self, epoch_num: int, epoch_info: log_utils.StreamingMeans):
        return epoch_info

    def validation_epoch(self, epoch_num: int, epoch_info: log_utils.StreamingMeans):
        return epoch_info

    def save_epoch_model(self, epoch_num: int):
        pass

    def _install_preemption_guard(self):
        """SIGTERM -> graceful stop (engine/preemption.py). SIGTERM only:
        trapping SIGINT would swallow the first Ctrl-C in apps whose custom
        train_loop never polls the flag (interactive kills must stay
        immediate; scheduler evictions are SIGTERM). Signal handlers are
        main-thread-only; a trainer driven from a worker thread simply runs
        unguarded (the scheduler's kill still works)."""
        import signal

        from summer_clip_tpu.engine.preemption import PreemptionGuard

        try:
            self.preempt = PreemptionGuard(signals=(signal.SIGTERM,)).install()
        except ValueError:  # not the main thread
            self.preempt = None
        return self.preempt

    def preempted(self) -> bool:
        guard = getattr(self, "preempt", None)
        return guard is not None and guard.triggered

    def train_loop(self):
        epochs_num = int(self.cfg.training.epochs_num)
        calculate_every = int(self.cfg.get("log", {}).get("calculate_every", 1))
        time_log = log_utils.TimeLog(self.logger, epochs_num + 1, event="training")
        for epoch_num in range(1, epochs_num + 1):
            epoch_info = log_utils.StreamingMeans()
            with log_utils.Timer(epoch_info, "epoch_train"):
                epoch_info = self.train_epoch(epoch_num, epoch_info)
            with log_utils.Timer(epoch_info, "epoch_val"):
                epoch_info = self.validation_epoch(epoch_num, epoch_info)
            if epoch_num % calculate_every == 0:
                self.compute_metrics(epoch_num, epoch_info)
            self.logger.log_epoch(epoch_num, epoch_info)
            self.save_epoch_model(epoch_num)
            time_log.now(epoch_num)
            if self.preempted():
                self.logger.log_info({"type": "preempted", "epoch": epoch_num})
                break
        time_log.end()


def run_trainer(trainer_cls: tp.Type[BaseTrainer], cfg: ConfigNode) -> BaseTrainer:
    print(to_yaml(cfg))
    trainer = trainer_cls(cfg)
    # guard the WHOLE run, setup included: pod evictions don't wait for the
    # first epoch, and a long compile is exactly where a grace window lands
    guard = trainer._install_preemption_guard()
    try:
        trainer.setup()
        trainer.train_loop()
    finally:
        if guard is not None:
            guard.restore()
    return trainer
