"""Dump (optionally one-hot) gold labels of a split.

Rebuild of ``summer_clip/clip_searcher/save_image_labels.py``.
"""

from __future__ import annotations

import numpy as np

from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.store import save_array


class SaveImageLabels(BaseTrainer):
    def setup_dataset(self):
        self.dataset = C.instantiate(self.cfg.dataset)

    def train_loop(self):
        labels = np.asarray(self.dataset.labels(), np.int64)
        if bool(self.cfg.data.get("one_hot", True)):
            c = int(labels.max()) + 1
            out = np.zeros((labels.shape[0], c), np.float32)
            out[np.arange(labels.shape[0]), labels] = 1.0
        else:
            out = labels
        save_array(self.cfg.data.output_labels, out)
        self.logger.log_info({"type": "labels_saved", "path": str(self.cfg.data.output_labels),
                              "shape": list(out.shape)})


@C.main(config_path="../conf", config_name="save_image_labels")
def run(cfg) -> None:
    run_trainer(SaveImageLabels, cfg)


if __name__ == "__main__":
    run()
