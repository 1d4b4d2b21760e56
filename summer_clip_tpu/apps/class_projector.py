"""PCA class-projection analysis (reference ``clip_searcher/class_projector.py``).

Fit PCA on the class text features, project the image features into the same
subspace, re-evaluate zero-shot accuracy per ``n_components``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.apps.common import create_clip_session
from summer_clip_tpu.apps.features_io import resolve_features
from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.methods.linalg import PCA
from summer_clip_tpu.methods.zeroshot import compute_accuracy, zeroshot_classifier
from summer_clip_tpu.store import FeatureStore


def norm_rows(x):
    x = jnp.asarray(x, jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class ClassProjector(BaseTrainer):
    def setup_dataset(self):
        self.dataset = C.instantiate(self.cfg.dataset)
        self.test_labels = np.asarray(self.dataset.labels(), np.int64)

    def setup_model(self):
        session = create_clip_session(self.cfg.clip.model_name,
                                      self.cfg.clip.get("checkpoint_path"),
                                      self.cfg.clip.get("dtype"), remat=self.cfg.clip.get("remat"),
                                      logger=self.logger, quant=self.cfg.clip.get("quant"))
        classes = self.cfg.prompting.classes or self.dataset.classes
        self.test_text_features = zeroshot_classifier(
            session.encode_text, classes, self.cfg.prompting.templates)
        self.logger.log_info(f"text features shape: {self.test_text_features.shape}")
        store = FeatureStore(self.cfg.store.root) if self.cfg.get("store") else None
        feats = np.asarray(resolve_features(self.cfg.data, store), np.float32)
        self.test_image_features = np.asarray(norm_rows(feats))
        self.logger.log_info(f"image features shape: {self.test_image_features.shape}")

    @staticmethod
    def compute_clip_logits(image_features, text_features):
        return 100.0 * norm_rows(image_features) @ norm_rows(text_features).T

    def train_loop(self):
        logits = self.compute_clip_logits(self.test_image_features, self.test_text_features)
        a1, a5 = compute_accuracy(logits, self.test_labels)
        self.logger.log_info(f"zero-shot clip: acc@1={a1}, acc@5={a5}")

        for n_components in self.cfg.pca.n_components:
            pca = PCA(int(n_components))
            txt = pca.fit_transform(np.asarray(self.test_text_features))
            img = pca.transform(self.test_image_features)
            a1, a5 = compute_accuracy(self.compute_clip_logits(img, txt), self.test_labels)
            self.logger.log_info({"n_components": int(n_components), "acc1": a1, "acc5": a5})


@C.main(config_path="../conf", config_name="class_projector")
def run(cfg) -> None:
    run_trainer(ClassProjector, cfg)


if __name__ == "__main__":
    run()
