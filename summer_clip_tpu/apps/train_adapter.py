"""Adapter training over cached features (contrastive CE).

Rebuild of ``summer_clip/clip_adapter/train_adapter.py``: small adapter heads
train on top of frozen, pre-extracted CLIP features with the symmetric
CLIP-style cross-entropy on in-batch diagonal labels; per-epoch checkpoints
keep only the trainable params (the frozen towers never hit disk). The whole
train step is one jitted XLA program over (batch, emb_dim) matrices.

Dataset views are label-only (``NoImage``); ``data.k_shots`` reproduces the
balanced index subsample (``NoImageBalancedIndexedDataset``,
train_adapter.py:135-153) and ``data.validation_size`` the train/val split.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from summer_clip_tpu.apps.common import create_clip_session
from summer_clip_tpu.apps.features_io import resolve_features
from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine import checkpoint as ckpt
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.methods.zeroshot import compute_accuracy, zeroshot_classifier
from summer_clip_tpu.store import FeatureStore


def balanced_indices(labels: np.ndarray, k_shots: int,
                     rng: np.random.Generator) -> np.ndarray:
    """Balanced k-shot subsample of dataset indices (k_shots<1 = all)."""
    if k_shots < 1:
        return np.arange(labels.shape[0])
    picks = []
    for c in np.unique(labels):
        rows = np.flatnonzero(labels == c)
        k = min(k_shots, rows.shape[0])
        picks.append(rng.choice(rows, size=k, replace=False))
    return np.sort(np.concatenate(picks))


class ClipAdapterTrainer(BaseTrainer):
    def setup_dataset(self):
        self.dataset = C.instantiate(self.cfg.dataset)
        self.labels = np.asarray(self.dataset.labels(), np.int64)
        rng = np.random.default_rng(int(self.cfg.meta.random_state))
        indices = balanced_indices(self.labels, int(self.cfg.data.get("k_shots", -1)), rng)
        val_size = int(self.cfg.data.get("validation_size", 0))
        perm = rng.permutation(len(indices))
        self.val_indices = indices[perm[:val_size]]
        self.train_indices = indices[perm[val_size:]]

    def setup_model(self):
        store = FeatureStore(self.cfg.store.root) if self.cfg.get("store") else None
        self.features = np.asarray(resolve_features(self.cfg.data, store), np.float32)
        session = create_clip_session(self.cfg.clip.model_name,
                                      self.cfg.clip.get("checkpoint_path"),
                                      self.cfg.clip.get("dtype"), remat=self.cfg.clip.get("remat"),
                                      logger=self.logger, quant=self.cfg.clip.get("quant"))
        classes = self.cfg.prompting.classes or self.dataset.classes
        self.text_features = np.asarray(
            zeroshot_classifier(session.encode_text, classes, self.cfg.prompting.templates),
            np.float32)
        fabric = C.instantiate(self.cfg.adapter)
        self.adapter = fabric.create_adapter(self.features.shape[1])
        dummy_f = jnp.zeros((2, self.features.shape[1]), jnp.float32)
        dummy_t = jnp.zeros((2, self.text_features.shape[1]), jnp.float32)
        self.params = self.adapter.init(self.rng.next(), dummy_f, dummy_t)["params"]

    def setup_optimizer(self):
        ap = self.cfg.training.adam_params
        self.tx = optax.adamw(
            float(ap.lr), b1=float(ap.get("b1", 0.9)), b2=float(ap.get("b2", 0.999)),
            eps=float(ap.get("eps", 1e-8)), weight_decay=float(ap.get("weight_decay", 0.0)))
        self.opt_state = self.tx.init(self.params)

    def setup_loss(self):
        adapter, tx = self.adapter, self.tx

        @jax.jit
        def train_step(params, opt_state, feats, text_feats):
            def loss_fn(p):
                li, lt = adapter.apply({"params": p}, feats, text_feats)
                targets = jnp.arange(li.shape[0])
                loss = (optax.softmax_cross_entropy_with_integer_labels(li, targets).mean()
                        + optax.softmax_cross_entropy_with_integer_labels(lt, targets).mean()) / 2
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step

        @jax.jit
        def encode(params, feats):
            return adapter.apply({"params": params}, feats,
                                 method=lambda m, f: m.image_adapter(f))

        self._encode = encode

    def train_epoch(self, epoch_num, epoch_info):
        bs = int(self.cfg.data.batch_size)
        rng = np.random.default_rng((int(self.cfg.meta.random_state), epoch_num))
        order = rng.permutation(self.train_indices)
        n_full = (len(order) // bs) * bs
        for s in range(0, n_full, bs):
            idx = order[s:s + bs]
            feats = jnp.asarray(self.features[idx])
            txt = jnp.asarray(self.text_features[self.labels[idx]])
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, feats, txt)
            epoch_info.update_value("train/loss", float(loss))
        return epoch_info

    def _eval_accuracy(self, indices: np.ndarray) -> tp.Tuple[float, float]:
        feats = self._encode(self.params, jnp.asarray(self.features[indices]))
        feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = 100.0 * feats @ jnp.asarray(self.text_features).T
        return compute_accuracy(logits, self.labels[indices])

    def compute_metrics(self, epoch_num, epoch_info):
        a1, a5 = self._eval_accuracy(self.train_indices)
        epoch_info.update_values({"train/acc1": a1, "train/acc5": a5})
        if len(self.val_indices):
            v1, v5 = self._eval_accuracy(self.val_indices)
            epoch_info.update_values({"val/acc1": v1, "val/acc5": v5})

    def save_epoch_model(self, epoch_num):
        ckpt.save_checkpoint(
            f"{self.cfg.data.checkpoints_dir}/epoch_{epoch_num}",
            params=self.params, opt_state=self.opt_state,
            meta={
                "adapter": C.to_container(self.cfg.adapter, resolve=True),
                "clip": C.to_container(self.cfg.clip, resolve=True),
                "prompting": C.to_container(self.cfg.prompting, resolve=True),
                "emb_dim": int(self.features.shape[1]),
                "epoch": epoch_num,
            })


@C.main(config_path="../conf", config_name="train_adapter")
def run(cfg) -> None:
    run_trainer(ClipAdapterTrainer, cfg)


if __name__ == "__main__":
    run()
