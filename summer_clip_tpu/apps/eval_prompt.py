"""Evaluate explicit prompts (texts or token ids) as zero-shot classifiers.

Rebuild of ``summer_clip/clip_prompt/eval_prompt.py``: for each class, build
``[SOT] + prompt + class + [EOT]`` rows for every prompt in the ensemble,
encode through the frozen text tower, average, and score cached image
features (acc@1/5).
"""

from __future__ import annotations

import logging
import typing as tp

import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.apps.common import create_clip_session
from summer_clip_tpu.apps.features_io import resolve_features
from summer_clip_tpu.core import config as C
from summer_clip_tpu.engine.trainer import BaseTrainer, run_trainer
from summer_clip_tpu.methods.zeroshot import compute_accuracy
from summer_clip_tpu.models.tokenizer import get_tokenizer
from summer_clip_tpu.store import FeatureStore


def create_text_features(session, tokenizer, classes_tokens, prompts_tokens,
                         context_length: int = 77) -> jnp.ndarray:
    """(C, D) ensemble classifier from explicit prompt-id lists."""
    sot, eot = tokenizer.sot_token, tokenizer.eot_token
    rows = []
    row_class = []
    for ci, ctoks in enumerate(classes_tokens):
        for ptoks in prompts_tokens:
            ids = [sot] + list(ptoks) + list(ctoks) + [eot]
            if len(ids) > context_length:  # truncate, keeping the final EOT
                ids = ids[:context_length]
                ids[-1] = eot
            row = np.zeros((context_length,), np.int32)
            row[:len(ids)] = ids
            rows.append(row)
            row_class.append(ci)
    tokens = np.stack(rows)
    feats = []
    for s in range(0, len(tokens), 256):
        feats.append(session.encode_text(jnp.asarray(tokens[s:s + 256])))
    feats = jnp.concatenate(feats).astype(jnp.float32)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    row_class = np.asarray(row_class)
    out = []
    for ci in range(len(classes_tokens)):
        mean = feats[row_class == ci].mean(axis=0)
        out.append(mean / jnp.maximum(jnp.linalg.norm(mean), 1e-12))
    return jnp.stack(out)


class PromptEvaluator(BaseTrainer):
    def setup_dataset(self):
        self.dataset = C.instantiate(self.cfg.dataset)
        self.labels = np.asarray(self.dataset.labels(), np.int64)
        self.tokenizer = get_tokenizer()
        self.text_classes = list(self.cfg.prompting.classes or self.dataset.classes)
        self.token_classes = [self.tokenizer.encode(str(c).replace("_", " "))
                              for c in self.text_classes]

    def setup_prompts(self):
        ids_given = self.cfg.get("prompts_ids") is not None
        texts_given = self.cfg.get("prompts_texts") is not None
        assert ids_given ^ texts_given, "Only one is allowed: text or ids"
        if ids_given:
            self.token_prompts: tp.List[tp.List[int]] = [
                list(p) for p in C.to_container(self.cfg.prompts_ids, resolve=True)]
        else:
            self.token_prompts = [self.tokenizer.encode(t)
                                  for t in self.cfg.prompts_texts]

    def setup_model(self):
        self.session = create_clip_session(self.cfg.clip.model_name,
                                           self.cfg.clip.get("checkpoint_path"),
                                           self.cfg.clip.get("dtype"), remat=self.cfg.clip.get("remat"),
                                           logger=self.logger, quant=self.cfg.clip.get("quant"))
        store = FeatureStore(self.cfg.store.root) if self.cfg.get("store") else None
        feats = np.asarray(resolve_features(self.cfg.clip_data, store), np.float32)
        self.image_features = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        self.setup_prompts()
        self.text_features = create_text_features(
            self.session, self.tokenizer, self.token_classes, self.token_prompts)

    def train_loop(self):
        logits = 100.0 * jnp.asarray(self.image_features) @ self.text_features.T
        top1, top5 = compute_accuracy(logits, self.labels)
        logging.info(f"acc@1: {top1}")
        logging.info(f"acc@5: {top5}")
        self.logger.log_info({"type": "eval_prompt", "acc1": top1, "acc5": top5,
                              "prompts": [list(p) for p in self.token_prompts]})


@C.main(config_path="../conf", config_name="eval_prompt")
def run(cfg) -> None:
    run_trainer(PromptEvaluator, cfg)


if __name__ == "__main__":
    run()
