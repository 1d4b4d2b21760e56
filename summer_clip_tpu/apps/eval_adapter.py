"""Adapter evaluation: rebuild from a train checkpoint's meta, score test split.

Rebuild of ``summer_clip/clip_adapter/eval_adapter.py``: the eval app locates
the training configuration *inside the checkpoint* (here: ``meta.yaml``
written by ``train_adapter`` — replacing the reference's fragile
``<ckpt>/../../../.hydra/config.yaml`` path walk), reconstructs the adapter
fabric, loads trainable params, and reports acc@1/5 of adapter-encoded
features against the prompt-ensemble classifier.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.apps.common import create_clip_session
from summer_clip_tpu.apps.features_io import resolve_features
from summer_clip_tpu.core import config as C
from summer_clip_tpu.core.log_utils import make_logger
from summer_clip_tpu.engine import checkpoint as ckpt
from summer_clip_tpu.methods.zeroshot import compute_accuracy, zeroshot_classifier
from summer_clip_tpu.store import FeatureStore


def eval_adapter(cfg, logger) -> dict:
    loaded = ckpt.load_checkpoint(cfg.eval.checkpoint_dir)
    meta = loaded.get("meta") or {}
    adapter_cfg = meta.get("adapter") or C.to_container(cfg.get("adapter") or {}, resolve=True)
    clip_cfg = meta.get("clip") or C.to_container(cfg.clip, resolve=True)
    prompting = meta.get("prompting") or C.to_container(cfg.prompting, resolve=True)

    view = C.instantiate(cfg.dataset)
    store = FeatureStore(cfg.store.root) if cfg.get("store") else None
    features = np.asarray(resolve_features(cfg.eval, store), np.float32)

    session = create_clip_session(clip_cfg["model_name"], clip_cfg.get("checkpoint_path"),
                                  clip_cfg.get("dtype"), logger=logger,
                                  quant=clip_cfg.get("quant"))
    classes = prompting.get("classes") or view.classes
    text_features = zeroshot_classifier(session.encode_text, classes, prompting["templates"])

    fabric = C.instantiate(adapter_cfg)
    adapter = fabric.create_adapter(int(meta.get("emb_dim", features.shape[1])))
    dummy_f = jnp.zeros((2, features.shape[1]), jnp.float32)
    dummy_t = jnp.zeros((2, np.asarray(text_features).shape[1]), jnp.float32)
    init_params = adapter.init(jax.random.PRNGKey(0), dummy_f, dummy_t)["params"]
    params = ckpt.merge_tree(init_params, loaded["params"])

    feats = adapter.apply({"params": params}, jnp.asarray(features),
                          method=lambda m, f: m.image_adapter(f))
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    logits = 100.0 * feats @ text_features.T
    top1, top5 = compute_accuracy(logits, view.labels())
    logging.info(f"acc@1: {top1}")
    logging.info(f"acc@5: {top5}")
    logger.log_info({"type": "eval_adapter", "acc1": top1, "acc5": top5})
    return {"acc1": top1, "acc5": top5}


@C.main(config_path="../conf", config_name="eval_adapter")
def run(cfg) -> None:
    logging.info("Start!")
    logger = make_logger(cfg.exp.project, cfg.exp.name, C.to_container(cfg))
    eval_adapter(cfg, logger)
    logging.info("Finish!")


if __name__ == "__main__":
    run()
