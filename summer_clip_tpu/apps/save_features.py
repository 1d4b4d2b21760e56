"""Feature-extraction app: the throughput-critical pipeline.

TPU-native rebuild of the reference's ``save_features`` workload
(``summer_clip/clip_adapter/save_features.py``): stream train+test splits
through the frozen image tower once, persist features for every downstream
method. Changes by design:

- the encode loop is one jitted XLA program fed by a double-buffered host
  pipeline (threads decode JPEG while the device computes),
- features land in the run-scoped :class:`FeatureStore` under catalog keys
  ``<dataset>_{train,test}-<model>`` (no manual path bookkeeping),
- train "image_outs" (unscaled ``f_hat @ classifier.T`` logits, cf.
  ``save_features.py:40-47``) are computed on device right after extraction.

Run: ``python -m summer_clip_tpu.apps.save_features dataset_name=sun397``.
"""

from __future__ import annotations

import logging

import numpy as np

from summer_clip_tpu.apps.common import create_clip_session, extract_image_features
from summer_clip_tpu.core import config as C
from summer_clip_tpu.core.log_utils import make_logger
from summer_clip_tpu.methods.zeroshot import clip_logits, zeroshot_classifier
from summer_clip_tpu.store import FeatureStore


def save_split_features(cfg, session, store: FeatureStore, dataset_cfg, key: str,
                        save_outs: bool, logger) -> None:
    view = C.instantiate(dataset_cfg)
    view.transform.input_size = session.input_size
    if hasattr(view.transform, "device_normalize"):
        # ship raw uint8 to the chip; normalization fuses into the jitted
        # encode (4x less host->device transfer). The native C++ pipeline
        # pre-normalizes on host and is unaffected.
        view.transform.device_normalize = bool(cfg.data.get("device_normalize", False))
    batcher = view.batcher(batch_size=int(cfg.data.batch_size))
    logger.log_info(f"Extracting features for {key}: {len(view)} images")

    feats, labels, indices = extract_image_features(session, batcher)
    assert (indices == np.arange(len(indices))).all(), "Indexes should have consequent order"

    outs = None
    if save_outs:
        classes = cfg.prompting.classes or view.classes
        classifier = zeroshot_classifier(session.encode_text, classes, cfg.prompting.templates)
        outs = np.asarray(clip_logits(feats, classifier, scale=1.0), np.float32)

    store.save(key, features=feats, labels=labels, outs=outs,
               meta={"model": session.cfg.name, "dataset": str(cfg.dataset_name),
                     "count": int(len(feats))})
    logger.log_info({"type": "features_saved", "key": key, "count": int(len(feats))})


@C.main(config_path="../conf", config_name="save_features")
def run(cfg) -> None:
    logging.info("Start!")
    logger = make_logger(cfg.exp.project, cfg.exp.name, C.to_container(cfg))
    # data-parallel extraction across all visible chips when batches divide
    import jax

    from summer_clip_tpu.parallel import create_mesh, distributed_init

    distributed_init()
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and int(cfg.data.batch_size) % n_dev == 0:
        mesh = create_mesh(data=n_dev, model=1)
        logger.log_info(f"Sharding extraction batches over {n_dev} devices")
    session = create_clip_session(cfg.clip.model_name, cfg.clip.get("checkpoint_path"),
                                  cfg.clip.get("dtype"), mesh=mesh, logger=logger,
                                  proj_path=cfg.clip.get("proj_path"),
                                  quant=cfg.clip.get("quant"))
    store = FeatureStore(cfg.store.root)
    model_tag = session.cfg.name.replace("/", "")
    if cfg.get("train_dataset") is not None:
        save_split_features(cfg, session, store, cfg.train_dataset,
                            f"{cfg.dataset_name}_train-{model_tag}",
                            bool(cfg.save_train_outs), logger)
    if cfg.get("test_dataset") is not None:
        save_split_features(cfg, session, store, cfg.test_dataset,
                            f"{cfg.dataset_name}_test-{model_tag}", False, logger)
    logging.info("Finish!")


if __name__ == "__main__":
    run()
