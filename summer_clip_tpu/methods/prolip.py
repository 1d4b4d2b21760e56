"""ProLIP: few-shot fine-tuning of CLIP's final vision projection.

Implements the method of "CLIP's Visual Embedding Projector is a Few-shot
Cornucopia" (arXiv:2410.05270, PAPERS.md): train ONLY the (width, embed_dim)
vision projection matrix W on the few-shot split, with cross-entropy over
cosine-similarity logits against the frozen class text embeddings and an L2
pull toward the pretrained W0. Zero extra inference parameters or latency —
the tuned W simply replaces the original, so every downstream consumer
(zero-shot eval, Tip-Adapter caches, CLIP-search) benefits unchanged.

The reference framework (``summer_clip``) has no counterpart; this is the
published cache-free competitor to Tip-Adapter(-F), added alongside it.

TPU notes: the few-shot problem is tiny (N = shots x classes rows of width
768/1024), so training runs as one jitted full-batch step scanned over
epochs — a single device program, no input pipeline.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["prolip_logits", "train_projection"]


def prolip_logits(feats_pre: jnp.ndarray, W: jnp.ndarray,
                  classifier: jnp.ndarray, scale: float = 100.0) -> jnp.ndarray:
    """Cosine-sim logits of pre-projection features under projection W.

    classifier: (C, embed_dim), rows already L2-normalized
    (methods.zeroshot.zeroshot_classifier output).
    """
    img = feats_pre @ W
    img = img / jnp.maximum(jnp.linalg.norm(img, axis=-1, keepdims=True), 1e-12)
    return scale * img @ classifier.T


def train_projection(feats_pre: np.ndarray, labels: np.ndarray,
                     classifier: np.ndarray, W0: np.ndarray, *,
                     epochs: int = 200, lr: float = 1e-4,
                     weight_decay_to_init: float = 1.0, scale: float = 100.0,
                     log_fn: tp.Optional[tp.Callable] = None,
                     log_every: int = 20) -> np.ndarray:
    """Fine-tune the vision projection on few-shot (feats_pre, labels).

    Loss = CE(scale * cos(x W, T), y) + lambda * mean((W - W0)^2): the L2
    anchor to the pretrained W0 is what keeps the few-shot fit from
    destroying the open-vocabulary geometry (arXiv:2410.05270 §3.2).
    Full-batch AdamW steps under one jitted ``lax.scan``.
    """
    x = jnp.asarray(feats_pre, jnp.float32)
    y = jnp.asarray(labels, jnp.int32)
    T = jnp.asarray(classifier, jnp.float32)
    W0j = jnp.asarray(W0, jnp.float32)
    lam = float(weight_decay_to_init)

    tx = optax.adam(float(lr))

    # data/classifier/anchor ride as jit ARGS, not closure captures — a
    # captured array embeds as an MLIR constant and inflates the remote
    # compile payload (tools/attr_grid_variants.py).
    @jax.jit
    def fit(W, opt_state, x, y, T, W0j):
        def loss_fn(W):
            logits = prolip_logits(x, W, T, scale)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            reg = lam * jnp.mean((W - W0j) ** 2)
            return ce + reg, ce

        def step(carry, _):
            W, opt_state = carry
            (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(W)
            updates, opt_state = tx.update(grads, opt_state, W)
            return (optax.apply_updates(W, updates), opt_state), (loss, ce)
        (W, opt_state), (losses, ces) = jax.lax.scan(
            step, (W, opt_state), None, length=int(epochs))
        return W, losses, ces

    W = W0j
    W, losses, ces = fit(W, tx.init(W), x, y, T, W0j)
    if log_fn is not None:
        losses = np.asarray(losses)
        ces = np.asarray(ces)
        for e in range(0, int(epochs), max(1, int(log_every))):
            log_fn({"type": "prolip_train", "epoch": int(e),
                    "loss": float(losses[e]), "ce": float(ces[e])})
        log_fn({"type": "prolip_train", "epoch": int(epochs) - 1,
                "loss": float(losses[-1]), "ce": float(ces[-1])})
    return np.asarray(W, np.float32)
