"""Tip-Adapter: training-free cache classifier + hyperparameter search.

Covers the vendored baseline (SURVEY.md §2.4; reference
``summer_clip/tip_adapter/{tip_adapter.py,utils.py}``):

- ``build_cache_model``: mean of augment passes over the few-shot train set,
  L2-normalized keys (NK, D) + one-hot values (NK, C),
- ``tip_logits``: ``clip_logits + alpha * exp(-(beta - beta * f @ keys.T)) @ values``,
- ``search_hp``: the beta x alpha grid search.

TPU-first: the reference recomputes affinity->exp->matmul->accuracy densely
for each of 200 x 20 grid points (``utils.py:99-129``). Here the whole beta
axis is batched through the fused Pallas cache-attention kernel in chunks
(one affinity pass per chunk), alpha blending is a broadcast multiply, and
accuracies come from one argmax per (beta-chunk, alpha) — orders of
magnitude fewer HBM passes.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.methods.zeroshot import accuracy
from summer_clip_tpu.ops.cache_kernels import cache_attention_auto

__all__ = ["build_cache_from_features", "tip_logits", "search_hp", "beta_alpha_grid"]


def _cache_sweep(f: jax.Array, keys: jax.Array, vals: jax.Array,
                 betas: jax.Array, cache_labels) -> jax.Array:
    """(B, Nt, C) cache logits; labels route to the structure-exploiting
    one-hot kernel (Tip values are ALWAYS one-hot of the few-shot train
    labels — ``build_cache_from_features``; class-grouped by construction).
    Routing/fallback lives in ``cache_attention_auto``."""
    return cache_attention_auto(f, keys, vals, betas, cache_labels=cache_labels)


def build_cache_from_features(feature_passes: tp.Sequence[np.ndarray],
                              labels: np.ndarray,
                              num_classes: tp.Optional[int] = None
                              ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Average augment passes -> normalized keys (NK, D); one-hot values (NK, C).

    ``feature_passes``: one (NK, D) feature array per augmentation epoch
    (reference ``utils.py:38-63`` accumulates augment_epoch passes).
    """
    keys = np.mean(np.stack(feature_passes, 0), axis=0).astype(np.float32)
    keys /= np.maximum(np.linalg.norm(keys, axis=-1, keepdims=True), 1e-12)
    labels = np.asarray(labels, np.int64)
    c = int(num_classes if num_classes is not None else labels.max() + 1)
    values = np.zeros((labels.shape[0], c), np.float32)
    values[np.arange(labels.shape[0]), labels] = 1.0
    return keys, values


def tip_logits(clip_logits: jax.Array, features: jax.Array, cache_keys: jax.Array,
               cache_values: jax.Array, beta: float, alpha: float,
               cache_labels=None) -> jax.Array:
    """Single-point Tip-Adapter logits (features/keys already normalized)."""
    cache = _cache_sweep(features, cache_keys, cache_values,
                         jnp.asarray([beta], jnp.float32), cache_labels)[0]
    return jnp.asarray(clip_logits, jnp.float32) + cache * alpha


def beta_alpha_grid(search_scale: tp.Sequence[float], search_step: tp.Sequence[int]
                    ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """The reference's grid parameterization (utils.py:103-104)."""
    betas = np.asarray([i * (search_scale[0] - 0.1) / search_step[0] + 0.1
                        for i in range(search_step[0])], np.float32)
    alphas = np.asarray([i * (search_scale[1] - 0.1) / search_step[1] + 0.1
                         for i in range(search_step[1])], np.float32)
    return betas, alphas


def search_hp(features: tp.Union[np.ndarray, jax.Array],
              labels: np.ndarray,
              clip_logits: tp.Union[np.ndarray, jax.Array],
              cache_keys: tp.Union[np.ndarray, jax.Array],
              cache_values: tp.Union[np.ndarray, jax.Array],
              search_scale: tp.Sequence[float] = (7, 3),
              search_step: tp.Sequence[int] = (200, 20),
              beta_chunk: int = 16,
              log_fn: tp.Optional[tp.Callable[[dict], None]] = None,
              cache_labels=None) -> tp.Tuple[float, float, float]:
    """Grid-search (beta, alpha); returns (best_beta, best_alpha, best_acc).

    Batched evaluation: for each beta chunk, one fused kernel call produces
    (Bc, Nt, C) cache logits; every alpha is then a scalar blend evaluated
    with a single jitted argmax-accuracy per (beta, alpha).
    """
    betas, alphas = beta_alpha_grid(search_scale, search_step)
    f = jnp.asarray(features, jnp.float32)
    cl = jnp.asarray(clip_logits, jnp.float32)
    keys = jnp.asarray(cache_keys, jnp.float32)
    vals = jnp.asarray(cache_values, jnp.float32)
    y = jnp.asarray(labels, jnp.int32)
    alphas_j = jnp.asarray(alphas, jnp.float32)

    # clip_logits/labels ride as jit ARGS, not closure captures: a captured
    # jax.Array embeds as a literal MLIR constant, and at ImageNet scale the
    # (Nt, C) logits turn the cold compile into a ~200MB remote-compile
    # payload (~100s; measured in tools/attr_grid_variants.py).
    @jax.jit
    def accs_for_chunk_args(cache_chunk: jax.Array, cl: jax.Array,
                            y: jax.Array, alphas_j: jax.Array) -> jax.Array:
        # cache_chunk: (Bc, Nt, C) -> accuracy matrix (Bc, A)
        def acc_one(cache_one):
            def acc_alpha(alpha):
                preds = jnp.argmax(cl + alpha * cache_one, axis=1)
                return jnp.mean((preds == y).astype(jnp.float32)) * 100.0
            return jax.vmap(acc_alpha)(alphas_j)
        return jax.vmap(acc_one)(cache_chunk)

    def accs_for_chunk(cache_chunk: jax.Array) -> jax.Array:
        return accs_for_chunk_args(cache_chunk, cl, y, alphas_j)

    best = (-1.0, 0.0, 0.0)  # acc, beta, alpha
    for s in range(0, len(betas), beta_chunk):
        chunk = betas[s:s + beta_chunk]
        cache = _cache_sweep(f, keys, vals, jnp.asarray(chunk), cache_labels)
        accs = np.asarray(accs_for_chunk(cache))
        bi, ai = np.unravel_index(np.argmax(accs), accs.shape)
        if accs[bi, ai] > best[0]:
            best = (float(accs[bi, ai]), float(chunk[bi]), float(alphas[ai]))
            if log_fn:
                log_fn({"type": "tip_hp", "beta": best[1], "alpha": best[2], "acc": best[0]})
    return best[1], best[2], best[0]


def finetune_cache_keys(train_features: np.ndarray, train_labels: np.ndarray,
                        clip_logits_train: np.ndarray,
                        cache_keys: np.ndarray, cache_values: np.ndarray,
                        beta: float, alpha: float, *,
                        epochs: int = 20, lr: float = 1e-3,
                        batch_size: int = 256, weight_decay: float = 0.01,
                        seed: int = 0,
                        log_fn: tp.Optional[tp.Callable[[dict], None]] = None
                        ) -> np.ndarray:
    """Tip-Adapter-F: fine-tune the cache keys as a linear layer.

    The published trainable variant of Tip-Adapter (the reference vendors
    only the training-free one — this is an extension named in the
    BASELINE.json recipe list): the cache keys become the weight of a
    bias-free linear layer initialized from the training-free cache;
    values stay frozen one-hots. Loss = CE over
    ``clip_logits + alpha * exp(-beta(1 - f @ keys^T)) @ values`` on the
    few-shot train set; AdamW + cosine decay, mini-batched.

    Returns the trained keys (NK, D), ready for :func:`tip_logits` /
    :func:`search_hp`.
    """
    import optax

    f = jnp.asarray(train_features, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    cl = jnp.asarray(clip_logits_train, jnp.float32)
    vals = jnp.asarray(cache_values, jnp.float32)
    keys = jnp.asarray(cache_keys, jnp.float32)

    n = f.shape[0]
    batch_size = min(batch_size, n)
    steps_per_epoch = max(n // batch_size, 1)
    tx = optax.adamw(optax.cosine_decay_schedule(lr, max(epochs * steps_per_epoch, 1)),
                     weight_decay=weight_decay, eps=1e-4)
    opt_state = tx.init(keys)

    @jax.jit
    def step(keys, opt_state, fb, yb, clb):
        def loss_of(k):
            affinity = fb @ k.T
            cache = jnp.exp(-beta * (1.0 - affinity)) @ vals
            logits = clb + alpha * cache
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()
        loss, grads = jax.value_and_grad(loss_of)(keys)
        updates, opt_state = tx.update(grads, opt_state, keys)
        return optax.apply_updates(keys, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    for epoch in range(int(epochs)):
        order = rng.permutation(n)
        losses = []
        for s in range(steps_per_epoch):
            idx = jnp.asarray(order[s * batch_size:(s + 1) * batch_size])
            keys, opt_state, loss = step(keys, opt_state, f[idx], y[idx], cl[idx])
            losses.append(float(loss))
        if log_fn:
            log_fn({"type": "tipf_epoch", "epoch": epoch,
                    "loss": float(np.mean(losses))})
    return np.asarray(keys)


def cls_acc(logits, labels, topk: int = 1) -> float:
    """Top-k accuracy in percent (reference utils.py:10-15 contract)."""
    return accuracy(logits, labels, topk=(topk,))[0]
